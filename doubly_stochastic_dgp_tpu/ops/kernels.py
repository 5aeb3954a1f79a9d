"""Kernels: RBF (ARD), Matern family, White, Constant, Linear and the
Sum/Product algebra.

Rebuilds the GPflow-inherited kernel surface the reference relies on
(SURVEY §2.3; call sites: /root/reference/demos/run_regression.py:61-66
``RBF(D) + White(D, 2e-6)``, tests/test_dgp.py:66,87 ``Matern52``,
layers.py:209,213 ``kern.K``/``kern.Kdiag``, layers.py:161
``compute_K_symm``).

TPU-first: gram matrices are computed as one large matmul (the
``-2 X Z^T`` term rides the MXU) plus fused elementwise epilogue; an
optional Pallas kernel (ops/pallas/gram.py) fuses the norm/broadcast/exp
epilogue with the matmul tiles for large N*M grams.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float, config
from ..utils.modules import Module, Param, static_field

__all__ = [
    "Kernel", "Stationary", "RBF", "Matern12", "Matern32", "Matern52",
    "RationalQuadratic", "Cosine", "Periodic", "ArcCosine",
    "White", "Constant", "Linear", "Sum", "Product",
]


class Kernel(Module):
    """Base kernel. Subclasses implement K(X, X2) and Kdiag(X)."""

    input_dim: int = static_field(default=1)

    def K(self, X, X2=None):
        raise NotImplementedError

    def Kdiag(self, X):
        raise NotImplementedError

    def __add__(self, other):
        return Sum(kernels=[self, other], input_dim=self.input_dim)

    def __mul__(self, other):
        return Product(kernels=[self, other], input_dim=self.input_dim)


def _cross(A, B):
    # full-f32 MXU passes for the distance cross term: TPU's default
    # bf16-class f32 matmul carries ~1% relative error, and at high
    # input dim / large input magnitude (e.g. the 784-dim MNIST layer,
    # or PCA-projected hidden inputs with ||x|| ~ 15) the x^2+z^2-2xz
    # cancellation then yields "squared distances" wrong by O(100) —
    # enough to make the gram indefinite beyond any jitter (measured:
    # NaN'd the MNIST-scale TPU runs).  The gram matmul is O(N*M*D)
    # against the conditional's O(N*M^2*Do), so the extra passes are
    # a small fraction of total flops at DGP shapes.
    return jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def _square_dist(X, X2):
    """Pairwise squared Euclidean distance, clipped at 0.

    Computed as ||x||^2 + ||z||^2 - 2 x.z so the cross term is a single
    MXU matmul (at HIGHEST precision — see _cross).
    """
    Xs = jnp.sum(X ** 2, axis=-1, keepdims=True)            # (N, 1)
    if X2 is None:
        d = Xs + Xs.T - 2.0 * _cross(X, X.T)
    else:
        X2s = jnp.sum(X2 ** 2, axis=-1, keepdims=True)      # (M, 1)
        d = Xs + X2s.T - 2.0 * _cross(X, X2.T)
    return jnp.maximum(d, 0.0)


class Stationary(Kernel):
    """Stationary kernel with ARD lengthscales and a variance."""

    variance: Param = None
    lengthscales: Param = None
    input_dim: int = static_field(default=1)

    @classmethod
    def make(cls, input_dim, variance=1.0, lengthscales=1.0, ard=True,
             trainable=True):
        ls = jnp.asarray(lengthscales, dtype=default_float())
        if ard and ls.ndim == 0:
            ls = jnp.full((input_dim,), ls, dtype=default_float())
        return cls(
            variance=Param.positive(variance, trainable=trainable),
            lengthscales=Param.positive(ls, trainable=trainable),
            input_dim=input_dim,
        )

    def scaled_square_dist(self, X, X2=None):
        ls = self.lengthscales.value
        X = X / ls
        X2 = None if X2 is None else X2 / ls
        return _square_dist(X, X2)

    @staticmethod
    def _shape_fn(r2):
        raise NotImplementedError

    def K(self, X, X2=None):
        # NB: config.use_pallas routes the whole conditional through the
        # fused Pallas kernel at the layer level (ops/pallas/conditional);
        # the standalone gram kernel (ops/pallas/gram) measured slower
        # than XLA's fusion at DGP shapes, so plain XLA is used here.
        r2 = self.scaled_square_dist(X, X2)
        return self.variance.value * self._shape_fn(r2)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance.value


def _safe_r(r2):
    # sqrt with a gradient-safe floor (matches GPflow's clipping behavior)
    return jnp.sqrt(jnp.maximum(r2, 1e-36))


class RBF(Stationary):
    @staticmethod
    def _shape_fn(r2):
        return jnp.exp(-0.5 * r2)


class Matern12(Stationary):
    @staticmethod
    def _shape_fn(r2):
        return jnp.exp(-_safe_r(r2))


class Matern32(Stationary):
    @staticmethod
    def _shape_fn(r2):
        r = _safe_r(r2)
        s3 = np.sqrt(3.0)
        return (1.0 + s3 * r) * jnp.exp(-s3 * r)


class Matern52(Stationary):
    @staticmethod
    def _shape_fn(r2):
        r = _safe_r(r2)
        s5 = np.sqrt(5.0)
        return (1.0 + s5 * r + 5.0 / 3.0 * r2) * jnp.exp(-s5 * r)


class RationalQuadratic(Stationary):
    """k(r^2) = variance * (1 + r^2 / (2 alpha))^(-alpha) — a scale
    mixture of RBFs (GPflow 1.x RationalQuadratic; part of the inherited
    kernel surface, SURVEY §2.3)."""

    alpha: Param = None

    @classmethod
    def make(cls, input_dim, variance=1.0, lengthscales=1.0, alpha=1.0,
             ard=True, trainable=True):
        base = Stationary.make.__func__(cls, input_dim, variance,
                                        lengthscales, ard, trainable)
        return base.replace(
            alpha=Param.positive(alpha, trainable=trainable))

    def K(self, X, X2=None):
        r2 = self.scaled_square_dist(X, X2)
        a = self.alpha.value
        return self.variance.value * (1.0 + r2 / (2.0 * a)) ** (-a)


class Cosine(Stationary):
    """k(r) = variance * cos(r) with the scaled Euclidean distance
    (GPflow 1.x Cosine)."""

    @staticmethod
    def _shape_fn(r2):
        return jnp.cos(_safe_r(r2))


class Periodic(Kernel):
    """Exp-sine-squared periodic kernel (GPflow 1.x Periodic):
    k(x, z) = variance * exp(-0.5 sum_d sin^2(pi (x_d - z_d) / period)
    / ls_d^2).  Pairwise differences are (N, M, D) — fine at DGP shapes;
    there is no matmul shortcut through the sine."""

    variance: Param = None
    lengthscales: Param = None
    period: Param = None
    input_dim: int = static_field(default=1)

    @classmethod
    def make(cls, input_dim, variance=1.0, lengthscales=1.0, period=1.0,
             ard=True, trainable=True):
        ls = jnp.asarray(lengthscales, dtype=default_float())
        if ard and ls.ndim == 0:
            ls = jnp.full((input_dim,), ls, dtype=default_float())
        return cls(variance=Param.positive(variance, trainable=trainable),
                   lengthscales=Param.positive(ls, trainable=trainable),
                   period=Param.positive(period, trainable=trainable),
                   input_dim=input_dim)

    def K(self, X, X2=None):
        X2 = X if X2 is None else X2
        d = X[:, None, :] - X2[None, :, :]                  # (N, M, D)
        s = jnp.sin(jnp.pi * d / self.period.value) / self.lengthscales.value
        return self.variance.value * jnp.exp(
            -0.5 * jnp.sum(s ** 2, axis=-1))

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance.value


class ArcCosine(Kernel):
    """Cho & Saul (2009) arc-cosine kernel of order 0, 1 or 2 — the
    "infinite-width network" kernel from GPflow 1.x, with ARD weight
    variances and a bias variance."""

    variance: Param = None
    weight_variances: Param = None
    bias_variance: Param = None
    order: int = static_field(default=1)
    input_dim: int = static_field(default=1)

    @classmethod
    def make(cls, input_dim, order=1, variance=1.0, weight_variances=1.0,
             bias_variance=1.0, ard=True, trainable=True):
        assert order in (0, 1, 2), "arc-cosine order must be 0, 1 or 2"
        w = jnp.asarray(weight_variances, dtype=default_float())
        if ard and w.ndim == 0:
            w = jnp.full((input_dim,), w, dtype=default_float())
        return cls(variance=Param.positive(variance, trainable=trainable),
                   weight_variances=Param.positive(w, trainable=trainable),
                   bias_variance=Param.positive(bias_variance,
                                                trainable=trainable),
                   order=order, input_dim=input_dim)

    def _weighted_product(self, X, X2=None):
        w = self.weight_variances.value
        b = self.bias_variance.value
        if X2 is None:
            return b + (X * w) @ X.T
        return b + (X * w) @ X2.T

    def _J(self, theta):
        if self.order == 0:
            return jnp.pi - theta
        if self.order == 1:
            return jnp.sin(theta) + (jnp.pi - theta) * jnp.cos(theta)
        return 3.0 * jnp.sin(theta) * jnp.cos(theta) \
            + (jnp.pi - theta) * (1.0 + 2.0 * jnp.cos(theta) ** 2)

    def K(self, X, X2=None):
        w = self.weight_variances.value
        b = self.bias_variance.value
        dX = b + jnp.sum(X ** 2 * w, axis=-1)
        num = self._weighted_product(X, X2)
        if X2 is None:
            dX2 = dX
        else:
            dX2 = b + jnp.sum(X2 ** 2 * w, axis=-1)
        denom = jnp.sqrt(dX[:, None] * dX2[None, :])
        cos_t = jnp.clip(num / denom, -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        return (self.variance.value * (1.0 / jnp.pi)
                * self._J(theta) * denom ** self.order)

    def Kdiag(self, X):
        d = self.bias_variance.value + jnp.sum(
            X ** 2 * self.weight_variances.value, axis=-1)
        return self.variance.value / jnp.pi * self._J(
            jnp.zeros_like(d)) * d ** self.order


class White(Kernel):
    """White noise: K(X, X) = variance * I, zero cross-covariance.

    Used as an inter-layer noise term in the reference harness
    (run_regression.py:65-66).
    """

    variance: Param = None
    input_dim: int = static_field(default=1)

    @classmethod
    def make(cls, input_dim, variance=1.0, trainable=True):
        return cls(variance=Param.positive(variance, trainable=trainable),
                   input_dim=input_dim)

    def K(self, X, X2=None):
        if X2 is None:
            return self.variance.value * jnp.eye(X.shape[0], dtype=X.dtype)
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance.value


class Constant(Kernel):
    variance: Param = None
    input_dim: int = static_field(default=1)

    @classmethod
    def make(cls, input_dim, variance=1.0, trainable=True):
        return cls(variance=Param.positive(variance, trainable=trainable),
                   input_dim=input_dim)

    def K(self, X, X2=None):
        M = X.shape[0] if X2 is None else X2.shape[0]
        return self.variance.value * jnp.ones((X.shape[0], M), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance.value


class Linear(Kernel):
    """k(x, z) = variance * x.z (ARD variance per input dim)."""

    variance: Param = None
    input_dim: int = static_field(default=1)

    @classmethod
    def make(cls, input_dim, variance=1.0, ard=False, trainable=True):
        v = jnp.asarray(variance, dtype=default_float())
        if ard and v.ndim == 0:
            v = jnp.full((input_dim,), v, dtype=default_float())
        return cls(variance=Param.positive(v, trainable=trainable),
                   input_dim=input_dim)

    def K(self, X, X2=None):
        v = self.variance.value
        Xv = X * v
        return Xv @ (X if X2 is None else X2).T

    def Kdiag(self, X):
        return jnp.sum(X ** 2 * self.variance.value, axis=-1)


class Sum(Kernel):
    kernels: Any = None
    input_dim: int = static_field(default=1)

    def K(self, X, X2=None):
        return sum(k.K(X, X2) for k in self.kernels)

    def Kdiag(self, X):
        return sum(k.Kdiag(X) for k in self.kernels)


class Product(Kernel):
    kernels: Any = None
    input_dim: int = static_field(default=1)

    def K(self, X, X2=None):
        out = self.kernels[0].K(X, X2)
        for k in self.kernels[1:]:
            out = out * k.K(X, X2)
        return out

    def Kdiag(self, X):
        out = self.kernels[0].Kdiag(X)
        for k in self.kernels[1:]:
            out = out * k.Kdiag(X)
        return out
