"""Precomputed-posterior (serving) cache for sparse variational layers.

The reference (and GPflow 1.x generally) re-runs the full conditional
pipeline — Kuu gram, Cholesky, triangular solves/inverse, staging
contractions — on *every* prediction call (reference layers.py:167-219
rebuilds `Lu` per graph; each `@autoflow` predict re-executes it).  For
training that cost is unavoidable (Z and q move every step), but at
serving time the parameters are frozen, so everything that depends only
on the parameters can be computed once and stored.  GPflow 2 later
introduced the same idea as ``model.posterior()``; here it is a pure
pytree-to-pytree transform, which makes the cached model jit-able,
exportable (serving.py StableHLO artifacts) and shardable like any
other model.

:func:`precompute` maps every SVGP-family layer (``SVGPLayer``,
``SGPMCLayer``) to a :class:`CachedSVGPLayer` holding the staged
factors

    Li    = Lu^{-1}                      (M, M)
    alpha = Li q_mu   (q_mu if white)    (M, D)
    C     = Li q_sqrt (q_sqrt if white)  (D, M, M)   [None if q_sqrt is]

so a prediction needs only the cross-gram and pure MXU matmuls:

    G    = Li Kuf                        (M, B)
    mean = G^T alpha + m(X)
    var  = Kff - colsum(G*G) + colsum(H*H),   H = C^T G

— the same sum-of-squares staged form as the training-path
``solve_mode='inverse'`` branch (models/layers.py), so cached and live
predictions agree to float roundoff.  The O(M^3) Cholesky + inverse and
the O(M^2 D) staging disappear from the per-request cost; for small
serving batches (B ~ M) that is the dominant term.

The staging factors are computed once at HIGHEST matmul precision
(one-time cost); the per-request contractions follow the layer's
``precision`` tier exactly like the live path.

Cached layers are prediction-only: ``KL()`` raises, so accidentally
training a cached model fails loudly rather than silently optimizing
stale factors.  Cached arrays are bare buffers (not ``Param``), so
``trainable_mask`` is all-False over them.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import default_float
from ..utils.modules import Module, Param, static_field
from ..ops.linalg import inv_lower
from .layers import Layer, SVGPLayer
from .mean_functions import MeanFunction

__all__ = ["CachedSVGPLayer", "precompute"]


class CachedSVGPLayer(Layer):
    """Prediction-only SVGP layer with precomputed staging factors.

    Built by :func:`precompute`; see the module docstring for the math.
    All array fields are bare buffers (no ``Param`` wrappers): the cache
    is a snapshot, not an optimizable state.
    """

    kern: Any = None
    Z: Any = None                 # (M, D_in) inducing inputs (buffer)
    Li: Any = None                # (M, M) Lu^{-1} (buffer)
    alpha: Any = None             # (M, D) staged mean head (buffer)
    C: Optional[Any] = None       # (D, M, M) staged cov factor or None
    mean_function: MeanFunction = None
    num_outputs_: int = static_field(default=1)
    input_prop_dim: Optional[int] = static_field(default=None)
    jitter: float = static_field(default=1e-6)
    precision: str = static_field(default="default")

    @property
    def num_outputs(self):
        return self.num_outputs_

    def KL(self):
        raise NotImplementedError(
            "CachedSVGPLayer is prediction-only: the staging factors are "
            "a frozen snapshot of (Z, kern, q_mu, q_sqrt).  Train the "
            "original model and re-run precompute().")

    def conditional_ND(self, X, full_cov=False):
        """Staged conditional from the cache (no Cholesky/inverse).

        Identical math (and, on the diag path, identical op sequence) to
        the live ``solve_mode='inverse'`` sum-of-squares branch at
        models/layers.py::SVGPLayer._conditional_ND_impl."""
        if self.precision == "highest" or (
                self.precision in ("mixed", "mixed_g") and full_cov):
            with jax.default_matmul_precision("highest"):
                return self._impl(X, full_cov)
        return self._impl(X, full_cov)

    def _impl(self, X, full_cov):
        prec = (jax.lax.Precision.HIGHEST
                if self.precision == "mixed" else None)
        prec_g = (jax.lax.Precision.HIGHEST
                  if self.precision in ("mixed", "mixed_g") else None)
        Kuf = self.kern.K(self.Z, X)                           # (M, B)
        G = jnp.matmul(self.Li, Kuf, precision=prec_g)         # (M, B)
        mean = jnp.matmul(G.T, self.alpha, precision=prec)     # (B, D)
        if full_cov:
            Kff = self.kern.K(X)                               # (B, B)
            cov = Kff - G.T @ G                                # (B, B)
            if self.C is None:
                var = cov[:, :, None]                          # (B, B, 1)
            else:
                H = jnp.einsum("dim,ib->dmb", self.C, G)       # (D, M, B)
                var = cov[None] + jnp.einsum("dmb,dmc->dbc", H, H)
                var = jnp.transpose(var, (1, 2, 0))            # (B, B, D)
            return mean + self.mean_function(X), var
        Kff = self.kern.Kdiag(X)                               # (B,)
        resid = Kff - jnp.sum(G * G, axis=0)                   # (B,)
        if self.C is None:
            var = resid[:, None]                               # (B, 1)
        else:
            D_, M_, _ = self.C.shape
            CT = jnp.swapaxes(self.C, -1, -2).reshape(D_ * M_, M_)
            H = (CT @ G).reshape(D_, M_, G.shape[1])           # (D, M, B)
            var = resid[:, None] + jnp.sum(H * H, axis=1).T    # (B, D)
        var = jnp.maximum(var, 0.0)
        return mean + self.mean_function(X), var


def _freeze_params(tree):
    """Mark every Param in the (sub)tree non-trainable: the cache is a
    snapshot of *all* the layer's parameters — moving the kernel (or a
    Linear mean fn) would silently invalidate Li/alpha/C."""
    return jax.tree_util.tree_map(
        lambda n: n.set_trainable(False) if isinstance(n, Param) else n,
        tree, is_leaf=lambda n: isinstance(n, Param))


def _cache_svgp(layer: SVGPLayer) -> CachedSVGPLayer:
    # One-time staging at HIGHEST precision — the cancellation-critical
    # contractions, same contract the 'mixed' tier pins on the live path.
    with jax.default_matmul_precision("highest"):
        _, Lu = layer._chol_Kuu()
        Li = inv_lower(Lu)
        if layer.white:
            alpha = layer.q_mu.value
            C = None if layer.q_sqrt is None else layer.q_sqrt.value
        else:
            alpha = Li @ layer.q_mu.value
            C = (None if layer.q_sqrt is None
                 else jnp.einsum("ij,djk->dik", Li, layer.q_sqrt.value))
    return CachedSVGPLayer(
        kern=_freeze_params(layer.kern),
        Z=jnp.asarray(layer.Z.value, dtype=default_float()),
        Li=Li, alpha=alpha, C=C,
        mean_function=_freeze_params(layer.mean_function),
        num_outputs_=layer.num_outputs_,
        input_prop_dim=layer.input_prop_dim,
        jitter=layer.jitter,
        precision=layer.precision,
    )


def precompute(model):
    """Return a copy of ``model`` whose SVGP-family layers are replaced
    by :class:`CachedSVGPLayer` snapshots (see module docstring).

    Non-SVGP layers (dense GPMC, collapsed GPR/SGPR) pass through
    unchanged — GPMC already caches its prior Cholesky at build time,
    and the collapsed layers' prediction state is their stored data.
    The returned model supports the full prediction surface
    (``predict_f(_full_cov)``, ``predict_y``, ``predict_density``,
    ``predict_all_layers(_full_cov)``) but not training.
    """
    layers = [
        _cache_svgp(l) if isinstance(l, SVGPLayer) else l
        for l in model.layers
    ]
    return model.replace(layers=layers)
