"""Gauss-Hermite quadrature.

Rebuilds ``gpflow.quadrature.mvhermgauss`` / ``ndiagquad`` used by the
reference at /root/reference/doubly_stochastic_dgp/dgp.py:23,143 (the
DGP_Quad grid) and implicitly by every non-Gaussian likelihood
(SURVEY §2.3).

Nodes/weights are computed host-side with numpy (static, shape-fixed) and
enter jit as constants; the quadrature sums themselves are batched
broadcast-multiply-reduce ops that XLA fuses.
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from ..config import default_float

__all__ = ["hermgauss", "mvhermgauss", "ndiagquad"]


def hermgauss(H: int):
    """1D Gauss-Hermite nodes/weights (physicists', weight exp(-x^2))."""
    x, w = np.polynomial.hermite.hermgauss(H)
    return x.astype(np.float64), w.astype(np.float64)


def mvhermgauss(H: int, D: int):
    """Multivariate GH grid: cartesian product of 1D rules.

    Returns (x, w): x is (H**D, D) locations, w is (H**D,) weights, for
    integrals against exp(-||x||^2) — exactly the convention of
    gpflow.quadrature.mvhermgauss consumed at reference dgp.py:143-145
    (callers rescale x by sqrt(2) and w by pi^(-D/2)).
    """
    gh_x, gh_w = hermgauss(H)
    x = np.array(list(itertools.product(*(gh_x,) * D)))       # (H**D, D)
    w = np.prod(np.array(list(itertools.product(*(gh_w,) * D))), 1)
    return x, w


def ndiagquad(funcs, H: int, Fmu, Fvar, logspace: bool = False, **Ys):
    """Quadrature of func(F, **Ys) against independent Gaussians N(Fmu, Fvar),
    elementwise over the trailing dims (the gpflow ndiagquad equivalent).

    funcs: a callable or list of callables taking (X, **Ys) elementwise.
    Fmu, Fvar: arrays of identical shape (..., D).
    logspace: return log E[exp(func)] via logsumexp (for predictive
        densities).
    """
    x, w = hermgauss(H)
    dtype = jnp.result_type(Fmu, default_float())
    x = jnp.asarray(x, dtype=dtype)
    w = jnp.asarray(w / np.sqrt(np.pi), dtype=dtype)
    shape = (H,) + (1,) * jnp.ndim(Fmu)
    xn = x.reshape(shape)
    wn = w.reshape(shape)
    # floor: d sqrt(v)/dv -> inf at v = 0, and the upstream conditional
    # variance is clamped at exactly 0 in float32; maximum() is
    # zero-gradient below the floor, keeping grads finite.
    Fvar = jnp.maximum(Fvar, 1e-12)
    X = Fmu[None] + jnp.sqrt(2.0 * Fvar)[None] * xn            # (H, ..., D)

    def one(f):
        fX = f(X, **Ys)
        if logspace:
            return logsumexp(fX + jnp.log(wn), axis=0)
        return jnp.sum(fX * wn, axis=0)

    if isinstance(funcs, (list, tuple)):
        return [one(f) for f in funcs]
    return one(funcs)
