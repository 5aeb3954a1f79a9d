"""Pallas TPU kernel: fused RBF gram matrix.

The gram construction K(X, Z) = var * exp(-0.5 * ||x/ls - z/ls||^2) is
the hot op of the sparse conditional (reference layers.py:184: Kuf at
every layer, every step, over the (M, S*N) batch).  XLA computes it as
matmul + several elementwise kernels with an (N, M) intermediate round
trip to HBM; this kernel tiles the output, runs the -2*X@Z^T cross term
on the MXU per tile, and fuses the norm broadcast + exp epilogue in
VMEM — one HBM write of the final tile, no intermediates.

Forward is the Pallas kernel; backward is a custom VJP of closed-form
matmul expressions (XLA-fused), reusing the saved K.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_N = 512
TILE_M = 128
_MIN_ELEMENTS = 64 * 64  # below this, XLA's fusion is already fine


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gram_kernel(x_ref, z_ref, o_ref):
    """One (TILE_N, TILE_M) output tile: fused sqdist + exp."""
    import jax.lax as lax

    x = x_ref[:]                      # (TN, D) pre-scaled by 1/ls
    z = z_ref[:]                      # (TM, D)
    acc_t = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    # HIGHEST precision: Mosaic's default lowers f32 dots to bf16-class
    # MXU passes and exp() amplifies the distance error to ~1e-2 in K
    # (measured, see ops/pallas/conditional.py::_gram_tile); the cross
    # dot is D/M of the tile's flops so multi-pass cost is noise.
    cross = jax.lax.dot_general(
        x, z, (((1,), (1,)), ((), ())),
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.HIGHEST)         # (TN, TM) on the MXU
    xsq = jnp.sum(x * x, axis=1, keepdims=True)      # (TN, 1)
    zsq = jnp.sum(z * z, axis=1, keepdims=True).T    # (1, TM)
    d = jnp.maximum(xsq + zsq - 2.0 * cross, 0.0)
    o_ref[:] = jnp.exp(-0.5 * d).astype(o_ref.dtype)


def _gram_pallas_call(Xs, Zs, interpret=False):
    """exp(-0.5 ||x - z||^2) for pre-scaled inputs, padded to tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = Xs.shape
    M = Zs.shape[0]
    Np, Mp = _round_up(N, TILE_N), _round_up(M, TILE_M)
    # pad rows with a far-away sentinel? zeros are fine — padded rows are
    # sliced off below and never feed the reduction.
    Xp = jnp.pad(Xs, ((0, Np - N), (0, 0)))
    Zp = jnp.pad(Zs, ((0, Mp - M), (0, 0)))

    grid = (Np // TILE_N, Mp // TILE_M)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), Xs.dtype),
        interpret=interpret,
    )(Xp, Zp)
    return out[:N, :M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rbf_gram(X, Z, lengthscales, variance, interpret=False):
    """var * exp(-0.5 ||(x-z)/ls||^2), Pallas-fused on TPU."""
    Xs = X / lengthscales
    Zs = Z / lengthscales
    return variance * _gram_pallas_call(Xs, Zs, interpret=interpret)


def _fwd(X, Z, lengthscales, variance, interpret):
    K = rbf_gram(X, Z, lengthscales, variance, interpret)
    return K, (X, Z, lengthscales, variance, K)


def _bwd(interpret, res, g):
    X, Z, ls, var, K = res
    # W = g * K is the common factor of every gradient term
    W = g * K                                           # (N, M)
    inv2 = 1.0 / (ls * ls)                              # (D,)
    rowsum = jnp.sum(W, axis=1, keepdims=True)          # (N, 1)
    colsum = jnp.sum(W, axis=0, keepdims=True)          # (1, M)
    WZ = W @ Z                                          # (N, D) MXU
    WTX = W.T @ X                                       # (M, D) MXU
    dX = -(X * rowsum - WZ) * inv2
    dZ = -(Z * colsum.T - WTX) * inv2
    # d/d ls_d: sum_nm W_nm (x_nd - z_nd)^2 / ls_d^3, expanded so the
    # contraction is two matmuls instead of an (N, M, D) intermediate
    x2 = jnp.sum((X * X).T * rowsum.T, axis=1)          # (D,)
    z2 = jnp.sum((Z * Z).T * colsum, axis=1)            # (D,)
    xz = jnp.sum(X * WZ, axis=0)                        # (D,)
    dls = (x2 + z2 - 2.0 * xz) / (ls ** 3)
    dvar = jnp.sum(W) / var
    return dX, dZ, dls, dvar


rbf_gram.defvjp(_fwd, _bwd)


def _is_tpu() -> bool:
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat in ("tpu", "axon")


def rbf_gram_maybe(X, Z, lengthscales, variance):
    """Route through the Pallas kernel when profitable; None -> caller
    falls back to the XLA path."""
    if X.ndim != 2 or Z.ndim != 2:
        return None
    if X.shape[0] * Z.shape[0] < _MIN_ELEMENTS:
        return None
    if not _is_tpu():
        return None
    return rbf_gram(X, Z, jnp.broadcast_to(lengthscales, (X.shape[1],)),
                    variance)
