"""Pallas TPU kernel: fully fused sparse-GP conditional (diag).

The hot path of every DGP layer (reference layers.py:178-219) in the
precomputed alpha/W formulation (models/layers.py conditional_ND,
'inverse' mode) is, per batch point x:

    k(x)    = kvar * exp(-0.5 ||x/ls - z/ls||^2)        (M,)
    mean(x) = k(x)^T alpha                               (Do,)
    var_d(x)= kdiag + k(x)^T W_d k(x)                    (Do,)

Unfused, XLA materializes Kuf (M, B) and the (Do, M, B) product in HBM
— at bench shapes that traffic is comparable to the chip's entire HBM
bandwidth budget.  This kernel tiles the batch, computes the gram tile
on the MXU and keeps it in VMEM through the mean/variance contractions:
one read of X, one write of mean/var.  Padding of M to the 128 lane
width is free because alpha/W are zero-padded (padded gram columns
cannot contribute).

The backward pass is a second fused kernel over the same tiling,
emitting dX directly and per-tile partial sums for (Z-side, alpha, W,
scalars), reduced outside.  Wrapped in jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_B = 512


def _round_up(x, m):
    return (x + m - 1) // m * m


def _acc_t(dtype):
    return jnp.float32 if dtype == jnp.bfloat16 else dtype


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xs_ref, zs_ref, alpha_ref, w_ref, scal_ref,
                mean_ref, var_ref):
    x = xs_ref[:]                                   # (TB, Dx)
    z = zs_ref[:]                                   # (Mp, Dx)
    kvar = scal_ref[0, 0]
    kdiag = scal_ref[0, 1]
    at = _acc_t(x.dtype)

    cross = jax.lax.dot_general(x, z, (((1,), (1,)), ((), ())),
                                preferred_element_type=at)   # (TB, Mp)
    xsq = jnp.sum(x * x, axis=1, keepdims=True)
    zsq = jnp.sum(z * z, axis=1, keepdims=True).T
    K = kvar * jnp.exp(-0.5 * jnp.maximum(xsq + zsq - 2.0 * cross, 0.0))

    mean_ref[:] = jnp.dot(K, alpha_ref[:],
                          preferred_element_type=at).astype(mean_ref.dtype)

    Do = w_ref.shape[0]
    for d in range(Do):
        T = jnp.dot(K, w_ref[d], preferred_element_type=at)  # (TB, Mp)
        var_d = kdiag + jnp.sum(K * T, axis=1)
        var_ref[:, d] = jnp.maximum(var_d, 0.0).astype(var_ref.dtype)


def _fused_forward(Xs, Zs, alpha, W, kvar, kdiag, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Dx = Xs.shape
    M = Zs.shape[0]
    Do = alpha.shape[1]
    Bp = _round_up(B, TILE_B)
    Mp = _round_up(M, 128)

    Xp = jnp.pad(Xs, ((0, Bp - B), (0, 0)))
    Zp = jnp.pad(Zs, ((0, Mp - M), (0, 0)))
    ap = jnp.pad(alpha, ((0, Mp - M), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, Mp - M), (0, Mp - M)))
    scal = jnp.stack([kvar, kdiag]).reshape(1, 2).astype(Xs.dtype)

    grid = (Bp // TILE_B,)
    mean, var = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, Dx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Dx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Do), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Do, Mp, Mp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_B, Do), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, Do), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Do), Xs.dtype),
            jax.ShapeDtypeStruct((Bp, Do), Xs.dtype),
        ),
        interpret=interpret,
    )(Xp, Zp, ap, Wp, scal)
    return mean[:B], var[:B]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(xs_ref, zs_ref, alpha_ref, w_ref, scal_ref, gm_ref, gv_ref,
                dx_ref, dz_ref, dalpha_ref, dw_ref, dscal_ref):
    x = xs_ref[:]
    z = zs_ref[:]
    kvar = scal_ref[0, 0]
    kdiag = scal_ref[0, 1]
    at = _acc_t(x.dtype)

    cross = jax.lax.dot_general(x, z, (((1,), (1,)), ((), ())),
                                preferred_element_type=at)
    xsq = jnp.sum(x * x, axis=1, keepdims=True)
    zsq = jnp.sum(z * z, axis=1, keepdims=True).T
    K = kvar * jnp.exp(-0.5 * jnp.maximum(xsq + zsq - 2.0 * cross, 0.0))

    gm = gm_ref[:]                                  # (TB, Do)
    gv = gv_ref[:]                                  # (TB, Do)

    # re-derive the clamp mask: var_d >= 0 after kdiag shift
    Do = w_ref.shape[0]
    dK = jnp.dot(gm, alpha_ref[:].T, preferred_element_type=at)  # (TB, Mp)
    dkdiag = jnp.zeros((), dtype=at)
    for d in range(Do):
        T = jnp.dot(K, w_ref[d], preferred_element_type=at)      # (TB, Mp)
        var_d = kdiag + jnp.sum(K * T, axis=1)
        g_d = jnp.where(var_d > 0.0, gv[:, d], 0.0)              # clamp vjp
        dkdiag = dkdiag + jnp.sum(g_d)
        dK = dK + 2.0 * g_d[:, None] * T
        # dW_d = K^T diag(g_d) K
        dw_ref[0, d] = jnp.dot((K * g_d[:, None]).T, K,
                               preferred_element_type=at).astype(dw_ref.dtype)

    dalpha_ref[0] = jnp.dot(K.T, gm,
                            preferred_element_type=at).astype(dalpha_ref.dtype)

    # chain through K = kvar * exp(-0.5 * dist)
    dkvar = jnp.sum(dK * K) / kvar
    G = dK * (-0.5) * K                              # dL/d dist, (TB, Mp)
    rs = jnp.sum(G, axis=1, keepdims=True)           # (TB, 1)
    cs = jnp.sum(G, axis=0, keepdims=True)           # (1, Mp)
    dx_ref[:] = (2.0 * (x * rs - jnp.dot(G, z, preferred_element_type=at))
                 ).astype(dx_ref.dtype)
    dz_ref[0] = (2.0 * (z * cs.T - jnp.dot(G.T, x,
                                           preferred_element_type=at))
                 ).astype(dz_ref.dtype)
    # scalar partials live in an (8, 128)-aligned VMEM tile (TPU pallas
    # cannot address smaller output blocks); [0,0]=dkvar, [0,1]=dkdiag
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    zero = jnp.zeros((8, 128), dtype=at)
    buf = (jnp.where((row == 0) & (col == 0), dkvar, zero)
           + jnp.where((row == 0) & (col == 1), dkdiag, zero))
    dscal_ref[0] = buf.astype(dscal_ref.dtype)


def _fused_backward(Xs, Zs, alpha, W, kvar, kdiag, gm, gv,
                    interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Dx = Xs.shape
    M = Zs.shape[0]
    Do = alpha.shape[1]
    Bp = _round_up(B, TILE_B)
    Mp = _round_up(M, 128)
    nT = Bp // TILE_B

    Xp = jnp.pad(Xs, ((0, Bp - B), (0, 0)))
    Zp = jnp.pad(Zs, ((0, Mp - M), (0, 0)))
    ap = jnp.pad(alpha, ((0, Mp - M), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, Mp - M), (0, Mp - M)))
    scal = jnp.stack([kvar, kdiag]).reshape(1, 2).astype(Xs.dtype)
    gmp = jnp.pad(gm, ((0, Bp - B), (0, 0)))
    gvp = jnp.pad(gv, ((0, Bp - B), (0, 0)))

    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((TILE_B, Dx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Dx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Do), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Do, Mp, Mp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, Do), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, Do), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_B, Dx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Dx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Do), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Do, Mp, Mp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((nT, Mp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((nT, Mp, Do), Xs.dtype),
            jax.ShapeDtypeStruct((nT, Do, Mp, Mp), Xs.dtype),
            jax.ShapeDtypeStruct((nT, 8, 128), Xs.dtype),
        ),
        interpret=interpret,
    )(Xp, Zp, ap, Wp, scal, gmp, gvp)
    dXp, dZt, dat, dWt, dst = outs
    dXs = dXp[:B]
    dZs = jnp.sum(dZt, axis=0)[:M]
    dalpha = jnp.sum(dat, axis=0)[:M]
    dW = jnp.sum(dWt, axis=0)[:, :M, :M]
    ds = jnp.sum(dst, axis=0)
    return dXs, dZs, dalpha, dW, ds[0, 0], ds[0, 1]


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_conditional(Xs, Zs, alpha, W, kvar, kdiag, interpret=False):
    """mean (B, Do), var (B, Do) of the fused sparse conditional.

    Xs, Zs: lengthscale-scaled inputs/inducing points; alpha (M, Do);
    W (Do, M, M); kvar/kdiag scalars.
    """
    return _fused_forward(Xs, Zs, alpha, W, kvar, kdiag,
                          interpret=interpret)


def _fc_fwd(Xs, Zs, alpha, W, kvar, kdiag, interpret):
    out = _fused_forward(Xs, Zs, alpha, W, kvar, kdiag,
                         interpret=interpret)
    return out, (Xs, Zs, alpha, W, kvar, kdiag)


def _fc_bwd(interpret, res, cot):
    Xs, Zs, alpha, W, kvar, kdiag = res
    gm, gv = cot
    dXs, dZs, dalpha, dW, dkvar, dkdiag = _fused_backward(
        Xs, Zs, alpha, W, kvar, kdiag, gm, gv, interpret=interpret)
    return (dXs, dZs, dalpha, dW,
            dkvar.astype(jnp.asarray(kvar).dtype),
            dkdiag.astype(jnp.asarray(kdiag).dtype))


fused_conditional.defvjp(_fc_fwd, _fc_bwd)


def fused_conditional_reference(Xs, Zs, alpha, W, kvar, kdiag):
    """Plain-jnp reference of the same math (for parity tests and as the
    XLA fallback)."""
    d = (Xs[:, None, :] - Zs[None, :, :])
    K = kvar * jnp.exp(-0.5 * jnp.sum(d * d, -1))    # (B, M)
    mean = K @ alpha
    T = jnp.einsum("bm,dmn->dbn", K, W)
    var = kdiag + jnp.einsum("bm,dbm->bd", K, T)
    return mean, jnp.maximum(var, 0.0)
