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
                dx_ref, dz_ref, dalpha_ref, dw_ref):
    """Backward tile.  ``gv`` arrives already clamp-masked (done in jnp
    from the saved forward outputs), and the scalar grads (dkvar,
    dkdiag) are reconstructed outside from (mean, var) — Mosaic cannot
    lower full-to-scalar reductions or sub-block ref offsets, so the
    kernel only emits tensor-shaped results."""
    x = xs_ref[:]
    z = zs_ref[:]
    kvar = scal_ref[0, 0]
    at = _acc_t(x.dtype)

    cross = jax.lax.dot_general(x, z, (((1,), (1,)), ((), ())),
                                preferred_element_type=at)
    xsq = jnp.sum(x * x, axis=1, keepdims=True)
    zsq = jnp.sum(z * z, axis=1, keepdims=True).T
    K = kvar * jnp.exp(-0.5 * jnp.maximum(xsq + zsq - 2.0 * cross, 0.0))

    gm = gm_ref[:]                                  # (TB, Do)
    gv = gv_ref[:]                                  # (TB, Do), pre-masked

    Do = w_ref.shape[0]
    Wv = w_ref[:]                                   # one full-block read
    dK = jnp.dot(gm, alpha_ref[:].T, preferred_element_type=at)  # (TB, Mp)
    dws = []
    for d in range(Do):
        T = jnp.dot(K, Wv[d], preferred_element_type=at)         # (TB, Mp)
        g_d = gv[:, d]
        dK = dK + 2.0 * g_d[:, None] * T
        # dW_d = K^T diag(g_d) K
        dws.append(jnp.dot((K * g_d[:, None]).T, K,
                           preferred_element_type=at))
    dw_ref[0] = jnp.stack(dws, axis=0).astype(dw_ref.dtype)

    dalpha_ref[0] = jnp.dot(K.T, gm,
                            preferred_element_type=at).astype(dalpha_ref.dtype)

    # chain through K = kvar * exp(-0.5 * dist)
    G = dK * (-0.5) * K                              # dL/d dist, (TB, Mp)
    rs = jnp.sum(G, axis=1, keepdims=True)           # (TB, 1)
    cs = jnp.sum(G, axis=0, keepdims=True)           # (1, Mp)
    dx_ref[:] = (2.0 * (x * rs - jnp.dot(G, z, preferred_element_type=at))
                 ).astype(dx_ref.dtype)
    dz_ref[0] = (2.0 * (z * cs.T - jnp.dot(G.T, x,
                                           preferred_element_type=at))
                 ).astype(dz_ref.dtype)


def _fused_backward(Xs, Zs, alpha, W, kvar, gm, gv,
                    interpret=False):
    """gm/gv are the (already clamp-masked) output cotangents; returns
    (dXs, dZs, dalpha, dW).  Scalar grads are reconstructed by the
    caller from the saved forward outputs."""
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
    scal = jnp.stack([kvar, kvar]).reshape(1, 2).astype(Xs.dtype)
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
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((nT, Mp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((nT, Mp, Do), Xs.dtype),
            jax.ShapeDtypeStruct((nT, Do, Mp, Mp), Xs.dtype),
        ),
        interpret=interpret,
    )(Xp, Zp, ap, Wp, scal, gmp, gvp)
    dXp, dZt, dat, dWt = outs
    dXs = dXp[:B]
    dZs = jnp.sum(dZt, axis=0)[:M]
    dalpha = jnp.sum(dat, axis=0)[:M]
    dW = jnp.sum(dWt, axis=0)[:, :M, :M]
    return dXs, dZs, dalpha, dW


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
    mean, var = out
    return out, (Xs, Zs, alpha, W, kvar, kdiag, mean, var)


def _fc_bwd(interpret, res, cot):
    Xs, Zs, alpha, W, kvar, kdiag, mean, var = res
    gm, gv = cot
    # clamp VJP: entries where the forward clamped var at 0 get no
    # variance cotangent
    gv_eff = jnp.where(var > 0.0, gv, 0.0)
    # scalar grads from saved outputs (Mosaic cannot lower full-to-scalar
    # reductions in-kernel):
    #   sum(dK*K) = sum(gm*mean) + 2 sum(gv_eff*(var - kdiag))
    dkdiag = jnp.sum(gv_eff)
    dkvar = (jnp.sum(gm * mean)
             + 2.0 * jnp.sum(gv_eff * (var - kdiag))) / kvar
    dXs, dZs, dalpha, dW = _fused_backward(
        Xs, Zs, alpha, W, kvar, gm, gv_eff, interpret=interpret)
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
