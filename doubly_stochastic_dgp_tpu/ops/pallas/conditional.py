"""Pallas TPU kernel: fully fused sparse-GP conditional (diag).

The hot path of every DGP layer (reference layers.py:178-219) in the
precomputed alpha/W formulation (models/layers.py conditional_ND,
'inverse' mode) is, per batch point x:

    k(x)    = kvar * exp(-0.5 ||x/ls - z/ls||^2)        (M,)
    mean(x) = k(x)^T alpha                               (Do,)
    var_d(x)= kdiag + k(x)^T W_d k(x)                    (Do,)

Unfused, XLA materializes Kuf (M, B) and the (Do, M, B) product in HBM
— at large M that traffic is comparable to the chip's entire HBM
bandwidth budget.  This kernel tiles the batch, computes the gram tile
on the MXU and keeps it in VMEM through the mean/variance contractions:
one read of X, one write of mean/var.

Layout (round 2): the grid is (Do, num_batch_tiles) — each grid row d
streams only its own W_d (Mp, Mp) block through VMEM (pallas pipelines
the next W_{d+1} DMA behind the current row automatically), instead of
keeping all of W (Do, Mp, Mp) resident.  That lifts the former M<=256
VMEM cap to M ~ 1024 (the per-step working set is W_d + a (TILE_B, Mp)
gram + its product).  The gram tile is recomputed per d — an extra
2*TB*M*Dx flops against the 2*TB*M^2 the variance contraction already
pays, i.e. ~Dx/M relative overhead.  Padding of M to the 128 lane width
is free because alpha/W are zero-padded (padded gram columns cannot
contribute).

The backward pass is a second fused kernel over the same grid,
accumulating dW_d / dZ_d / dalpha in revisited output blocks (the batch
tile is the fastest grid axis, so those blocks stay VMEM-resident
across the row) and emitting per-d dX partials reduced outside.
Wrapped in jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def pallas_profitable(M, Do, B):
    """ISOLATED-probe win region for the fused conditional on TPU v5e
    (PERF.md round 2, best-of-3 timings at B=8192): few-output-dim
    conditionals at mid/large M — 1.29x at (M=256, Do=1), >=1.04x
    across M in [128, 1024].  NOTE (round 3): end-to-end training
    measurements show XLA's whole-graph fusion ahead IN-CONTEXT even
    inside this region (scripts/bench_large_m.py: 0.79-0.96x — the
    custom-VJP call is a fusion barrier and XLA reuses the gram as a
    saved residual), which is why ``config.use_pallas`` now defaults to
    False.  'auto' (this gate) remains available for standalone
    conditional workloads matching the isolated probes."""
    return Do <= 2 and 128 <= M <= 1024 and B >= 2048


def _tile_b(Mp, bwd=False):
    """Batch tile: shrink when W_d + gram tiles get big (VMEM ~16MB).
    The backward holds W_d AND the accumulating dW_d block (2 x Mp^2)
    plus three (TB, Mp) intermediates, so it tiles smaller at large M."""
    if Mp <= 512:
        return 512
    return 128 if bwd else 256


def _acc_t(dtype):
    return jnp.float32 if dtype == jnp.bfloat16 else dtype


def _gram_tile(x, z, kvar, at):
    """kvar * exp(-0.5 ||x - z||^2) on the MXU, (TB, Mp).

    The cross term MUST run at HIGHEST matmul precision: Mosaic's
    default lowers f32 dots to bf16-class MXU passes, and exp()
    amplifies the resulting ~1e-2 absolute distance error into ~1e-2
    mean error (measured on v5e: max rel 12.9 vs the elementwise-exact
    XLA gram; training loss 19794 vs 2757 after 200 steps at M=256 —
    PERF.md round-2 pallas numerics). The dot is 2*TB*M*Dx flops, ~Dx/M
    of the variance contraction, so the multi-pass cost is noise."""
    cross = jax.lax.dot_general(x, z, (((1,), (1,)), ((), ())),
                                preferred_element_type=at,
                                precision=jax.lax.Precision.HIGHEST)
    xsq = jnp.sum(x * x, axis=1, keepdims=True)
    zsq = jnp.sum(z * z, axis=1, keepdims=True).T
    return kvar * jnp.exp(-0.5 * jnp.maximum(xsq + zsq - 2.0 * cross, 0.0))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _onehot_lane(d, Do, dtype):
    """(1, Do) one-hot row selecting output dim d (TPU needs 2D iota;
    dynamic lane indexing is avoided by masking instead)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Do), 1)
    return (lane == d).astype(dtype)


def _fwd_body(d, x, z, alpha_ref, w_ref, kvar, kdiag,
              mean_ref, var_ref, k_scr):
    """Shared forward step: at d == 0 compute the gram tile once into
    the VMEM scratch (it persists across the fast d axis — round-2
    change: K was previously recomputed per d) and emit the mean; every
    d accumulates its variance column."""
    at = _acc_t(x.dtype)

    @pl.when(d == 0)
    def _():
        k_scr[:] = _gram_tile(x, z, kvar, at)
        mean_ref[:] = jnp.dot(
            k_scr[:], alpha_ref[:],
            preferred_element_type=at, precision=jax.lax.Precision.HIGHEST).astype(mean_ref.dtype)
        var_ref[:] = jnp.zeros_like(var_ref)

    K = k_scr[:]
    T = jnp.dot(K, w_ref[0], preferred_element_type=at, precision=jax.lax.Precision.HIGHEST)   # (TB, Mp)
    var_d = jnp.maximum(kdiag + jnp.sum(K * T, axis=1), 0.0)
    onehot = _onehot_lane(d, var_ref.shape[1], var_d.dtype)
    var_ref[:] = var_ref[:] + (var_d[:, None] * onehot).astype(
        var_ref.dtype)


def _fwd_kernel(xs_ref, zs_ref, alpha_ref, w_ref, scal_ref,
                mean_ref, var_ref, k_scr):
    # grid (num_batch_tiles, Do): d is the fast axis, so the mean/var
    # output blocks for batch tile i stay VMEM-resident across the d
    # sweep while W_d streams through.
    d = pl.program_id(1)
    _fwd_body(d, xs_ref[:], zs_ref[:], alpha_ref, w_ref,
              scal_ref[0, 0], scal_ref[0, 1], mean_ref, var_ref, k_scr)


def _fwd_kernel_sg(xs_ref, zs_ref, alpha_ref, w_ref, scal_ref,
                   mean_ref, var_ref, k_ref, k_scr):
    """save_gram variant: additionally writes the gram tile to HBM so
    the backward can consume it instead of recomputing (round-1 VERDICT
    next-step #7)."""
    d = pl.program_id(1)
    _fwd_body(d, xs_ref[:], zs_ref[:], alpha_ref, w_ref,
              scal_ref[0, 0], scal_ref[0, 1], mean_ref, var_ref, k_scr)

    @pl.when(d == 0)
    def _():
        k_ref[:] = k_scr[:].astype(k_ref.dtype)


def _fused_forward(Xs, Zs, alpha, W, kvar, kdiag, interpret=False,
                   save_gram=False):
    B, Dx = Xs.shape
    M = Zs.shape[0]
    Do = alpha.shape[1]
    Mp = _round_up(M, 128)
    TB = _tile_b(Mp)
    Bp = _round_up(B, TB)
    nT = Bp // TB

    Xp = jnp.pad(Xs, ((0, Bp - B), (0, 0)))
    Zp = jnp.pad(Zs, ((0, Mp - M), (0, 0)))
    ap = jnp.pad(alpha, ((0, Mp - M), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, Mp - M), (0, Mp - M)))
    scal = jnp.stack([kvar, kdiag]).reshape(1, 2).astype(Xs.dtype)

    out_specs = [
        pl.BlockSpec((TB, Do), lambda i, d: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, Do), lambda i, d: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, Do), Xs.dtype),
        jax.ShapeDtypeStruct((Bp, Do), Xs.dtype),
    ]
    if save_gram:
        out_specs.append(pl.BlockSpec((TB, Mp), lambda i, d: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((Bp, Mp), Xs.dtype))

    outs = pl.pallas_call(
        _fwd_kernel_sg if save_gram else _fwd_kernel,
        grid=(nT, Do),
        in_specs=[
            pl.BlockSpec((TB, Dx), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Dx), lambda i, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Do), lambda i, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Mp), lambda i, d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, d: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((TB, Mp), _acc_t(Xs.dtype))],
        interpret=interpret,
    )(Xp, Zp, ap, Wp, scal)
    if save_gram:
        mean, var, K = outs
        return mean[:B], var[:B], K
    mean, var = outs
    return mean[:B], var[:B]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel_sg(xs_ref, zs_ref, alpha_ref, w_ref, scal_ref, gm_ref,
                   gv_ref, k_ref, dx_ref, dz_ref, dalpha_ref, dw_ref):
    """save_gram backward: consumes the forward-saved gram tile from HBM
    instead of recomputing it on the MXU+VPU (round-1 VERDICT next-step
    #7 — trades one (B, Mp) HBM stream per d for the in-kernel
    gram recompute the round-3 analysis blamed for the end-to-end
    loss)."""
    _bwd_body(pl.program_id(0), pl.program_id(1),
              xs_ref, zs_ref, alpha_ref, w_ref, gm_ref, gv_ref,
              k_ref[:].astype(_acc_t(xs_ref.dtype)),
              dx_ref, dz_ref, dalpha_ref, dw_ref)


def _bwd_kernel(xs_ref, zs_ref, alpha_ref, w_ref, scal_ref, gm_ref, gv_ref,
                dx_ref, dz_ref, dalpha_ref, dw_ref):
    """Backward step for one (d, batch-tile) cell.  ``gv`` arrives
    already clamp-masked (done in jnp from the saved forward outputs),
    and the scalar grads (dkvar, dkdiag) are reconstructed outside from
    (mean, var) — Mosaic cannot lower full-to-scalar reductions, so the
    kernel only emits tensor-shaped results.  dW_d / dZ_d / dalpha
    accumulate in-place across the batch-tile axis (their blocks stay
    VMEM-resident within a grid row)."""
    d = pl.program_id(0)
    i = pl.program_id(1)
    at = _acc_t(xs_ref.dtype)
    K = _gram_tile(xs_ref[:], zs_ref[:], scal_ref[0, 0], at)  # (TB, Mp)
    _bwd_body(d, i, xs_ref, zs_ref, alpha_ref, w_ref, gm_ref, gv_ref,
              K, dx_ref, dz_ref, dalpha_ref, dw_ref)


def _bwd_body(d, i, xs_ref, zs_ref, alpha_ref, w_ref, gm_ref, gv_ref,
              K, dx_ref, dz_ref, dalpha_ref, dw_ref):
    x = xs_ref[:]
    z = zs_ref[:]
    at = _acc_t(x.dtype)
    gm = gm_ref[:]                                  # (TB, Do)
    # column d of the (pre-masked) variance cotangent, via a one-hot
    # contraction (no dynamic lane indexing on TPU)
    onehot = _onehot_lane(d, gv_ref.shape[1], gv_ref.dtype)
    g_d = jnp.sum(gv_ref[:] * onehot, axis=1)       # (TB,)

    T = jnp.dot(K, w_ref[0], preferred_element_type=at, precision=jax.lax.Precision.HIGHEST)     # (TB, Mp)
    dK = 2.0 * g_d[:, None] * T
    # the mean term enters dK exactly once (on the d == 0 row)
    dK = dK + jnp.where(
        d == 0,
        jnp.dot(gm, alpha_ref[:].T, preferred_element_type=at, precision=jax.lax.Precision.HIGHEST),
        jnp.zeros_like(dK))

    @pl.when(jnp.logical_and(d == 0, i == 0))
    def _():
        dalpha_ref[:] = jnp.zeros_like(dalpha_ref)

    @pl.when(d == 0)
    def _():
        dalpha_ref[:] = (dalpha_ref[:]
                         + jnp.dot(K.T, gm, preferred_element_type=at,
                                   precision=jax.lax.Precision.HIGHEST
                                   ).astype(dalpha_ref.dtype))

    # dW_d = sum_tiles K^T diag(g_d) K
    @pl.when(i == 0)
    def _():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])
        dz_ref[0] = jnp.zeros_like(dz_ref[0])

    dw_ref[0] = (dw_ref[0]
                 + jnp.dot((K * g_d[:, None]).T, K,
                           preferred_element_type=at, precision=jax.lax.Precision.HIGHEST).astype(dw_ref.dtype))

    # chain through K = kvar * exp(-0.5 * dist)
    G = dK * (-0.5) * K                              # dL/d dist, (TB, Mp)
    rs = jnp.sum(G, axis=1, keepdims=True)           # (TB, 1)
    cs = jnp.sum(G, axis=0, keepdims=True)           # (1, Mp)
    dx_ref[0] = (2.0 * (x * rs
                        - jnp.dot(G, z, preferred_element_type=at, precision=jax.lax.Precision.HIGHEST))
                 ).astype(dx_ref.dtype)
    dz_ref[0] = (dz_ref[0]
                 + 2.0 * (z * cs.T
                          - jnp.dot(G.T, x, preferred_element_type=at, precision=jax.lax.Precision.HIGHEST)
                          ).astype(dz_ref.dtype))


def _fused_backward(Xs, Zs, alpha, W, kvar, gm, gv,
                    interpret=False, Kp=None):
    """gm/gv are the (already clamp-masked) output cotangents; returns
    (dXs, dZs, dalpha, dW).  Scalar grads are reconstructed by the
    caller from the saved forward outputs.  ``Kp`` (B-padded, Mp) is the
    forward-saved gram — when given, the save_gram kernel streams it
    from HBM instead of recomputing."""
    B, Dx = Xs.shape
    M = Zs.shape[0]
    Do = alpha.shape[1]
    Mp = _round_up(M, 128)
    TB = _tile_b(Mp, bwd=True)
    Bp = _round_up(B, TB)
    nT = Bp // TB

    Xp = jnp.pad(Xs, ((0, Bp - B), (0, 0)))
    Zp = jnp.pad(Zs, ((0, Mp - M), (0, 0)))
    ap = jnp.pad(alpha, ((0, Mp - M), (0, 0)))
    Wp = jnp.pad(W, ((0, 0), (0, Mp - M), (0, Mp - M)))
    scal = jnp.stack([kvar, kvar]).reshape(1, 2).astype(Xs.dtype)
    gmp = jnp.pad(gm, ((0, Bp - B), (0, 0)))
    gvp = jnp.pad(gv, ((0, Bp - B), (0, 0)))        # (Bp, Do)

    in_specs = [
            pl.BlockSpec((TB, Dx), lambda d, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Dx), lambda d, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Do), lambda d, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Mp), lambda d, i: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda d, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, Do), lambda d, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Do), lambda d, i: (i, 0),
                         memory_space=pltpu.VMEM),
    ]
    inputs = [Xp, Zp, ap, Wp, scal, gmp, gvp]
    if Kp is not None:
        # the forward's batch padding (its own TB) may differ from the
        # backward's; normalize to this call's Bp
        Kb = Kp[:B]
        Kb = jnp.pad(Kb, ((0, Bp - B), (0, 0)))
        in_specs.append(pl.BlockSpec((TB, Mp), lambda d, i: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(Kb)

    outs = pl.pallas_call(
        _bwd_kernel_sg if Kp is not None else _bwd_kernel,
        grid=(Do, nT),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, TB, Dx), lambda d, i: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Dx), lambda d, i: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Do), lambda d, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Mp), lambda d, i: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Do, Bp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((Do, Mp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((Mp, Do), Xs.dtype),
            jax.ShapeDtypeStruct((Do, Mp, Mp), Xs.dtype),
        ),
        interpret=interpret,
    )(*inputs)
    dXt, dZt, dalpha, dW = outs
    dXs = jnp.sum(dXt, axis=0)[:B]
    dZs = jnp.sum(dZt, axis=0)[:M]
    return dXs, dZs, dalpha[:M], dW[:, :M, :M]


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_conditional_saved(Xs, Zs, alpha, W, kvar, kdiag,
                            interpret=False):
    """save_gram variant of :func:`fused_conditional` (round-1 VERDICT
    next-step #7): the forward emits the gram as a residual and the
    backward streams it from HBM instead of recomputing in-kernel —
    removing exactly the recompute the round-3 end-to-end analysis
    blamed, at the cost of one extra (B, Mp) HBM write + Do reads.
    Primal values are identical to fused_conditional."""
    return _fused_forward(Xs, Zs, alpha, W, kvar, kdiag,
                          interpret=interpret)


def _fcs_fwd(Xs, Zs, alpha, W, kvar, kdiag, interpret):
    mean, var, K = _fused_forward(Xs, Zs, alpha, W, kvar, kdiag,
                                  interpret=interpret, save_gram=True)
    return (mean, var), (Xs, Zs, alpha, W, kvar, kdiag, mean, var, K)


def _fcs_bwd(interpret, res, cot):
    Xs, Zs, alpha, W, kvar, kdiag, mean, var, K = res
    gm, gv = cot
    gv_eff = jnp.where(var > 0.0, gv, 0.0)
    dkdiag = jnp.sum(gv_eff)
    dkvar = (jnp.sum(gm * mean)
             + 2.0 * jnp.sum(gv_eff * (var - kdiag))) / kvar
    dXs, dZs, dalpha, dW = _fused_backward(
        Xs, Zs, alpha, W, kvar, gm, gv_eff, interpret=interpret, Kp=K)
    return (dXs, dZs, dalpha, dW,
            dkvar.astype(jnp.asarray(kvar).dtype),
            dkdiag.astype(jnp.asarray(kdiag).dtype))


fused_conditional_saved.defvjp(_fcs_fwd, _fcs_bwd)


def fused_conditional_reference(Xs, Zs, alpha, W, kvar, kdiag):
    """Plain-jnp reference of the same math (for parity tests and as the
    XLA fallback)."""
    d = (Xs[:, None, :] - Zs[None, :, :])
    K = kvar * jnp.exp(-0.5 * jnp.sum(d * d, -1))    # (B, M)
    mean = K @ alpha
    T = jnp.einsum("bm,dmn->dbn", K, W)
    var = kdiag + jnp.einsum("bm,dbm->bd", K, T)
    return mean, jnp.maximum(var, 0.0)
