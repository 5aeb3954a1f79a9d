"""Pallas TPU kernel: fully fused sparse-GP conditional (diag), staged.

The hot path of every DGP layer (reference layers.py:178-219) in the
precomputed staged formulation (models/layers.py conditional_ND,
'inverse' mode) is, per batch point x:

    k(x)    = kvar * exp(-0.5 ||x/ls - z/ls||^2)        (M,)
    g(x)    = LiT^T k(x)          (LiT = Lu^{-T}, M x M) (M,)
    mean(x) = g(x)^T alpha                               (Do,)
    var_d(x)= kdiag + g(x)^T W_d g(x)                    (Do,)

with alpha = Lu^{-1} q_mu and W_d = Lu^{-1} SK_d Lu^{-T} (white mode:
alpha = q_mu, W_d = SK_d — either way the caller passes LiT = Lu^{-T}).

STAGED, not P-form (round-2 numerics): the previous kernel contract
consumed alpha = P q_mu, W = P SK P with the explicit P = Kuu^{-1}.
That carries cond(Kuu)^2 dynamic range in one object — measured on a
v5e: training through the fused final layer tracked XLA for ~50 Adam
steps and then diverged (loss 27023 vs 2142 at step 300, M=256) as the
optimizer sharpened Kuu, exactly the failure mode that moved the XLA
'inverse' path to the staged form (G = Li Kuf).  Staging the kernel the
same way — one extra (TB, Mp) x (Mp, Mp) MXU matmul per tile —
keeps every intermediate at cond(Lu) = cond(Kuu)^{1/2} scale.

Unfused, XLA materializes Kuf (M, B), G (M, B) and the (Do, M, B)
product in HBM — at large M that traffic is comparable to the chip's
entire HBM bandwidth budget.  This kernel tiles the batch, computes the
gram tile on the MXU, stages it through LiT and keeps G in VMEM through
the mean/variance contractions: one read of X, one write of mean/var.

Layout: the forward grid is (num_batch_tiles, Do) with d fastest — the
gram/staging runs once per batch tile (at d == 0, persisting in a VMEM
scratch across the d sweep) while each d streams only its own W_d
(Mp, Mp) block through VMEM (pallas pipelines the next W_{d+1} DMA
behind the current row automatically).  Padding of M to the 128 lane
width is free because LiT/alpha/W are zero-padded (padded gram columns
cannot contribute).

All in-kernel dots run at HIGHEST matmul precision: Mosaic lowers f32
dots to bf16-class MXU passes by default, while XLA's f32 dots on v5e
are full precision (measured bitwise equal to HIGHEST).  The bf16-class
gram cross-term alone cost ~1e-2 absolute mean error (exp() amplifies
distance error; max rel 12.9 measured) — see PERF.md round-2 pallas
numerics.

The backward pass is a second fused kernel over the transposed grid
(Do, num_batch_tiles), accumulating dW_d / dZ_d / dalpha / dLiT in
revisited output blocks (the batch tile is the fastest grid axis, so
those blocks stay VMEM-resident across the row) and emitting per-d dX
partials reduced outside.  Wrapped in jax.custom_vjp.  The save-gram
variant additionally emits the gram K as a forward residual and streams
it back in the backward instead of recomputing (round-1 VERDICT
next-step #7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST


def _round_up(x, m):
    return (x + m - 1) // m * m


def pallas_profitable(M, Do, B):
    """Shape gate for ``use_pallas='auto'``.  With training-grade
    numerics (HIGHEST in-kernel dots + the staged contract) the fused
    kernel loses to XLA end-to-end at every shape measured (0.62-0.65x,
    scripts/bench_large_m.py — the custom-VJP call is a fusion barrier
    and XLA reuses the gram as a saved residual), which is why
    ``config.use_pallas`` defaults to False.  Isolated
    (scripts/probe_crossover.py with the corrected unique-dispatch +
    readback-sync timing, PERF.md round-2): M=128/M=256 sit *within
    tunnel noise* of XLA (0.92-1.73x across repeat runs), M=512 is a
    clear loss (0.38-0.54x) — so the gate now stops at 256.  'auto'
    remains for standalone conditional workloads in the
    within-noise-or-better band.  (Kernel hard cap is M=512 anyway:
    the staged backward keeps four (Mp, Mp) blocks (W_d, LiT, dW_d,
    dLiT) VMEM-resident, which passes ~16 MB at M = 1024.)"""
    return Do <= 2 and 128 <= M <= 256 and B >= 2048


def _tile_b(Mp, bwd=False):
    """Batch tile: shrink when the (Mp, Mp) blocks get big (VMEM ~16MB).
    The backward holds W_d, LiT AND the accumulating dW_d/dLiT blocks
    (4 x Mp^2) plus five (TB, Mp) intermediates, so it tiles smaller at
    large M."""
    if Mp <= 512:
        return 512 if not bwd else 256
    return 128 if bwd else 256


def _acc_t(dtype):
    return jnp.float32 if dtype == jnp.bfloat16 else dtype


def _gram_tile(x, z, kvar, at):
    """kvar * exp(-0.5 ||x - z||^2) on the MXU, (TB, Mp)."""
    cross = jax.lax.dot_general(x, z, (((1,), (1,)), ((), ())),
                                preferred_element_type=at, precision=_PREC)
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


def _fwd_body(d, x, z, lit_ref, alpha_ref, w_ref, kvar, kdiag,
              mean_ref, var_ref, g_scr, k_ref=None):
    """Shared forward step: at d == 0 compute the staged tile
    G = K LiT once into the VMEM scratch (it persists across the fast
    d axis) and emit the mean; every d accumulates its variance
    column.  With ``k_ref`` (the save_gram variant) the gram tile is
    additionally written to HBM — and read back so the staging dot
    consumes exactly the stored values the backward will see — instead
    of being recomputed there (round-1 VERDICT next-step #7)."""
    at = _acc_t(x.dtype)

    @pl.when(d == 0)
    def _():
        K = _gram_tile(x, z, kvar, at)
        if k_ref is not None:
            k_ref[:] = K.astype(k_ref.dtype)
            K = k_ref[:].astype(at)
        g_scr[:] = jnp.dot(K, lit_ref[:], preferred_element_type=at,
                           precision=_PREC)
        mean_ref[:] = jnp.dot(g_scr[:], alpha_ref[:],
                              preferred_element_type=at,
                              precision=_PREC).astype(mean_ref.dtype)
        var_ref[:] = jnp.zeros_like(var_ref)

    G = g_scr[:]
    T = jnp.dot(G, w_ref[0], preferred_element_type=at, precision=_PREC)
    var_d = jnp.maximum(kdiag + jnp.sum(G * T, axis=1), 0.0)
    onehot = _onehot_lane(d, var_ref.shape[1], var_d.dtype)
    var_ref[:] = var_ref[:] + (var_d[:, None] * onehot).astype(
        var_ref.dtype)


def _fwd_kernel(xs_ref, zs_ref, lit_ref, alpha_ref, w_ref, scal_ref,
                mean_ref, var_ref, g_scr):
    # grid (num_batch_tiles, Do): d is the fast axis, so the mean/var
    # output blocks for batch tile i stay VMEM-resident across the d
    # sweep while W_d streams through.
    d = pl.program_id(1)
    _fwd_body(d, xs_ref[:], zs_ref[:], lit_ref, alpha_ref, w_ref,
              scal_ref[0, 0], scal_ref[0, 1], mean_ref, var_ref, g_scr)


def _fwd_kernel_sg(xs_ref, zs_ref, lit_ref, alpha_ref, w_ref, scal_ref,
                   mean_ref, var_ref, k_ref, g_scr):
    d = pl.program_id(1)
    _fwd_body(d, xs_ref[:], zs_ref[:], lit_ref, alpha_ref, w_ref,
              scal_ref[0, 0], scal_ref[0, 1], mean_ref, var_ref, g_scr,
              k_ref=k_ref)


def _fused_forward(Xs, Zs, LiT, alpha, W, kvar, kdiag, interpret=False,
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
    lp = jnp.pad(LiT, ((0, Mp - M), (0, Mp - M)))
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
            pl.BlockSpec((Mp, Mp), lambda i, d: (0, 0),
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
    )(Xp, Zp, lp, ap, Wp, scal)
    if save_gram:
        mean, var, K = outs
        return mean[:B], var[:B], K
    mean, var = outs
    return mean[:B], var[:B]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel_sg(xs_ref, zs_ref, lit_ref, alpha_ref, w_ref, scal_ref,
                   gm_ref, gv_ref, k_ref,
                   dx_ref, dz_ref, dlit_ref, dalpha_ref, dw_ref):
    """save_gram backward: consumes the forward-saved gram tile from HBM
    instead of recomputing it on the MXU+VPU (trades one (B, Mp) HBM
    stream per d for the in-kernel gram recompute)."""
    _bwd_body(pl.program_id(0), pl.program_id(1),
              xs_ref, zs_ref, lit_ref, alpha_ref, w_ref, gm_ref, gv_ref,
              k_ref[:].astype(_acc_t(xs_ref.dtype)),
              dx_ref, dz_ref, dlit_ref, dalpha_ref, dw_ref)


def _bwd_kernel(xs_ref, zs_ref, lit_ref, alpha_ref, w_ref, scal_ref,
                gm_ref, gv_ref,
                dx_ref, dz_ref, dlit_ref, dalpha_ref, dw_ref):
    """Backward step for one (d, batch-tile) cell.  ``gv`` arrives
    already clamp-masked (done in jnp from the saved forward outputs),
    and the scalar grads (dkvar, dkdiag) are reconstructed outside from
    (mean, var) — Mosaic cannot lower full-to-scalar reductions, so the
    kernel only emits tensor-shaped results.  dW_d / dZ_d / dalpha /
    dLiT accumulate in-place across the batch-tile axis (their blocks
    stay VMEM-resident within a grid row)."""
    d = pl.program_id(0)
    i = pl.program_id(1)
    at = _acc_t(xs_ref.dtype)
    K = _gram_tile(xs_ref[:], zs_ref[:], scal_ref[0, 0], at)  # (TB, Mp)
    _bwd_body(d, i, xs_ref, zs_ref, lit_ref, alpha_ref, w_ref,
              gm_ref, gv_ref, K, dx_ref, dz_ref, dlit_ref, dalpha_ref,
              dw_ref)


def _bwd_body(d, i, xs_ref, zs_ref, lit_ref, alpha_ref, w_ref,
              gm_ref, gv_ref, K,
              dx_ref, dz_ref, dlit_ref, dalpha_ref, dw_ref):
    x = xs_ref[:]
    z = zs_ref[:]
    at = _acc_t(x.dtype)
    gm = gm_ref[:]                                  # (TB, Do)
    # column d of the (pre-masked) variance cotangent, via a one-hot
    # contraction (no dynamic lane indexing on TPU)
    onehot = _onehot_lane(d, gv_ref.shape[1], gv_ref.dtype)
    g_d = jnp.sum(gv_ref[:] * onehot, axis=1)       # (TB,)

    G = jnp.dot(K, lit_ref[:], preferred_element_type=at,
                precision=_PREC)                    # (TB, Mp)
    T = jnp.dot(G, w_ref[0], preferred_element_type=at, precision=_PREC)
    dG = 2.0 * g_d[:, None] * T
    # the mean term enters dG exactly once (on the d == 0 row)
    dG = dG + jnp.where(
        d == 0,
        jax.lax.dot_general(gm, alpha_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=at, precision=_PREC),
        jnp.zeros_like(dG))

    @pl.when(jnp.logical_and(d == 0, i == 0))
    def _():
        dalpha_ref[:] = jnp.zeros_like(dalpha_ref)
        dlit_ref[:] = jnp.zeros_like(dlit_ref)

    @pl.when(d == 0)
    def _():
        dalpha_ref[:] = (dalpha_ref[:]
                         + jnp.dot(G.T, gm, preferred_element_type=at,
                                   precision=_PREC
                                   ).astype(dalpha_ref.dtype))

    # dLiT = sum_tiles sum_d K^T dG
    dlit_ref[:] = (dlit_ref[:]
                   + jnp.dot(K.T, dG, preferred_element_type=at,
                             precision=_PREC).astype(dlit_ref.dtype))

    # dW_d = sum_tiles G^T diag(g_d) G
    @pl.when(i == 0)
    def _():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])
        dz_ref[0] = jnp.zeros_like(dz_ref[0])

    dw_ref[0] = (dw_ref[0]
                 + jnp.dot((G * g_d[:, None]).T, G,
                           preferred_element_type=at,
                           precision=_PREC).astype(dw_ref.dtype))

    # dK = dG LiT^T, then chain through K = kvar * exp(-0.5 * dist)
    dK = jax.lax.dot_general(dG, lit_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=at, precision=_PREC)
    Gd = dK * (-0.5) * K                             # dL/d dist, (TB, Mp)
    rs = jnp.sum(Gd, axis=1, keepdims=True)          # (TB, 1)
    cs = jnp.sum(Gd, axis=0, keepdims=True)          # (1, Mp)
    dx_ref[0] = (2.0 * (x * rs
                        - jnp.dot(Gd, z, preferred_element_type=at,
                                  precision=_PREC))
                 ).astype(dx_ref.dtype)
    dz_ref[0] = (dz_ref[0]
                 + 2.0 * (z * cs.T
                          - jnp.dot(Gd.T, x, preferred_element_type=at,
                                    precision=_PREC)
                          ).astype(dz_ref.dtype))


def _fused_backward(Xs, Zs, LiT, alpha, W, kvar, gm, gv,
                    interpret=False, Kp=None):
    """gm/gv are the (already clamp-masked) output cotangents; returns
    (dXs, dZs, dLiT, dalpha, dW).  Scalar grads are reconstructed by the
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
    lp = jnp.pad(LiT, ((0, Mp - M), (0, Mp - M)))
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
            pl.BlockSpec((Mp, Mp), lambda d, i: (0, 0),
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
    inputs = [Xp, Zp, lp, ap, Wp, scal, gmp, gvp]
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
            pl.BlockSpec((Mp, Mp), lambda d, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Do), lambda d, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Mp), lambda d, i: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Do, Bp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((Do, Mp, Dx), Xs.dtype),
            jax.ShapeDtypeStruct((Mp, Mp), Xs.dtype),
            jax.ShapeDtypeStruct((Mp, Do), Xs.dtype),
            jax.ShapeDtypeStruct((Do, Mp, Mp), Xs.dtype),
        ),
        interpret=interpret,
    )(*inputs)
    dXt, dZt, dLiT, dalpha, dW = outs
    dXs = jnp.sum(dXt, axis=0)[:B]
    dZs = jnp.sum(dZt, axis=0)[:M]
    return dXs, dZs, dLiT[:M, :M], dalpha[:M], dW[:, :M, :M]


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_conditional(Xs, Zs, LiT, alpha, W, kvar, kdiag, interpret=False):
    """mean (B, Do), var (B, Do) of the fused staged sparse conditional.

    Xs, Zs: lengthscale-scaled inputs/inducing points; LiT = Lu^{-T}
    (M, M) staging factor (identity recovers the unstaged math);
    alpha (M, Do); W (Do, M, M); kvar/kdiag scalars.
    """
    return _fused_forward(Xs, Zs, LiT, alpha, W, kvar, kdiag,
                          interpret=interpret)


def _fc_fwd(Xs, Zs, LiT, alpha, W, kvar, kdiag, interpret):
    out = _fused_forward(Xs, Zs, LiT, alpha, W, kvar, kdiag,
                         interpret=interpret)
    mean, var = out
    return out, (Xs, Zs, LiT, alpha, W, kvar, kdiag, mean, var)


def _scalar_grads(gm, gv_eff, mean, var, kvar, kdiag):
    """dkvar/dkdiag from the saved forward outputs (Mosaic cannot lower
    full-to-scalar reductions in-kernel): mean is linear and
    (var - kdiag) quadratic in K proportional to kvar."""
    dkdiag = jnp.sum(gv_eff)
    dkvar = (jnp.sum(gm * mean)
             + 2.0 * jnp.sum(gv_eff * (var - kdiag))) / kvar
    return dkvar, dkdiag


def _fc_bwd(interpret, res, cot):
    Xs, Zs, LiT, alpha, W, kvar, kdiag, mean, var = res
    gm, gv = cot
    # clamp VJP: entries where the forward clamped var at 0 get no
    # variance cotangent
    gv_eff = jnp.where(var > 0.0, gv, 0.0)
    dkvar, dkdiag = _scalar_grads(gm, gv_eff, mean, var, kvar, kdiag)
    dXs, dZs, dLiT, dalpha, dW = _fused_backward(
        Xs, Zs, LiT, alpha, W, kvar, gm, gv_eff, interpret=interpret)
    return (dXs, dZs, dLiT, dalpha, dW,
            dkvar.astype(jnp.asarray(kvar).dtype),
            dkdiag.astype(jnp.asarray(kdiag).dtype))


fused_conditional.defvjp(_fc_fwd, _fc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_conditional_saved(Xs, Zs, LiT, alpha, W, kvar, kdiag,
                            interpret=False):
    """save_gram variant of :func:`fused_conditional` (round-1 VERDICT
    next-step #7): the forward emits the gram K as a residual and the
    backward streams it from HBM instead of recomputing in-kernel, at
    the cost of one extra (B, Mp) HBM write + Do reads.  Primal values
    are identical to fused_conditional."""
    return _fused_forward(Xs, Zs, LiT, alpha, W, kvar, kdiag,
                          interpret=interpret)


def _fcs_fwd(Xs, Zs, LiT, alpha, W, kvar, kdiag, interpret):
    mean, var, K = _fused_forward(Xs, Zs, LiT, alpha, W, kvar, kdiag,
                                  interpret=interpret, save_gram=True)
    return (mean, var), (Xs, Zs, LiT, alpha, W, kvar, kdiag, mean, var, K)


def _fcs_bwd(interpret, res, cot):
    Xs, Zs, LiT, alpha, W, kvar, kdiag, mean, var, K = res
    gm, gv = cot
    gv_eff = jnp.where(var > 0.0, gv, 0.0)
    dkvar, dkdiag = _scalar_grads(gm, gv_eff, mean, var, kvar, kdiag)
    dXs, dZs, dLiT, dalpha, dW = _fused_backward(
        Xs, Zs, LiT, alpha, W, kvar, gm, gv_eff, interpret=interpret,
        Kp=K)
    return (dXs, dZs, dLiT, dalpha, dW,
            dkvar.astype(jnp.asarray(kvar).dtype),
            dkdiag.astype(jnp.asarray(kdiag).dtype))


fused_conditional_saved.defvjp(_fcs_fwd, _fcs_bwd)


def fused_conditional_reference(Xs, Zs, LiT, alpha, W, kvar, kdiag):
    """Plain-jnp reference of the same math (for parity tests and as the
    XLA fallback)."""
    d = (Xs[:, None, :] - Zs[None, :, :])
    K = kvar * jnp.exp(-0.5 * jnp.sum(d * d, -1))    # (B, M)
    G = K @ LiT                                       # (B, M)
    mean = G @ alpha
    T = jnp.einsum("bm,dmn->dbn", G, W)
    var = kdiag + jnp.einsum("bm,dbm->bd", G, T)
    return mean, jnp.maximum(var, 0.0)
