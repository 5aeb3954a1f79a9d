"""Pallas TPU kernel: fused psi2 data-sum (zero (N, M, M) HBM traffic).

The RBF psi2 statistic (reference consumes it via gpflow.expectations at
/root/reference/doubly_stochastic_dgp/layers.py:415-417) is

  psi2[a, b] = sum_n exp( logdet_n + log_zz[a, b]
                          + min(U[n,a] + V[n,b]
                                - sum_d w[n,d] Z[a,d] Z[b,d], 0) )

after the rank-separated staging of ops/psi_stats.py (U/V are the
(N, M) one-sided quadratic halves, w >= 0 the Gaussian-product inverse
widths, the min(.., 0) the f32 cancellation clamp).  The XLA path must
materialize an (N, M, M) intermediate to HBM between the batched R
matmul and the fused exp+reduce — measured on v5e at N=8192, M=256
(PERF.md round-4): the whole op runs at ~81% of that one-roundtrip
HBM bound (6.4 ms fwd / 20 ms fwd+bwd), i.e. the op IS its memory
traffic, and it is >50% of a compute-bound collapsed training step.

This kernel streams n-blocks through VMEM, forms the (BN, M, M) block,
exponentiates and reduces it in-place, and accumulates the (M, M)
output across sequential grid steps — HBM traffic drops from
O(N * M^2) to O(N * M), a ~M/2-fold reduction.  The backward pass is a
second kernel over the same blocks that recomputes the exponential
(cheaper than storing (N, M, M) residuals — which would reintroduce
exactly the HBM traffic the forward removed) and emits closed-form
gU/gV/gw/glogdet/gZ.  Two backward variants ship (round-5,
scripts/sweep_psi2_bwd.py): per-d unrolled VPU FMA chains (wins at
D=1) and MXU contractions at HIGHEST precision that make the op count
nearly D-independent (wins from D=2 up); the shared `pre` recompute
likewise flips from the VPU chain to a batched MXU dot at D >= 5.
Every dot in every kernel runs at HIGHEST precision — no bf16-class
passes, preserving psi_statistics' precision contract.  The
production route is XLA-forward + Pallas-backward; the all-Pallas
forward is faster in isolation at D >= 2 but measured SLOWER when
assembled with the backward in one program, see _FWD_PALLAS_*.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Per-grid-step (BN, M, M) working-set budget.  The scoped-VMEM default
# is 16 MB/core and Mosaic holds ~2 live (BN, M, M) temporaries (pre and
# e) plus double-buffered input tiles, so cap the 3-D intermediate at
# ~2 MB and derive BN from M (sublane floor 8); _VMEM_LIMIT gives the
# compiler headroom above the 16 MB scoped default (v5e has 128 MB).
_BLOCK_BYTES = 2 * 1024 * 1024
_VMEM_LIMIT = 48 * 1024 * 1024
_MAX_M = 512          # (M, M) output + (BN, M, M) block must fit VMEM
_MAX_D = 32           # unrolled d-loop; larger D -> XLA path


def _block_rows(M):
    bn = _BLOCK_BYTES // (M * M * 4)
    return max(8, min(512, bn // 8 * 8))


def _round_up(x, m):
    return (x + m - 1) // m * m


# The R recompute (pre = U + V - sum_d w_nd Z_ad Z_bd) is the only
# D-scaling term left in the kernels.  Below the threshold it is the
# unrolled VPU FMA chain (2 ops/element per d, full f32); at or above
# it, one batched MXU dot per block (HIGHEST precision) makes it
# nearly D-independent.  Measured on v5e (N=8192, M=256, fwd+bwd ms
# through the MXU backward, VPU pre -> MXU pre): D=2 12.82 -> 14.93
# (the backward's own MXU dots contend, VPU pre is free), D=4 15.32 ->
# 15.90 (wash), D=6 20.11 -> 17.91, D=8 24.63 -> 18.97 — crossover
# between 4 and 6, gate at 5.  (scripts/sweep_psi2_bwd.py
# --pre-mxu-min-d, PERF.md round-5.)
_PRE_MXU_MIN_D = 5


def _compute_pre(U, V, w, Z):
    """(BN, M, M) clamp-argument recompute, shared by every kernel."""
    D = Z.shape[1]
    pre = U[:, :, None] + V[:, None, :]
    if D < _PRE_MXU_MIN_D:
        for d in range(D):                        # static unroll (VPU)
            zd_row = Z[:, d:d + 1].T              # (1, M) — slices only:
            # Mosaic can't lower integer gathers on the lane axis
            pre = pre - ((w[:, d:d + 1] * zd_row)[:, :, None]
                         * zd_row[None, :, :])
        return pre
    hi = jax.lax.Precision.HIGHEST
    G = w[:, None, :] * Z[None, :, :]             # (BN, M, D)
    Zb = jnp.broadcast_to(Z, (G.shape[0],) + Z.shape)
    R = jax.lax.dot_general(                      # (BN, M, M), batch BN
        G, Zb, (((2,), (2,)), ((0,), (0,))),
        precision=hi, preferred_element_type=G.dtype)
    return pre - R


def _fwd_kernel(U_ref, V_ref, w_ref, logdet_ref, Z_ref, out_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    U = U_ref[:]                                  # (BN, M)
    V = V_ref[:]                                  # (BN, M)
    w = w_ref[:]                                  # (BN, D)
    Z = Z_ref[:]                                  # (M, D)
    pre = _compute_pre(U, V, w, Z)                # (BN, M, M)
    e = jnp.exp(jnp.minimum(pre, 0.0)
                + logdet_ref[:][:, :, None])
    out_ref[:, :] += jnp.sum(e, axis=0)


def _bwd_kernel(U_ref, V_ref, w_ref, logdet_ref, Z_ref, g_ref,
                gU_ref, gV_ref, gw_ref, glogdet_ref, gZ_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        gZ_ref[:] = jnp.zeros_like(gZ_ref)

    U = U_ref[:]
    V = V_ref[:]
    w = w_ref[:]
    Z = Z_ref[:]
    g = g_ref[:]                                  # (M, M)
    D = Z.shape[1]
    pre = _compute_pre(U, V, w, Z)
    e = jnp.exp(jnp.minimum(pre, 0.0)
                + logdet_ref[:][:, :, None])
    ge = g[None, :, :] * e                        # (BN, M, M)
    # min-clamp gate: inactive (pre >= 0) elements contribute to
    # glogdet but not to the quadratic-side gradients.  Tie convention
    # at exact pre == 0: this gate routes the whole cotangent to the
    # clamp (gradient 0), while jnp.minimum's VJP on the XLA/reference
    # route splits it 50/50 — a measure-zero discrepancy (clean-data
    # psi2 sits strictly below 0 except the exact diagonal-at-mu==z
    # case), accepted for the branch-free kernel form.
    P = jnp.where(pre < 0.0, ge, 0.0)
    gU_ref[:] = jnp.sum(P, axis=2)
    gV_ref[:] = jnp.sum(P, axis=1)
    # staged reduce: a single sum over axes (1, 2) SIGABRTs the Mosaic
    # compiler (measured on v5e, jax 0.9/libtpu 2026-08) — two
    # single-axis reduces lower fine
    glogdet_ref[:] = jnp.sum(jnp.sum(ge, axis=2), axis=1, keepdims=True)
    gw_cols = []
    gz_cols = []
    for d in range(D):
        zd_row = Z[:, d:d + 1].T                           # (1, M)
        s_a = jnp.sum(P * zd_row[None, :, :], axis=2)      # (BN, M) by a
        s_b = jnp.sum(P * zd_row[:, :, None], axis=1)      # (BN, M) by b
        gw_cols.append(-jnp.sum(s_a * zd_row, axis=1,
                                keepdims=True))            # (BN, 1)
        gz_cols.append(-jnp.sum(w[:, d:d + 1] * (s_a + s_b),
                                axis=0)[:, None])          # (M, 1)
    gw_ref[:] = jnp.concatenate(gw_cols, axis=1)
    gZ_ref[:, :] += jnp.concatenate(gz_cols, axis=1)


def _bwd_kernel_mxu(U_ref, V_ref, w_ref, logdet_ref, Z_ref, g_ref,
                    gU_ref, gV_ref, gw_ref, glogdet_ref, gZ_ref):
    """MXU-contraction backward (round-4 VERDICT next #3): the VPU
    variant's per-d unrolled chains cost ~(19 + 6(D-1)) ops/element,
    which loses to XLA at D >= 4.  Here every d-contraction other than
    the (unavoidable) ``pre`` recompute is one MXU matmul at HIGHEST
    precision, making the op count ~(11 + 2D) — D-dependent only
    through the 2-ops/element recompute chain:

      S_a[(n,a), d] = sum_b P[n,a,b] Z[b,d]          (K=M dot)
        -> gw[n,d]  = -sum_a S_a Z[a,d]              (tiny VPU reduce)
        -> r1[a,d]  = -sum_n w[n,d] S_a              (tiny VPU reduce)
      r2[b,d] = -sum_{(n,a)} P[(n,a), b] w[n,d] Z[a,d]
              = -(P_flat^T @ (w x Z))                (K=BN*M dot)
      gZ += r1 + r2   (accumulated across grid steps)

    The (BN, M, M) block is only ever reshaped by collapsing LEADING
    dims ((BN, M, M) -> (BN*M, M)) — the minormost (lane) dim is
    untouched, the reshape Mosaic supports."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        gZ_ref[:] = jnp.zeros_like(gZ_ref)

    U = U_ref[:]
    V = V_ref[:]
    w = w_ref[:]
    Z = Z_ref[:]
    g = g_ref[:]                                  # (M, M)
    BN, M = U.shape
    D = Z.shape[1]
    pre = _compute_pre(U, V, w, Z)
    e = jnp.exp(jnp.minimum(pre, 0.0)
                + logdet_ref[:][:, :, None])
    ge = g[None, :, :] * e                        # (BN, M, M)
    # min-clamp gate (same tie convention as the VPU kernel)
    P = jnp.where(pre < 0.0, ge, 0.0)
    gU_ref[:] = jnp.sum(P, axis=2)
    gV_ref[:] = jnp.sum(P, axis=1)
    glogdet_ref[:] = jnp.sum(jnp.sum(ge, axis=2), axis=1, keepdims=True)

    hi = jax.lax.Precision.HIGHEST
    Pf = P.reshape(BN * M, M)                     # rows (n, a), cols b
    S_a = jax.lax.dot_general(
        Pf, Z, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=Pf.dtype)   # (BN*M, D)
    S_a3 = S_a.reshape(BN, M, D)
    gw_ref[:] = -jnp.sum(S_a3 * Z[None, :, :], axis=1)   # (BN, D)
    r1 = jnp.sum(S_a3 * w[:, None, :], axis=0)           # (M, D)
    WZ = (w[:, None, :] * Z[None, :, :]).reshape(BN * M, D)
    r2 = jax.lax.dot_general(
        Pf, WZ, (((0,), (0,)), ((), ())),
        precision=hi, preferred_element_type=Pf.dtype)   # (M, D)
    gZ_ref[:, :] += -(r1 + r2)


def _pad_n(arrs, N, BN):
    Np = _round_up(max(N, BN), BN)
    if Np == N:
        return [a for a, _ in arrs], N
    out = []
    for a, fill in arrs:
        pad = [(0, Np - N)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad, constant_values=fill))
    return out, Np


def _psi2_core_fwd_call(U, V, w, logdet, Z, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = U.shape
    D = Z.shape[1]
    BN = _block_rows(M)
    # padded rows carry logdet = -inf-ish -> exp underflows to exactly 0
    (U, V, w, logdet), Np = _pad_n(
        [(U, 0.0), (V, 0.0), (w, 0.0), (logdet, -1e30)], N, BN)
    grid = (Np // BN,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BN, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, M), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, M), U.dtype),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT))),
    )(U, V, w, logdet, Z)


# Backward-kernel selection thresholds (v5e, N=8192,
# scripts/sweep_psi2_bwd.py, PERF.md round-5):
# - M <= 384: the VPU kernel's unrolled per-d chains win only at D=1
#   (fwd+bwd 8.72 vs 11.29 ms at M=256); from D=2 up the
#   MXU-contraction kernel is strictly faster (12.82/14.32/15.32/
#   20.11 ms at D=2/3/4/6 vs 14.27/19.70/25.08/37.23).
# - M = 512 (the VMEM-pressure regime: the MXU variant's flattened
#   (BN*M, M) operands thrash at 8 MB+ per temporary): the MXU fixed
#   cost flips the small-D verdict — VPU wins D=2 (33.97 vs 46.12),
#   MXU wins D=8 (75.4 vs 100.4); measured slopes put the crossover
#   at D ~ 4.  NB at this shape XLA fwd+bwd cannot run AT ALL on one
#   chip (its scan-saved (N, M, M) residuals need ~16.5 GB > 15.75 GB
#   HBM) — the recompute backward is the memory ENABLER, whichever
#   variant is picked.
_BWD_MXU_MIN_D = 2
_BWD_MXU_MIN_D_LARGE_M = 4
_BWD_LARGE_M = 384


def _bwd_impl_auto(M, D):
    if M > _BWD_LARGE_M:
        return "mxu" if D >= _BWD_MXU_MIN_D_LARGE_M else "vpu"
    return "mxu" if D >= _BWD_MXU_MIN_D else "vpu"


def _psi2_core_bwd_call(U, V, w, logdet, Z, g, interpret=False,
                        bwd_impl=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = U.shape
    D = Z.shape[1]
    BN = _block_rows(M)
    (U, V, w, logdet), Np = _pad_n(
        [(U, 0.0), (V, 0.0), (w, 0.0), (logdet, -1e30)], N, BN)
    grid = (Np // BN,)
    blk = lambda cols: pl.BlockSpec((BN, cols), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    if bwd_impl is None:
        bwd_impl = _bwd_impl_auto(M, D)
    kernel = _bwd_kernel_mxu if bwd_impl == "mxu" else _bwd_kernel
    gU, gV, gw, glogdet, gZ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(M), blk(M), blk(D), blk(1),
                  pl.BlockSpec((M, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((M, M), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[blk(M), blk(M), blk(D), blk(1),
                   pl.BlockSpec((M, D), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Np, M), U.dtype),
                   jax.ShapeDtypeStruct((Np, M), U.dtype),
                   jax.ShapeDtypeStruct((Np, D), U.dtype),
                   jax.ShapeDtypeStruct((Np, 1), U.dtype),
                   jax.ShapeDtypeStruct((M, D), U.dtype)],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT))),
    )(U, V, w, logdet, Z, g)
    return gU[:N], gV[:N], gw[:N], glogdet[:N], gZ


def psi2_core_pallas_fwd(U, V, w, logdet, Z, interpret=False):
    """The all-Pallas forward (no VJP) — kept for the on-chip A/B
    record and parity tests; NOT on the production route.  Measured on
    v5e at N=8192, M=256 (PERF.md round-4): XLA's fused fwd beats it at
    D=1 (1.68 vs 3.18 ms) because the D=1 R term is an outer product
    XLA fuses straight into the exp+reduce loop with no (N, M, M)
    materialization — the backward is where XLA can't avoid the
    traffic (residual saves), so only the backward ships as a kernel
    (see psi2_core)."""
    return _psi2_core_fwd_call(U, V, w, logdet, Z, interpret=interpret)


def _xla_blocked_core(U, V, w, logdet, Z):
    """Blocked XLA evaluation of the psi2_core contract: lax.scan over
    row blocks, the same slice-based d-loop arithmetic as the kernel so
    XLA's fusion sees the identical dataflow (at small D the R term is
    an outer-product chain it fuses into the exp+reduce — measured at
    the HBM-free rate)."""
    N, M = U.shape
    D = Z.shape[1]

    def block(U_b, V_b, w_b, logdet_b):
        pre = U_b[:, :, None] + V_b[:, None, :]
        for d in range(D):
            zd_row = Z[:, d:d + 1].T                       # (1, M)
            pre = pre - ((w_b[:, d:d + 1] * zd_row)[:, :, None]
                         * zd_row[None, :, :])
        e = jnp.exp(jnp.minimum(pre, 0.0) + logdet_b[:, :, None])
        return jnp.sum(e, axis=0)

    block_rows = max(128, (8192 * 100 * 100) // (M * M) // 8 * 8)
    if N <= block_rows:
        return block(U, V, w, logdet)
    (U, V, w, logdet), Np = _pad_n(
        [(U, 0.0), (V, 0.0), (w, 0.0), (logdet, -1e30)], N,
        block_rows)
    args = tuple(a.reshape(Np // block_rows, block_rows, -1)
                 for a in (U, V, w, logdet))

    def body(acc, xs):
        return acc + block(*xs), None

    out, _ = jax.lax.scan(body, jnp.zeros((M, M), dtype=U.dtype), args)
    return out


# Forward route (round-5 sweep): in ISOLATION the all-Pallas forward
# beats XLA's blocked forward at D in {2, 3} (5.04 / 6.46 vs 6.64 ms,
# v5e N=8192 M=256) — but ASSEMBLED with the Pallas recompute backward
# in one fwd+bwd program it regresses the total by ~4-5 ms (measured
# D=2: 15.95 ms vs 12.82 for XLA-fwd + MXU-bwd; the third such
# all-Pallas assembly loss on record after the round-2 conditional and
# round-4 psi2 fwd verdicts — XLA overlaps the forward's HBM streaming
# with surrounding work in ways a second pallas_call does not).  The
# production forward is therefore ALWAYS the blocked XLA expression;
# the range below is kept empty by design, with psi2_core_pallas_fwd
# retained for the A/B record.
_FWD_PALLAS_MIN_D = 1
_FWD_PALLAS_MAX_D = 0          # empty range: XLA forward everywhere


def _fwd_dispatch(U, V, w, logdet, Z, interpret):
    D = Z.shape[1]
    if (_FWD_PALLAS_MIN_D <= D <= _FWD_PALLAS_MAX_D
            and (interpret or is_tpu_backend())):
        return _psi2_core_fwd_call(U, V, w, logdet, Z,
                                   interpret=interpret)
    return _xla_blocked_core(U, V, w, logdet, Z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def psi2_core(U, V, w, logdet, Z, interpret=False):
    """sum_n exp(logdet_n + min(U_na + V_nb - sum_d w_nd Z_ad Z_bd, 0)).

    U, V: (N, M); w: (N, D) (nonnegative); logdet: (N, 1); Z: (M, D).
    Returns (M, M).

    HYBRID execution (round-5 measured split, scripts/
    sweep_psi2_bwd.py, v5e N=8192 M=256): the forward is ALWAYS the
    blocked XLA expression (an all-Pallas fwd+bwd assembly measured
    slower despite a faster isolated forward — see _FWD_PALLAS_*);
    the backward is a Pallas recompute kernel — per-d VPU chains at
    D=1, MXU contractions from D=2 up (_BWD_MXU_MIN_D) — vs XLA
    autodiff's D-independent ~17 ms of (N, M, M) residual HBM
    traffic.  End-to-end fwd+bwd vs all-XLA: 1.70x at D=1, 1.84x at
    D=2, 1.65x at D=3, 1.54x at D=4, 1.17x at D=6, wash at D=8.
    """
    return _fwd_dispatch(U, V, w, logdet, Z, interpret)


def _core_fwd(U, V, w, logdet, Z, interpret):
    out = _fwd_dispatch(U, V, w, logdet, Z, interpret)
    return out, (U, V, w, logdet, Z)


def _core_bwd(interpret, res, g):
    U, V, w, logdet, Z = res
    return _psi2_core_bwd_call(U, V, w, logdet, Z, g,
                               interpret=interpret)


psi2_core.defvjp(_core_fwd, _core_bwd)


def psi2_core_reference(U, V, w, logdet, Z):
    """Dense XLA reference of the kernel contract (tests/oracle)."""
    R = jnp.einsum("nd,ad,bd->nab", w, Z, Z)
    pre = U[:, :, None] + V[:, None, :] - R
    return jnp.sum(jnp.exp(jnp.minimum(pre, 0.0) + logdet[:, :, None]),
                   axis=0)


# Profitability crossover for the kernel route, measured end-to-end
# through _rbf_cross_psi2 on v5e at N=8192, M=256 (round-5 sweeps,
# scripts/sweep_psi2_bwd.py; fwd+bwd ms, xla -> best kernel route at
# the production per-D pre/bwd selection):
#   D=1 14.85 -> 8.72 (1.70x, VPU bwd)   D=4 23.56 -> 15.32 (1.54x)
#   D=2 23.54 -> 12.82 (1.84x, MXU bwd)  D=6 23.54 -> 17.91 (1.31x)
#   D=3 23.59 -> 14.32 (1.65x)           D=8 23.63 -> 18.97 (1.25x)
# The round-4 VPU backward's ~(19 + 6(D-1)) ops/element lost above
# D ~ 3; the round-5 MXU-contraction backward plus the MXU pre
# recompute at D >= _PRE_MXU_MIN_D leave a ~0.7 ms/D residual slope
# against XLA's flat ~23.6 ms — every measured D wins.  Gate at 8,
# the last MEASURED win (extrapolated crossover ~D=15, unverified;
# D > 8 routes to XLA until someone measures it).
PSI2_KERNEL_MAX_D = 8


def psi2_kernel_supported(N, M, D, dtype) -> bool:
    """Shape/dtype gate: the kernel handles f32, M <= 512 (VMEM-resident
    (M, M) output + (BN, M, M) block), D <= 32 (unrolled loop), and a
    bounded (N, M) staging footprint."""
    return (dtype == jnp.float32 and M <= _MAX_M and 1 <= D <= _MAX_D
            and N * M <= 64 * 1024 * 1024)


# Lower M bound of the win region (round-5 region sweep, D=2 fwd+bwd
# ms, xla -> kernel): M=100 is a 5-6x LOSS (0.14 -> 0.77 at N=1500 —
# below one 128-lane tile XLA fully fuses the (N, M, M) block and the
# kernel's padding + fixed costs dominate), while every measured
# M >= 128 wins: M=128 5.97 -> 4.25 (1.41x, N=8192), M=192 15.27 ->
# 8.39 (1.82x), M=256 5.72 -> 2.62 (2.18x, N=1500).
PSI2_KERNEL_MIN_M = 128


def psi2_kernel_profitable(N, M, D, dtype) -> bool:
    """supported AND inside the measured-win region (see
    PSI2_KERNEL_MAX_D / PSI2_KERNEL_MIN_M)."""
    return (psi2_kernel_supported(N, M, D, dtype)
            and D <= PSI2_KERNEL_MAX_D and M >= PSI2_KERNEL_MIN_M)


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
