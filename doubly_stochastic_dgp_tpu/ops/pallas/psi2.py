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
O(N * M^2) to O(N * M), a ~M/2-fold reduction.  The d-contraction is an
unrolled VPU multiply-add chain (full f32 FMAs — NO bf16-class MXU
passes, so the precision contract of psi_statistics is preserved; the
exponent never sees a lowered dot).  The backward pass is a second
kernel over the same blocks that recomputes the exponential (cheaper
than storing (N, M, M) residuals — which would reintroduce exactly the
HBM traffic the forward removed) and emits closed-form gU/gV/gw/
glogdet/gZ.
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


def _fwd_kernel(U_ref, V_ref, w_ref, logdet_ref, Z_ref, out_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    U = U_ref[:]                                  # (BN, M)
    V = V_ref[:]                                  # (BN, M)
    w = w_ref[:]                                  # (BN, D)
    Z = Z_ref[:]                                  # (M, D)
    D = Z.shape[1]
    pre = U[:, :, None] + V[:, None, :]           # (BN, M, M)
    for d in range(D):                            # static unroll (VPU FMAs)
        zd_row = Z[:, d:d + 1].T                  # (1, M) — slices only:
        # Mosaic can't lower integer gathers on the lane axis
        pre = pre - ((w[:, d:d + 1] * zd_row)[:, :, None]
                     * zd_row[None, :, :])
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
    pre = U[:, :, None] + V[:, None, :]
    for d in range(D):
        zd_row = Z[:, d:d + 1].T                  # (1, M)
        pre = pre - ((w[:, d:d + 1] * zd_row)[:, :, None]
                     * zd_row[None, :, :])
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
    pre = U[:, :, None] + V[:, None, :]
    for d in range(D):
        zd_row = Z[:, d:d + 1].T                  # (1, M)
        pre = pre - ((w[:, d:d + 1] * zd_row)[:, :, None]
                     * zd_row[None, :, :])
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


# Backward-kernel selection threshold: the VPU kernel's unrolled per-d
# chains win at small D; the MXU-contraction kernel (D-independent op
# count) takes over above it.  Set from the round-5 on-chip sweep
# (PERF.md round-5 psi2 table).
_BWD_MXU_MIN_D = 3


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
        bwd_impl = "mxu" if D >= _BWD_MXU_MIN_D else "vpu"
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def psi2_core(U, V, w, logdet, Z, interpret=False):
    """sum_n exp(logdet_n + min(U_na + V_nb - sum_d w_nd Z_ad Z_bd, 0)).

    U, V: (N, M); w: (N, D) (nonnegative); logdet: (N, 1); Z: (M, D).
    Returns (M, M).

    HYBRID execution (measured split, PERF.md round-4, v5e N=8192
    M=256 D=1): the forward is the blocked XLA expression (1.68 ms —
    XLA fuses the small-D R chain into the exp+reduce, already
    HBM-free), the backward is the Pallas recompute kernel (7.4 ms vs
    ~13.1 ms for XLA autodiff, which must save / re-stream (N, M, M)
    residual blocks).  End-to-end fwd+bwd: 9.1 ms hybrid vs 14.8 ms
    all-XLA (1.63x) vs 10.6 ms all-Pallas.
    """
    return _xla_blocked_core(U, V, w, logdet, Z)


def _core_fwd(U, V, w, logdet, Z, interpret):
    out = _xla_blocked_core(U, V, w, logdet, Z)
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


# Profitability crossover for the BACKWARD kernel (the only Pallas leg
# on the production route — see psi2_core), measured on v5e at N=8192,
# M=256 (PERF.md round-4): the kernel is VPU-recompute-bound at
# ~(19 + 6(D-1)) ops/element (~0.39 ms per op-pass at this shape),
# while XLA autodiff pays a D-independent ~13 ms of (N, M, M) residual
# HBM traffic.  Measured end-to-end through _rbf_cross_psi2 (fwd+bwd
# ms, xla -> hybrid): D=1 14.8 -> 8.7 (1.70x), D=2 26.5 -> 14.3
# (1.85x), D=4 26.5 -> 25.2 (wash), D=8 26.2 -> 48.5 (1.85x loss).
# Gate at 2 — strong wins only; the collapsed family's hidden layers
# (the hot psi consumers) are 1-2 wide in the Damianou-Lawrence
# setting.
PSI2_KERNEL_MAX_D = 2


def psi2_kernel_supported(N, M, D, dtype) -> bool:
    """Shape/dtype gate: the kernel handles f32, M <= 512 (VMEM-resident
    (M, M) output + (BN, M, M) block), D <= 32 (unrolled loop), and a
    bounded (N, M) staging footprint."""
    return (dtype == jnp.float32 and M <= _MAX_M and 1 <= D <= _MAX_D
            and N * M <= 64 * 1024 * 1024)


def psi2_kernel_profitable(N, M, D, dtype) -> bool:
    """supported AND inside the measured-win region (see
    PSI2_KERNEL_MAX_D)."""
    return psi2_kernel_supported(N, M, D, dtype) and D <= PSI2_KERNEL_MAX_D


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
