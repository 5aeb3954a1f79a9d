"""Closed-form kernel expectations (psi statistics) for RBF kernels under
diagonal-Gaussian inputs.

Rebuilds the ``gpflow.expectations.expectation(DiagonalGaussian, ...)``
calls the reference's uncertain-input SGPR path consumes
(/root/reference/doubly_stochastic_dgp/layers.py:405-450,483-525):

  psi0[n]      = E_{x_n}[ k(x_n, x_n) ]
  psi1[n, m]   = E_{x_n}[ k(x_n, z_m) ]
  psi2[m, m']  = sum_n E_{x_n}[ k(x_n, z_m) k(x_n, z_m') ]

with x_n ~ N(mu_n, diag(S_n)).  Derivations are the standard Bayesian-GPLVM
results (Titsias & Lawrence 2010).  Everything is expressed as
broadcasted elementwise ops + one einsum so XLA maps the m,m' products
onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kernels import RBF, Linear, Sum, White

__all__ = ["psi_statistics"]


# Rows of the psi2 data-sum processed per block: peak memory for the
# (block, M, M) intermediates stays ~block*M^2 floats instead of N*M^2
# (at M=100, f32, the default is ~330 MB of transient vs unbounded).
PSI2_BLOCK_ROWS = 8192

# Element budget for one (block, M, M) transient: at M > ~100 the row
# cap alone stops bounding memory (M=512 at 8192 rows would be an 8.6 GB
# f32 intermediate), so the effective block is
# min(PSI2_BLOCK_ROWS, PSI2_BLOCK_ELEMS // M^2) — the M=100 behavior is
# unchanged, larger M trades scan length for bounded peak memory.
PSI2_BLOCK_ELEMS = 8192 * 100 * 100


def _psi2_block_rows(M):
    return min(PSI2_BLOCK_ROWS, max(128, PSI2_BLOCK_ELEMS // (M * M)))


def _psi2_route(N, M, D, dtype):
    """('xla' | 'pallas', interpret) for the RBF psi2 data-sum.

    ``config.psi2_impl`` (trace-time read): 'auto' picks the fused
    Pallas kernel route (ops/pallas/psi2.py) on TPU inside its
    measured-win region D <= PSI2_KERNEL_MAX_D = 8 AND M >=
    PSI2_KERNEL_MIN_M = 128 — the round-5 MXU-contraction backward
    (and MXU pre-recompute at D >= 5) made the kernel's cost nearly
    D-independent while the XLA path pays a flat ~17 ms of (N, M, M)
    residual HBM traffic at M >= 128; every measured D wins there
    (1.70x/1.84x/1.65x/1.54x/1.31x/1.25x at D=1/2/3/4/6/8), while
    below one 128-lane tile XLA fully fuses the block and the kernel
    is a 5-6x LOSS (M=100 measured).  scripts/sweep_psi2_bwd.py,
    PERF.md round-5; both gates sit at measured points.  'pallas' forces the kernel wherever its
    hard shape limits allow (interpret mode off-TPU — how the CPU
    equality tests drive it), 'xla' forces the blocked XLA path."""
    from ..config import config
    from .pallas.psi2 import (is_tpu_backend, psi2_kernel_profitable,
                              psi2_kernel_supported)

    mode = getattr(config, "psi2_impl", "auto")
    if mode == "xla":
        return "xla", False
    if mode == "pallas":
        if psi2_kernel_supported(N, M, D, dtype):
            return "pallas", not is_tpu_backend()
        return "xla", False
    if is_tpu_backend() and psi2_kernel_profitable(N, M, D, dtype):
        return "pallas", False
    return "xla", False


def _blocked_data_sum(block_fn, mu, S, out_shape):
    """Accumulate ``block_fn(mu_b, S_b, w_b) -> out_shape`` over row
    blocks of the data (lax.scan), so peak memory for the per-row
    intermediates stays O(block * ...) however large N grows.
    ``w_b`` is a row mask that zeroes padded rows."""
    N = mu.shape[0]
    block = _psi2_block_rows(out_shape[0])
    if N <= block:
        return block_fn(mu, S, jnp.ones((N,), dtype=mu.dtype))
    n_blocks = -(-N // block)
    pad = n_blocks * block - N
    w = jnp.pad(jnp.ones((N,), dtype=mu.dtype), (0, pad))
    mu_p = jnp.pad(mu, ((0, pad), (0, 0)))
    S_p = jnp.pad(S, ((0, pad), (0, 0)), constant_values=1.0)
    args = (mu_p.reshape(n_blocks, block, -1),
            S_p.reshape(n_blocks, block, -1),
            w.reshape(n_blocks, block))

    def body(acc, xs):
        return acc + block_fn(*xs), None

    out, _ = jax.lax.scan(body, jnp.zeros(out_shape, dtype=mu.dtype),
                          args)
    return out


def _z_center(Z):
    """Common per-dimension shift for the rank-separated quadratics.

    They are exactly invariant under mu -> mu - c, Z -> Z - c, but the
    mu^2 - 2 mu z + z^2 expansion's f32 cancellation error grows with
    the squared magnitude of the coordinates — centering on the
    inducing-point cloud anchors the expansion where psi mass lives.
    stop_gradient is exact: d(out)/dc == 0 analytically."""
    return jax.lax.stop_gradient(jnp.mean(Z, axis=0))


def _sep_quad(mu, inv, Z):
    """The psi1-style Gaussian quadratic -0.5 sum_d (mu_nd - z_md)^2
    inv_nd, rank-separated as mu^2 - 2 mu z + z^2 so the d-contraction
    is two (B,D)@(D,M) matmuls instead of a (B, M, D) elementwise
    reduce.  Mathematically <= 0; clamped so f32 expansion-cancellation
    noise (near mu == z) can't push exp past 1.  Callers pass mu and Z
    already centered by a common shift (_z_center)."""
    t_mu2 = jnp.sum(mu ** 2 * inv, axis=-1)                     # (B,)
    return jnp.minimum(
        -0.5 * (t_mu2[:, None] - 2.0 * (mu * inv) @ Z.T
                + inv @ (Z ** 2).T), 0.0)                       # (B, M)


def _rbf_cross_psi2(ka: RBF, kb: RBF, mu, S, Z):
    """Cross second moment sum_n E[ k_a(x_n, z_m) k_b(x_n, z_m') ]
    for two (ARD) RBF kernels, x_n ~ N(mu_n, diag(S_n)).  Returns (M, M).

    Derivation: the product of the two per-dimension Gaussians in x is a
    Gaussian with width h = ab/(a+b) centered at c = (b z + a z')/(a+b)
    (a = ls_a^2, b = ls_b^2), times exp(-(z - z')^2 / (2(a+b))); the
    remaining E_x[exp(-(x-c)^2/(2h))] = sqrt(h/(h+s)) exp(-(mu-c)^2 /
    (2(h+s))).  With a == b this reduces to the standard single-RBF psi2
    (Titsias & Lawrence 2010); with a != b it is the Sum-kernel cross
    term the reference gets from gpflow.expectations at
    /root/reference/doubly_stochastic_dgp/layers.py:417.

    The data sum is accumulated in row blocks (lax.scan) so memory is
    O(PSI2_BLOCK_ROWS * M^2) however large N grows.
    """
    va = ka.variance.value
    vb = kb.variance.value
    a = ka.lengthscales.value ** 2 + jnp.zeros_like(mu[0])      # (D,)
    b = kb.lengthscales.value ** 2 + jnp.zeros_like(mu[0])      # (D,)
    h = a * b / (a + b)                                         # (D,)
    zz = Z[:, None, :] - Z[None, :, :]                          # (M, M, D)
    log_zz = -0.5 * jnp.sum(zz ** 2 / (a + b), axis=-1)         # (M, M)
    # the Gaussian-product center separates per dimension:
    # c_abd = beta_d z_ad + alpha_d z_bd  (beta = b/(a+b), alpha = a/(a+b))
    alpha = a / (a + b)                                         # (D,)
    beta = b / (a + b)                                          # (D,)
    # center the expansion (exact shift invariance; see _z_center)
    c = _z_center(Z)
    Z = Z - c
    mu = mu - c

    N, D = mu.shape
    M = Z.shape[0]
    route, interpret = _psi2_route(N, M, D, mu.dtype)
    if route == "pallas":
        # Fused-kernel path: stage the one-sided quadratic halves as
        # full-(N, M) arrays (cheap matmuls under the caller's HIGHEST
        # context), then one pallas_call does the (N, M, M) assembly +
        # exp + n-reduce entirely in VMEM — no HBM materialization of
        # the 3-D block (the XLA path's binding cost at scale).
        from .pallas.psi2 import psi2_core

        denom = h + S                                           # (N, D)
        logdet = 0.5 * jnp.sum(jnp.log(h) - jnp.log(denom),
                               axis=-1, keepdims=True)          # (N, 1)
        inv = 1.0 / denom                                       # (N, D)
        t_mu2 = jnp.sum(mu ** 2 * inv, axis=-1)                 # (N,)
        P1 = (mu * inv * beta) @ Z.T                            # (N, M)
        P2 = (mu * inv * alpha) @ Z.T                           # (N, M)
        Q1 = (inv * beta ** 2) @ (Z ** 2).T                     # (N, M)
        Q2 = (inv * alpha ** 2) @ (Z ** 2).T                    # (N, M)
        Uq = -0.5 * (t_mu2[:, None] - 2.0 * P1 + Q1)            # (N, M)
        Vq = -0.5 * (Q2 - 2.0 * P2)                             # (N, M)
        wq = inv * alpha * beta                                 # (N, D)
        T = psi2_core(Uq, Vq, wq, logdet, Z, interpret)         # (M, M)
        return va * vb * jnp.exp(log_zz) * T

    def block_sum(mu_b, S_b, w_b):
        """Sum over the rows of one (block, D) slab; w_b masks padding.

        The quadratic sum_d -(mu_nd - c_abd)^2 / (2 denom_nd) is
        rank-separated through c = beta z_a + alpha z_b:

          (mu - c)^2 = mu^2 - 2 mu (beta z_a + alpha z_b)
                       + beta^2 z_a^2 + 2 alpha beta z_a z_b
                       + alpha^2 z_b^2

        so after the d-contraction only the z_a z_b term is a true
        3-way tensor R[n,a,b] = sum_d (inv alpha beta)_nd z_ad z_bd —
        one batched (M,D)@(D,M) matmul per row — while every other
        term is a rank-1 broadcast fused straight into the exp.  One
        (B, M, M) intermediate instead of the two einsum outputs of
        the naive mu^2 - 2 mu c + c^2 expansion: ~half the HBM
        traffic on this memory-bound block."""
        denom = h + S_b                                         # (B, D)
        logdet = 0.5 * jnp.sum(jnp.log(h) - jnp.log(denom), axis=-1)
        inv = 1.0 / denom                                       # (B, D)
        t_mu2 = jnp.sum(mu_b ** 2 * inv, axis=-1)               # (B,)
        P1 = (mu_b * inv * beta) @ Z.T                          # (B, M)
        P2 = (mu_b * inv * alpha) @ Z.T                         # (B, M)
        Q1 = (inv * beta ** 2) @ (Z ** 2).T                     # (B, M)
        Q2 = (inv * alpha ** 2) @ (Z ** 2).T                    # (B, M)
        # the lone 3-way term, as a batched matmul on the MXU
        Zw = Z[None, :, :] * (inv * alpha * beta)[:, None, :]   # (B, M, D)
        R = jnp.matmul(Zw, Z.T)                                 # (B, M, M)
        # mathematically <= 0; clamp float32 cancellation noise so exp
        # can't overflow
        quad = jnp.minimum(
            -0.5 * ((t_mu2[:, None] - 2.0 * P1 + Q1)[:, :, None]
                    + (Q2 - 2.0 * P2)[:, None, :]
                    + 2.0 * R), 0.0)
        psi2_n = va * vb * jnp.exp(
            logdet[:, None, None] + log_zz[None, :, :] + quad)  # (B, M, M)
        return jnp.einsum("n,nab->ab", w_b, psi2_n)             # (M, M)

    M = Z.shape[0]
    return _blocked_data_sum(block_sum, mu, S, (M, M))


def _rbf_lin_cross_psi2(kr: RBF, kl: Linear, mu, S, Z):
    """Cross second moment sum_n E[ k_rbf(x_n, z_m) k_lin(x_n, z_m') ]
    for an (ARD) RBF and an (ARD) Linear kernel; returns (M, M) with the
    RBF factor indexing m and the Linear factor indexing m'.

    Derivation (dims independent under the diagonal Gaussian): the RBF
    factor reweights x_n to a Gaussian with per-dim mean
    xbar_d = (a_d mu_d + S_d z_md) / (a_d + S_d)  (a = ls^2), carrying
    the usual psi1 normalizer; the linear factor is then evaluated at
    that mean:  C[m, m'] = sum_n psi1_rbf[n, m] * sum_d v_d
    xbar[n, m, d] z_{m'd}.  This is the Sum-kernel RBF-Linear cross term
    gpflow.expectations supplies to the reference at
    /root/reference/doubly_stochastic_dgp/layers.py:415-417.
    """
    var = kr.variance.value
    a = kr.lengthscales.value ** 2 + jnp.zeros_like(mu[0])      # (D,)
    v = kl.variance.value + jnp.zeros_like(mu[0])               # (D,)
    c = _z_center(Z)
    Zc = Z - c      # the RBF quadratic is centered; the Linear factor
                    # needs absolute coordinates and stays uncentered

    def block_sum(mu_b, S_b, w_b):
        denom = a + S_b                                         # (B, D)
        logdet = -0.5 * jnp.sum(jnp.log1p(S_b / a), axis=-1)    # (B,)
        inv = 1.0 / denom                                       # (B, D)
        psi1 = var * jnp.exp(
            logdet[:, None] + _sep_quad(mu_b - c, inv, Zc))     # (B, M)
        # The reweighted mean separates in (n, m):
        #   xbar[n,m,d] = (a_d mu_nd + S_nd z_md) / denom_nd
        #               = (a mu inv)[n,d] + (S inv)[n,d] * z[m,d]
        # so U[m,d] = sum_n psi1[n,m] xbar[n,m,d] collapses to two
        # (M,B)@(B,D) matmuls — no (B, M, D) intermediate.
        P = psi1 * w_b[:, None]                                 # (B, M)
        U = P.T @ (a * mu_b * inv) + Z * (P.T @ (S_b * inv))    # (M, D)
        return (U * v) @ Z.T                                    # (M, M)

    M = Z.shape[0]
    return _blocked_data_sum(block_sum, mu, S, (M, M))


def _x_second_moment(mu, S):
    """sum_n E[x_n x_n^T] = mu^T mu + diag(sum_n S_n) — (D, D)."""
    return mu.T @ mu + jnp.diag(jnp.sum(S, axis=0))


def _lin_lin_cross_psi2(ka: Linear, kb: Linear, mu, S, Z):
    """sum_n E[ k_a(x_n, z_m) k_b(x_n, z_m') ] for two Linear kernels:
    (Z va) (sum_n E[x x^T]) (Z vb)^T — two MXU matmuls."""
    va = ka.variance.value + jnp.zeros_like(mu[0])
    vb = kb.variance.value + jnp.zeros_like(mu[0])
    return (Z * va) @ _x_second_moment(mu, S) @ (Z * vb).T


def _rbf_psi(kern: RBF, mu, S, Z):
    """psi0 (N,), psi1 (N, M), psi2 summed over n (M, M)."""
    var = kern.variance.value
    ls2 = kern.lengthscales.value ** 2                          # (D,)
    N, D = mu.shape

    psi0 = jnp.full((N,), 1.0, dtype=mu.dtype) * var

    # psi1: prod_d (1 + S/ls2)^(-1/2) exp(-0.5 (mu - z)^2 / (ls2 + S)),
    # quadratic rank-separated (two matmuls; no (N, M, D) intermediate)
    logdet1 = -0.5 * jnp.sum(jnp.log1p(S / ls2), axis=-1)       # (N,)
    c = _z_center(Z)
    psi1 = var * jnp.exp(
        logdet1[:, None]
        + _sep_quad(mu - c, 1.0 / (ls2 + S), Z - c))            # (N, M)

    # psi2 is the a == b case of the cross second moment
    psi2 = _rbf_cross_psi2(kern, kern, mu, S, Z)
    return psi0, psi1, psi2


def _linear_psi(kern: Linear, mu, S, Z):
    """Closed-form psi statistics for the (ARD) Linear kernel
    k(x, z) = sum_d v_d x_d z_d under x_n ~ N(mu_n, diag(S_n)) — the
    other kernel family gpflow.expectations supports (the reference's
    uncertain-input path accepts it via the same expectation() call,
    layers.py:415-417):

      psi0[n]    = sum_d v_d (mu_nd^2 + S_nd)
      psi1[n, m] = sum_d v_d mu_nd z_md
      psi2       = Zv (sum_n mu_n mu_n^T + diag(sum_n S_n)) Zv^T,
                   Zv = Z * v  (second moment of x contracted with the
                   weighted inducing inputs — two MXU matmuls).
    """
    v = kern.variance.value + jnp.zeros_like(mu[0])             # (D,)
    psi0 = jnp.sum(v * (mu ** 2 + S), axis=-1)                  # (N,)
    psi1 = (mu * v) @ Z.T                                       # (N, M)
    Zv = Z * v                                                  # (M, D)
    psi2 = Zv @ _x_second_moment(mu, S) @ Zv.T                  # (M, M)
    return psi0, psi1, psi2


def psi_statistics(kern, mu, S, Z):
    """Dispatch on kernel type. Supports RBF, Linear and
    Sum(RBF, Linear, White, ...) with all pairwise psi2 cross terms —
    the families gpflow.expectations covers.

    White contributes its variance to psi0 only (its cross-covariance is
    zero, so psi1/psi2 cross terms vanish in expectation).

    All contractions run at HIGHEST matmul precision: on TPU the
    default bf16-class einsums corrupt the quadratic forms enough to
    make the computed psi2 *indefinite* (measured at trained-model
    scale: entrywise error 0.6 and min eigenvalue -1.2 at default vs
    2.6e-2 / -1.5e-5 at highest, against a float64 oracle), and an
    indefinite psi2 NaNs the collapsed bound's chol(B) beyond any
    jitter.  The psi contractions are a negligible share of step flops.
    """
    with jax.default_matmul_precision("highest"):
        return _psi_statistics_impl(kern, mu, S, Z)


def _psi_statistics_impl(kern, mu, S, Z):
    if isinstance(kern, RBF):
        return _rbf_psi(kern, mu, S, Z)
    if isinstance(kern, Linear):
        return _linear_psi(kern, mu, S, Z)
    if isinstance(kern, Sum):
        # a + b + c builds nested Sums; flatten to one component list
        def _flatten(k):
            if isinstance(k, Sum):
                return [c for part in k.kernels for c in _flatten(part)]
            return [k]

        N = mu.shape[0]
        M = Z.shape[0]
        psi0 = jnp.zeros((N,), dtype=mu.dtype)
        psi1 = jnp.zeros((N, M), dtype=mu.dtype)
        psi2 = jnp.zeros((M, M), dtype=mu.dtype)
        rbf_parts = []
        lin_parts = []
        for k in _flatten(kern):
            if isinstance(k, White):
                psi0 = psi0 + k.variance.value
            elif isinstance(k, RBF):
                p0, p1, p2 = _rbf_psi(k, mu, S, Z)
                psi0 = psi0 + p0
                psi1 = psi1 + p1
                psi2 = psi2 + p2
                rbf_parts.append(k)
            elif isinstance(k, Linear):
                p0, p1, p2 = _linear_psi(k, mu, S, Z)
                psi0 = psi0 + p0
                psi1 = psi1 + p1
                psi2 = psi2 + p2
                lin_parts.append(k)
            else:
                raise NotImplementedError(
                    f"psi statistics for {type(k).__name__} in a Sum")
        # psi2 cross terms between distinct components:
        # E[(sum_i k_i)(z)(sum_j k_j)(z')] adds C_ij + C_ij^T for each
        # unordered pair (C_ij[m,m'] = E[k_i(x,z_m) k_j(x,z_m')], and
        # C_ji = C_ij^T by symmetry of the closed form in (m, m')).
        # White crosses vanish: E[white(x,z)] = 0 for z off the data.
        for i in range(len(rbf_parts)):
            for j in range(i + 1, len(rbf_parts)):
                C = _rbf_cross_psi2(rbf_parts[i], rbf_parts[j], mu, S, Z)
                psi2 = psi2 + C + C.T
        for i in range(len(lin_parts)):
            for j in range(i + 1, len(lin_parts)):
                C = _lin_lin_cross_psi2(lin_parts[i], lin_parts[j],
                                        mu, S, Z)
                psi2 = psi2 + C + C.T
        for kr in rbf_parts:
            for kl in lin_parts:
                C = _rbf_lin_cross_psi2(kr, kl, mu, S, Z)
                psi2 = psi2 + C + C.T
        return psi0, psi1, psi2
    raise NotImplementedError(
        f"psi statistics not implemented for {type(kern).__name__}")
