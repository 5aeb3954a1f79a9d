"""Scan-amortized per-op device times for the collapsed-family step —
the companion to profile_large_m_scan.py for the psi-statistics rows.

Default shape is the damianou_L2 / collapsed_L2 bench shape (N=1500,
M=100, D=8); pass ``--N 8192 --M 256`` for the compute-bound roofline
shape (round-3 VERDICT next #1: the psi path had no utilization audit
at arithmetic intensity).

Times the candidate cost centers of the SGPR/psi-statistics step:
psi_statistics fwd and fwd+bwd, the (B, M, M) psi2 block in isolation,
its three candidate ceilings (the batched R matmul on the MXU, exp /
fused-elementwise throughput on the VPU, and an HBM stream probe at the
(B, M, M) footprint), safe_cholesky / ladder at M, the B-matrix
two-solve assembly, and the full DGPDamianou elbo fwd+bwd.
Methodology as profile_large_m_scan.py: each op applied ITERS times
inside one jitted lax.scan with a value-coupling term; a no-op scan row
calibrates per-app overhead.
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 50


def scan_time(f, x0, iters=None, n=8):
    """ms per op application inside one compiled scan."""
    iters = ITERS if iters is None else iters
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    @jax.jit
    def run(x, key):
        x = jax.tree_util.tree_map(
            lambda a: a + 0.0 * jax.random.uniform(key, (), a.dtype), x)

        def body(c, _):
            return f(c), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree_util.tree_map(lambda a: a.ravel()[0], c)

    key = jax.random.PRNGKey(0)
    t = timed_per_call(
        lambda i: run(x0, jax.random.fold_in(key, i + (1 << 20))), n=n)
    return t * 1e3 / iters


def main():
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.ops.linalg import (inv_lower,
                                                      safe_cholesky,
                                                      safe_cholesky_ladder)
    from doubly_stochastic_dgp_tpu.ops.psi_stats import (_psi2_block_rows,
                                                         psi_statistics)

    global ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=1500)
    ap.add_argument("--M", type=int, default=100)
    ap.add_argument("--D", type=int, default=8)
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"

    rng = np.random.RandomState(0)
    N, M, D = args.N, args.M, args.D
    ITERS = args.iters
    B = _psi2_block_rows(M)          # rows per psi2 scan block
    print(f"# shape N={N} M={M} D={D}  psi2 block rows={B}", flush=True)
    mu = jnp.asarray(rng.randn(N, D).astype("float32"))
    S = jnp.asarray(rng.rand(N, D).astype("float32") * 0.1 + 1e-3)
    Z = jnp.asarray(rng.randn(M, D).astype("float32"))
    kern = dsd.RBF.make(D)

    A0 = kern.K(Z) + 1e-3 * jnp.eye(M)
    L0 = jnp.linalg.cholesky(A0)

    rows = []

    def rec(name, ms, flops=None, elems=None, bytes_=None):
        rate = ""
        if flops:
            rate = f" {flops / (ms * 1e-3) / 1e12:7.2f} TF/s"
        elif elems:
            rate = f" {elems / (ms * 1e-3) / 1e9:7.2f} Gelem/s"
        elif bytes_:
            rate = f" {bytes_ / (ms * 1e-3) / 1e9:7.2f} GB/s"
        rows.append((name, ms, rate))
        print(f"{name:<48} {ms:9.4f} ms{rate}", flush=True)

    rec("scan_overhead (noop, (M,M) carry)",
        scan_time(lambda c: c + 1e-12, A0))
    rec("scan_overhead (noop, (N,D) carry)",
        scan_time(lambda c: c + 1e-12, mu))

    # full psi statistics, forward (flop annotation = the psi2 R matmul,
    # the only MXU-scaling term — rates above it mean XLA fused more)
    def f_psi(c):
        p0, p1, p2 = psi_statistics(kern, c, S, Z)
        return c + 1e-12 * (jnp.sum(p0) + jnp.sum(p1) + jnp.sum(p2))
    rec(f"psi_statistics fwd (N={N},M={M})", scan_time(f_psi, mu),
        flops=2 * N * M * M * D)

    # forward + backward (grad wrt mu — the training path)
    def f_psig(c):
        g = jax.grad(lambda m: sum(jnp.sum(p) for p in
                                   psi_statistics(kern, m, S, Z)))(c)
        return c + 1e-12 * g
    rec("psi_statistics fwd+bwd", scan_time(f_psig, mu),
        flops=3 * 2 * N * M * M * D)

    # the real psi2 path in isolation: _rbf_cross_psi2 at a == b (the
    # (B, M, M) R matmul + exp + n-reduce, blocked over rows)
    from doubly_stochastic_dgp_tpu.ops.psi_stats import _rbf_cross_psi2

    def f_psi2(c):
        with jax.default_matmul_precision("highest"):
            p2 = _rbf_cross_psi2(kern, kern, c, S, Z)
        return c + 1e-12 * jnp.sum(p2)
    rec("psi2 _rbf_cross fwd", scan_time(f_psi2, mu),
        flops=2 * N * M * M * D)

    def f_psi2g(c):
        g = jax.grad(lambda m: jnp.sum(
            _rbf_cross_psi2(kern, kern, m, S, Z)))(c)
        return c + 1e-12 * g
    with jax.default_matmul_precision("highest"):
        rec("psi2 _rbf_cross fwd+bwd", scan_time(f_psi2g, mu),
            flops=3 * 2 * N * M * M * D)

    # --- ceiling probes at the per-block footprint (B, M, M) ---------
    # the true psi2 MXU op: batched (B,M,D)@(D,M) at HIGHEST
    w = jnp.asarray(rng.rand(B, D).astype("float32"))

    def f_r(c):
        Zw = Z[None, :, :] * c[:, None, :]                      # (B,M,D)
        R = jnp.matmul(Zw, Z.T,
                       precision=jax.lax.Precision.HIGHEST)     # (B,M,M)
        return c + 1e-12 * jnp.sum(R, axis=(1, 2))[:, None]
    rec(f"R batched matmul ({B},{M},{D})@({D},{M}) HIGHEST",
        scan_time(f_r, w), flops=2 * B * M * M * D)

    big = jnp.asarray(rng.rand(B, M, M).astype("float32"))

    def f_exp(c):
        return c + 1e-12 * jnp.exp(-c)
    rec(f"exp ({B},{M},{M}) elementwise", scan_time(f_exp, big),
        elems=B * M * M)

    # fused elementwise chain (~6 VPU flops/elem: the quad assembly)
    def f_fused(c):
        y = jnp.minimum(c * 0.5 + 0.25, 0.0)
        y = y * 2.0 + c
        return c + 1e-12 * y
    rec(f"fused 6-op elementwise ({B},{M},{M})", scan_time(f_fused, big),
        elems=B * M * M)

    # HBM stream: one full read of the (B, M, M) footprint
    def f_red(c):
        return c + 1e-12 * jnp.sum(c, axis=0, keepdims=True)
    rec(f"sum_n ({B},{M},{M}) reduce [HBM read]", scan_time(f_red, big),
        bytes_=4 * B * M * M)

    # factorizations at M (SGPR: Kuu chol + B-ladder per step)
    def f_chol(c):
        return c + 1e-12 * safe_cholesky(c, 1e-5)
    rec(f"safe_cholesky M={M}", scan_time(f_chol, A0))

    def f_ladder(c):
        return c + 1e-12 * safe_cholesky_ladder(c)
    rec(f"safe_cholesky_ladder M={M}", scan_time(f_ladder, A0))

    def f_cholgrad(c):
        g = jax.grad(lambda a: jnp.sum(safe_cholesky(a, 1e-5)))(c)
        return c + 1e-12 * g
    rec(f"safe_chol fwd+bwd M={M}", scan_time(f_cholgrad, A0))

    def f_inv(c):
        return jnp.tril(inv_lower(jnp.tril(c) + jnp.eye(M)))
    rec(f"inv_lower M={M}", scan_time(f_inv, L0))

    # SGPR two-solve AAT assembly at (M, N): Li Kuf, AAT, B
    Kuf0 = kern.K(Z, mu)

    def f_aat(c):
        Li = inv_lower(jnp.tril(c) + jnp.eye(M))
        A = Li @ Kuf0
        AAT = A @ A.T
        B = AAT + jnp.eye(M)
        return c + 1e-12 * B
    rec(f"Li@Kuf + AAT + B (M={M},N={N})",
        scan_time(f_aat, L0), flops=2 * N * M * M * 2)

    # --- the full model step at this shape ----------------------------
    # DGPDamianou L=2 elbo fwd+bwd: the end-to-end anchor the per-op
    # rows must sum toward (bench damianou rows measure the same
    # objective through the optimizer step)
    Y = jnp.asarray(rng.randn(N, 1).astype("float32"))
    kerns = [dsd.RBF.make(D) for _ in range(2)]
    model = dsd.DGPDamianou.build(np.asarray(mu), np.asarray(Y),
                                  np.asarray(Z), kerns,
                                  dsd.Gaussian.make(0.05))

    def f_elbo_grad(m):
        val, g = jax.value_and_grad(lambda mm: -mm.elbo())(m)
        return jax.tree_util.tree_map(
            lambda a, b: a + 1e-12 * b, m, g)
    rec("DGPDamianou L=2 elbo fwd+bwd", scan_time(f_elbo_grad, model,
                                                  iters=20))

    print("\n| op | ms/app | rate |")
    print("|---|---|---|")
    for name, t, rate in rows:
        print(f"| {name} | {t:.4f} | {rate.strip()} |")


if __name__ == "__main__":
    main()
