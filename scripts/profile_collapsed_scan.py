"""Scan-amortized per-op device times for the collapsed-family step
(damianou_L2 / collapsed_L2 bench shape: N=1500, M=100, D=8) — the
companion to profile_large_m_scan.py for the VPU-bound rows.

Times the candidate cost centers of the SGPR/psi-statistics step:
psi_statistics fwd and fwd+bwd, the (B, M, M) psi2 einsum+exp block in
isolation, safe_cholesky / safe_cholesky_ladder at M=100, and the
B-matrix two-solve assembly.  Methodology as profile_large_m_scan.py:
each op applied ITERS times inside one jitted lax.scan with a
value-coupling term; a no-op scan row calibrates per-app overhead.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 50


def scan_time(f, x0, iters=ITERS, n=8):
    """ms per op application inside one compiled scan."""
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
    from doubly_stochastic_dgp_tpu.ops.psi_stats import psi_statistics

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"

    rng = np.random.RandomState(0)
    N, M, D = 1500, 100, 8
    mu = jnp.asarray(rng.randn(N, D).astype("float32"))
    S = jnp.asarray(rng.rand(N, D).astype("float32") * 0.1 + 1e-3)
    Z = jnp.asarray(rng.randn(M, D).astype("float32"))
    kern = dsd.RBF.make(D)

    A0 = kern.K(Z) + 1e-3 * jnp.eye(M)
    L0 = jnp.linalg.cholesky(A0)

    rows = []

    def rec(name, ms):
        rows.append((name, ms))
        print(f"{name:<38} {ms:8.4f} ms", flush=True)

    rec("scan_overhead (noop, (M,M) carry)",
        scan_time(lambda c: c + 1e-12, A0))
    rec("scan_overhead (noop, (N,D) carry)",
        scan_time(lambda c: c + 1e-12, mu))

    # full psi statistics, forward
    def f_psi(c):
        p0, p1, p2 = psi_statistics(kern, c, S, Z)
        return c + 1e-12 * (jnp.sum(p0) + jnp.sum(p1) + jnp.sum(p2))
    rec("psi_statistics fwd (N=1500,M=100)", scan_time(f_psi, mu))

    # forward + backward (grad wrt mu — the training path)
    def f_psig(c):
        g = jax.grad(lambda m: sum(jnp.sum(p) for p in
                                   psi_statistics(kern, m, S, Z)))(c)
        return c + 1e-12 * g
    rec("psi_statistics fwd+bwd", scan_time(f_psig, mu))

    # the psi2 (B, M, M) einsum+exp block alone (matches the
    # _rbf_cross_psi2 inner structure at a == b)
    ls2 = jnp.ones((D,), dtype=jnp.float32)
    h = ls2 / 2
    zz = Z[:, None, :] - Z[None, :, :]
    log_zz = -0.5 * jnp.sum(zz ** 2 / (2 * ls2), axis=-1)
    c_ab = 0.5 * (Z[:, None, :] + Z[None, :, :])                # (M,M,D)

    def f_psi2_block(c):
        denom = h + S
        inv = 1.0 / denom
        logdet = 0.5 * jnp.sum(jnp.log(h) - jnp.log(denom), axis=-1)
        t_mu2 = jnp.sum(c ** 2 * inv, axis=-1)
        t_cross = jnp.einsum("nd,abd->nab", c * inv, c_ab)
        t_c2 = jnp.einsum("nd,abd->nab", inv, c_ab ** 2)
        quad = jnp.minimum(
            -0.5 * (t_mu2[:, None, None] - 2 * t_cross + t_c2), 0.0)
        p2n = jnp.exp(logdet[:, None, None] + log_zz[None] + quad)
        out = jnp.einsum("nab->ab", p2n)
        return c + 1e-12 * jnp.sum(out)
    rec("psi2 einsum+exp block (current form)", scan_time(f_psi2_block, mu))

    # exp-only throughput at the (N, M, M) shape (VPU ceiling probe)
    big = jnp.asarray(rng.rand(N, M, M).astype("float32"))

    def f_exp(c):
        return c + 1e-12 * jnp.exp(-c)
    rec("exp (N,M,M) elementwise", scan_time(f_exp, big))

    # reduce over n of a (N, M, M) tensor (HBM read probe)
    def f_red(c):
        return c + 1e-12 * jnp.sum(c, axis=0, keepdims=True)
    rec("sum_n (N,M,M) reduce", scan_time(f_red, big))

    # factorizations at M=100 (SGPR: Kuu chol + B-ladder per step)
    def f_chol(c):
        return c + 1e-12 * safe_cholesky(c, 1e-5)
    rec("safe_cholesky M=100", scan_time(f_chol, A0))

    def f_ladder(c):
        return c + 1e-12 * safe_cholesky_ladder(c)
    rec("safe_cholesky_ladder M=100", scan_time(f_ladder, A0))

    def f_cholgrad(c):
        g = jax.grad(lambda a: jnp.sum(safe_cholesky(a, 1e-5)))(c)
        return c + 1e-12 * g
    rec("safe_chol fwd+bwd M=100", scan_time(f_cholgrad, A0))

    def f_inv(c):
        return jnp.tril(inv_lower(jnp.tril(c) + jnp.eye(M)))
    rec("inv_lower M=100", scan_time(f_inv, L0))

    # SGPR two-solve AAT assembly at (M, N): Li Kuf, AAT, B
    Kuf0 = kern.K(Z, mu)

    def f_aat(c):
        Li = inv_lower(jnp.tril(c) + jnp.eye(M))
        A = Li @ Kuf0
        AAT = A @ A.T
        B = AAT + jnp.eye(M)
        return c + 1e-12 * B
    rec("Li@Kuf + AAT + B (M=100,N=1500)", scan_time(f_aat, L0))

    print("\n| op | ms/app |")
    print("|---|---|")
    for name, t in rows:
        print(f"| {name} | {t:.4f} |")


if __name__ == "__main__":
    main()
