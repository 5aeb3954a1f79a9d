"""Scan-amortized per-op device times for the large_M step (M=512,
batch 8192, L=2) — the dispatch-proof companion to profile_large_m.py.

A single jitted op on the tunneled TPU is dispatch-dominated (ms-scale
RTT swamps sub-ms device work), so each op here runs ITERS times inside
ONE jitted lax.scan with a value-coupling term (x + 1e-12*f(x)) that
serializes iterations and defeats CSE; the reported time is
(scan_time - scan_overhead) / ITERS.  The overhead row (a no-op scan at
the same carry shape) calibrates the subtraction.
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
        x = x + 0.0 * jax.random.uniform(key, ())  # unique input
        def body(c, _):
            return f(c), None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree_util.tree_map(lambda a: a.ravel()[0], c)

    key = jax.random.PRNGKey(0)
    # i is negative during the timer's warmup call; offset for fold_in
    t = timed_per_call(
        lambda i: run(x0, jax.random.fold_in(key, i + (1 << 20))), n=n)
    return t * 1e3 / iters


def main():
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.ops.linalg import (inv_lower,
                                                      safe_cholesky)

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"

    rng = np.random.RandomState(0)
    D, M, R = 8, 512, 8192
    X = jnp.asarray(rng.rand(R, D).astype("float32"))
    Z = jnp.asarray(rng.rand(M, D).astype("float32"))
    kern = dsd.RBF.make(D)

    A0 = kern.K(Z) + 1e-3 * jnp.eye(M)
    L0 = jnp.linalg.cholesky(A0)
    Kuf0 = kern.K(Z, X)

    rows = []

    def rec(name, ms, flops=None):
        tf = (flops / (ms * 1e-3) / 1e12) if flops else None
        rows.append((name, ms, tf))
        tf_txt = f" {tf:7.2f} TF/s" if tf else ""
        print(f"{name:<30} {ms:8.4f} ms{tf_txt}", flush=True)

    # calibration: no-op scan at the (M, M) carry shape
    rec("scan_overhead (noop)", scan_time(lambda c: c + 1e-12, A0))

    # gram Kuf: couple via a full row-sum so XLA cannot DCE any column
    # (an earlier [:, :M] slice coupling let XLA drop 15/16 of the work
    # and report above-ceiling TF/s)
    def f_kuf(c):
        K = kern.K(Z + 1e-12 * c[:, :D], X)
        return c + 1e-12 * jnp.sum(K, axis=1, keepdims=True)
    rec("gram_kuf (M x 8192)", scan_time(f_kuf, A0), 2 * R * M * D)

    def f_chol(c):
        L = safe_cholesky(c, 1e-5)
        return c + 1e-12 * L
    rec("safe_cholesky M=512", scan_time(f_chol, A0), M ** 3 / 3)

    def f_cholraw(c):
        L = jnp.linalg.cholesky(c)
        return c + 1e-12 * L
    rec("raw cholesky M=512", scan_time(f_cholraw, A0), M ** 3 / 3)

    def f_cholgrad(c):
        g = jax.grad(lambda a: jnp.sum(safe_cholesky(a, 1e-5)))(c)
        return c + 1e-12 * g
    rec("safe_chol fwd+bwd M=512", scan_time(f_cholgrad, A0),
        2 * M ** 3 / 3)

    def f_inv(c):
        return jnp.tril(inv_lower(jnp.tril(c) + jnp.eye(M)))
    rec("inv_lower M=512", scan_time(f_inv, L0), M ** 3 / 3)

    def f_g(c):
        G = c @ Kuf0
        return c + 1e-12 * jnp.sum(G, axis=1, keepdims=True)
    rec("matmul (M,M)@(M,8192)", scan_time(f_g, L0), 2 * M * M * R)

    # HIGHEST-precision variant of the same matmul (the 'mixed' tier's
    # staging cost)
    def f_gh(c):
        G = jnp.matmul(c, Kuf0, precision=jax.lax.Precision.HIGHEST)
        return c + 1e-12 * jnp.sum(G, axis=1, keepdims=True)
    rec("matmul HIGHEST same shape", scan_time(f_gh, L0), 2 * M * M * R)

    # batched (2, M, M) factorizations: the cross-layer batching lever
    A2 = jnp.stack([A0, A0 + 1e-3 * jnp.eye(M)])

    def f_bchol(c):
        L = jnp.linalg.cholesky(c)
        return c + 1e-12 * L
    rec("batched chol (2,M,M)", scan_time(f_bchol, A2),
        2 * M ** 3 / 3)

    L2 = jnp.stack([L0, L0])

    def f_binv(c):
        V = jax.vmap(inv_lower)(jnp.tril(c) + jnp.eye(M))
        return c + 1e-12 * jnp.tril(V)
    rec("batched inv_lower (2,M,M)", scan_time(f_binv, L2),
        2 * M ** 3 / 3)

    print("\n| op | ms/app | TFLOP/s |")
    print("|---|---|---|")
    for name, t, tf in rows:
        print(f"| {name} | {t:.4f} | "
              f"{'' if tf is None else f'{tf:.2f}'} |")


if __name__ == "__main__":
    main()
