"""Cached-posterior vs live serving A/B (round-3 VERDICT weak #1 tail:
BENCH_r03 recorded cached 2.44 ms vs live 2.32 ms, inverting PERF.md's
'cached fastest' — noise or regression?).

Two measurements per (M, path):
  - request latency: one jitted predict_y per call, unique inputs,
    RTT-corrected best-of-N (the serving number; at M=100 this is
    dominated by the ~2 ms tunnel round trip, so ±0.2 ms cached-vs-live
    differences are below the noise floor — the hypothesis this script
    tests);
  - device compute: the same predict_y applied ITERS times inside one
    jitted lax.scan over chained inputs (amortizes the dispatch away;
    isolates the compute the cache actually removes).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 50


def scan_time(f, x0, n=8):
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    @jax.jit
    def run(x, key):
        x = x + 0.0 * jax.random.uniform(key, (), x.dtype)

        def body(c, k):
            out = f(c, k)
            # couple the output back into the carry so the scan can't
            # be collapsed; keep the carry shape
            return c + 0.0 * jnp.mean(out), None

        c, _ = jax.lax.scan(body, x,
                            jax.random.split(key, ITERS))
        return c.ravel()[0]

    key = jax.random.PRNGKey(0)
    t = timed_per_call(
        lambda i: run(x0, jax.random.fold_in(key, i + (1 << 20))), n=n)
    return t * 1e3 / ITERS


def main():
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu import precompute
    from doubly_stochastic_dgp_tpu.utils.timing import (
        timed_per_call_stats)
    import bench

    class A:
        precision = None
        pallas = False

    bench._set_numerics(A())
    X, Y, _ = bench._regression_data()
    S = 100
    B = 1000
    Xs = jnp.asarray(X[:B])
    key = jax.random.PRNGKey(0)

    for M in (100, 512):
        model = bench.build_regression(X, Y, 5, M, 10)
        post = precompute(model)
        py = jax.jit(lambda m, x, k: m.predict_y(x, S, key=k))
        for name, m in (("live", model), ("cached", post)):
            stats = timed_per_call_stats(
                lambda i, m=m: py(m, Xs, jax.random.fold_in(key, 1 + i)),
                repeats=10)
            dev = scan_time(lambda x, k, m=m: py(m, x, k)[0], Xs)
            print(f"M={M:<4} {name:<7} request best {stats['best']*1e3:6.2f} ms "
                  f"(median {stats['median']*1e3:6.2f}, "
                  f"spread {stats['spread_pct']:.0f}%)   "
                  f"device {dev:7.3f} ms/req", flush=True)


if __name__ == "__main__":
    main()
