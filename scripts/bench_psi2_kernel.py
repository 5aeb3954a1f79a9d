"""A/B the fused Pallas psi2 kernel vs the XLA blocked path, on chip.

Measures psi2_core (kernel) against psi2_core_reference-equivalent
traffic via the real _rbf_cross_psi2 XLA path, fwd and fwd+bwd, at the
compute-bound collapsed shape (default N=8192, M=256) and the bench
shape — the round-4 attack on the (N, M, M) HBM materialization that
profile_collapsed_scan.py exposed as >50% of the collapsed step.
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def scan_time(f, x0, iters=50, n=8):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=8192)
    ap.add_argument("--M", type=int, default=256)
    ap.add_argument("--D", type=int, default=8)
    args = ap.parse_args()
    N, M, D = args.N, args.M, args.D

    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.ops.pallas.psi2 import (
        psi2_core, _block_rows)
    from doubly_stochastic_dgp_tpu.ops.psi_stats import _rbf_cross_psi2

    dsd.set_default_float("float32")
    rng = np.random.RandomState(0)
    mu = jnp.asarray(rng.randn(N, D).astype("float32"))
    S = jnp.asarray(rng.rand(N, D).astype("float32") * 0.1 + 1e-3)
    Z = jnp.asarray(rng.randn(M, D).astype("float32"))
    kern = dsd.RBF.make(D)

    U = jnp.asarray(rng.randn(N, M).astype("float32") * 0.5 - 0.2)
    V = jnp.asarray(rng.randn(N, M).astype("float32") * 0.5 - 0.2)
    w = jnp.asarray(rng.rand(N, D).astype("float32"))
    logdet = jnp.asarray(rng.randn(N, 1).astype("float32") * 0.3)

    print(f"# N={N} M={M} D={D}  kernel block rows={_block_rows(M)}",
          flush=True)

    def rec(name, ms):
        elems = N * M * M
        print(f"{name:<44} {ms:9.4f} ms  "
              f"{elems / (ms * 1e-3) / 1e9:7.2f} Gelem/s", flush=True)

    # hybrid fwd (blocked XLA inside the custom_vjp)
    def f_k(c):
        out = psi2_core(c, V, w, logdet, Z)
        return c + 1e-12 * jnp.sum(out)
    rec("psi2_core hybrid fwd (XLA blocked)", scan_time(f_k, U))

    # hybrid fwd+bwd (pallas recompute bwd kernel)
    def f_kg(c):
        g = jax.grad(lambda u: jnp.sum(
            psi2_core(u, V, w, logdet, Z) ** 2))(c)
        return c + 1e-12 * g
    rec("psi2_core hybrid fwd+bwd (pallas bwd)", scan_time(f_kg, U))

    # the all-pallas forward, for the record (measured loser at D >= 1
    # vs XLA's fused fwd — see ops/pallas/psi2.py docstrings)
    from doubly_stochastic_dgp_tpu.ops.pallas.psi2 import (
        psi2_core_pallas_fwd)

    def f_pf(c):
        out = psi2_core_pallas_fwd(c, V, w, logdet, Z)
        return c + 1e-12 * jnp.sum(out)
    rec("psi2_core all-pallas fwd (record)", scan_time(f_pf, U))

    # XLA path (the real op, same math end to end).  PIN the route:
    # _rbf_cross_psi2 reads config.psi2_impl at trace time, and 'auto'
    # on TPU at D <= PSI2_KERNEL_MAX_D routes through the hybrid
    # kernel — without the pin these legs silently measured
    # kernel-vs-kernel (the jit-cache probe trap, CLAUDE.md round-4).
    # scan_time builds a fresh jit per call, so tracing happens inside
    # the temp_config scope.
    from doubly_stochastic_dgp_tpu.config import temp_config

    def f_x(c):
        with jax.default_matmul_precision("highest"):
            p2 = _rbf_cross_psi2(kern, kern, c, S, Z)
        return c + 1e-12 * jnp.sum(p2)
    with temp_config(psi2_impl="xla"):
        rec("_rbf_cross_psi2 XLA fwd", scan_time(f_x, mu))

    def f_xg(c):
        g = jax.grad(lambda m: jnp.sum(
            _rbf_cross_psi2(kern, kern, m, S, Z) ** 2))(c)
        return c + 1e-12 * g
    with temp_config(psi2_impl="xla"):
        rec("_rbf_cross_psi2 XLA fwd+bwd", scan_time(f_xg, mu))

    # the end-to-end hybrid route through the SAME op (auto gate on
    # chip; fresh jits per leg — never reuse a jit across a config
    # flip)
    def f_hg(c):
        g = jax.grad(lambda m: jnp.sum(
            _rbf_cross_psi2(kern, kern, m, S, Z) ** 2))(c)
        return c + 1e-12 * g
    with temp_config(psi2_impl="pallas"):
        rec("_rbf_cross_psi2 hybrid fwd+bwd", scan_time(f_hg, mu))


if __name__ == "__main__":
    main()
