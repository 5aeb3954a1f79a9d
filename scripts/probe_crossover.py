"""TPU probe: fused Pallas conditional vs XLA reference across M
(inducing count), forward+backward, B=8192.  Identifies the regime
where VMEM fusion beats XLA's HBM-materialized intermediates."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from doubly_stochastic_dgp_tpu.ops.pallas.conditional import (
    fused_conditional, fused_conditional_reference)


def timeit(f, *args, n=400, repeats=3):
    """Best-of-repeats mean ms per call (tunneled-TPU methodology of
    utils/timing.py; uniqueness = an iteration-dependent epsilon on the
    first argument, numerically negligible)."""
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    x0 = args[0]
    return timed_per_call(
        lambda i: f(x0 + (i + 1) * 1e-12, *args[1:]),
        n=n, repeats=repeats) * 1e3


def main():
    B, Dx = 8192, 8
    Do = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.RandomState(0)
    # Do > 4 at M=1024: the backward's W_d + accumulating dW_d double
    # buffers exceed VMEM; the shape gate excludes that corner
    # M capped at 512: the staged backward keeps four (Mp, Mp) blocks
    # VMEM-resident (see pallas_profitable)
    for M in (100, 128, 256, 512):
        Xs = jnp.asarray(rng.randn(B, Dx), jnp.float32)
        Zs = jnp.asarray(rng.randn(M, Dx), jnp.float32)
        LiT = jnp.asarray(np.eye(M) + 0.05 * rng.randn(M, M), jnp.float32)
        alpha = jnp.asarray(rng.randn(M, Do) * 0.1, jnp.float32)
        W = jnp.asarray(rng.randn(Do, M, M) * 0.01, jnp.float32)
        kvar = jnp.float32(1.0)
        kdiag = jnp.float32(1.0)
        G = jnp.asarray(rng.randn(B, Do), jnp.float32)

        def loss_pl(Xs, Zs, LiT, alpha, W, kvar, kdiag):
            m, v = fused_conditional(Xs, Zs, LiT, alpha, W, kvar, kdiag)
            return jnp.sum(m * G) + jnp.sum(v * G)

        def loss_ref(Xs, Zs, LiT, alpha, W, kvar, kdiag):
            m, v = fused_conditional_reference(Xs, Zs, LiT, alpha, W,
                                               kvar, kdiag)
            return jnp.sum(m * G) + jnp.sum(v * G)

        args = (Xs, Zs, LiT, alpha, W, kvar, kdiag)
        g_pl = jax.jit(jax.grad(loss_pl, argnums=(0, 2, 3, 4)))
        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 2, 3, 4)))
        t_pl = timeit(g_pl, *args)
        t_ref = timeit(g_ref, *args)
        print(f"M={M}: fused {t_pl:.2f} ms  xla {t_ref:.2f} ms  "
              f"speedup {t_ref / t_pl:.2f}x", flush=True)


if __name__ == "__main__":
    main()
