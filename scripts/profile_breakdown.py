"""TPU step-time breakdown for the BASELINE config: times the ELBO
forward, value_and_grad, and the full Adam step separately (each jitted
alone), plus per-layer-count scaling — identifies where the step budget
goes without needing a trace viewer."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax


def timeit(f, *args, n=30):
    """Mean ms per call.  Tunneled-TPU methodology (PERF.md round-2
    pitfall): block_until_ready under-reports for repeated same-program
    calls on the axon backend, so each call gets a unique PRNG key
    (last positional arg) and the loop is closed with a scalar host
    readback whose round-trip cost is subtracted."""
    *head, key = args

    def sync(o):
        return float(jnp.sum(jax.tree_util.tree_leaves(o)[0].ravel()[0]))

    o = f(*head, key)
    rtt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(o)
        rtt = min(rtt, time.perf_counter() - t0)
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            o = f(*head, jax.random.fold_in(key, r * n + i))
        sync(o)
        best = min(best, (time.perf_counter() - t0 - rtt) / n * 1e3)
    return best


def main():
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"

    rng = np.random.RandomState(0)
    N, D, M, S, B = 7372, 8, 100, 10, 1000
    X = rng.rand(N, D).astype("float32")
    Y = rng.randn(N, 1).astype("float32")
    Z = X[:M].copy()

    for L in (1, 3, 5):
        kernels = []
        for l in range(L):
            k = dsd.RBF.make(D)
            if l < L - 1:
                k = k + dsd.White.make(D, variance=2e-6, trainable=False)
            kernels.append(k)
        m = dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.05),
                          num_samples=S)
        Xb = jnp.asarray(X[:B])
        Yb = jnp.asarray(Y[:B])
        key = jax.random.PRNGKey(0)

        fwd = jax.jit(lambda mm, x, y, k: mm.elbo(x, y, k))
        vgrad = jax.jit(lambda mm, x, y, k: jax.value_and_grad(
            lambda m2: -m2.elbo(x, y, k))(mm))
        tx = masked_optimizer(optax.adam(0.01), m)
        opt_state = tx.init(m)

        def full_step(mm, st, x, y, k):
            loss, g = jax.value_and_grad(lambda m2: -m2.elbo(x, y, k))(mm)
            up, st = tx.update(g, st, mm)
            return optax.apply_updates(mm, up), st, loss

        step = jax.jit(full_step)

        t_f = timeit(fwd, m, Xb, Yb, key)
        t_g = timeit(vgrad, m, Xb, Yb, key)
        t_s = timeit(step, m, opt_state, Xb, Yb, key)
        print(f"L={L}: fwd {t_f:.2f} ms  fwd+bwd {t_g:.2f} ms  "
              f"full step {t_s:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
