"""TPU step-time breakdown for the BASELINE config: times the ELBO
forward, value_and_grad, and the full Adam step separately (each jitted
alone), plus per-layer-count scaling — identifies where the step budget
goes without needing a trace viewer."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax


def timeit(f, *args, n=30):
    """Mean ms per call (tunneled-TPU methodology of utils/timing.py;
    uniqueness = a fold_in'd PRNG key as the last positional arg)."""
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    *head, key = args
    return timed_per_call(
        lambda i: f(*head, jax.random.fold_in(key, i + 1)), n=n) * 1e3


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
