"""Scan-amortized per-op device times for the mnist_dgp2 bench step
(round-4 VERDICT next #6: SURVEY §7 item 12 lists a fused GH-quadrature
likelihood as a candidate Pallas target, never measured).

Shape = the bench row's: 784 -> 30 -> 10 DGP2, MultiClass robust-max
(K=10, GH nodes per the framework default), minibatch 1000, S=1.

Rows:
  - full train step (elbo fwd+bwd+adam) — the bench row's op
  - elbo fwd
  - MultiClass.variational_expectations fwd / fwd+bwd at the exact
    (S*B, K) moment shapes the step produces (the GH tail under audit)
  - layer conditionals fwd+bwd in isolation (784->30 and 30->10),
    incl. the D=784 Kuf gram (the MXU-heavy leg)

Run on chip:  python scripts/profile_mnist_step.py
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 30


def scan_time(f, x0, iters=None, n=6):
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
    import optax

    import bench
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.training.loop import make_sgd_train_step
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer
    from doubly_stochastic_dgp_tpu.utils.modules import log_prior

    global ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    ITERS = args.iters

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"

    model = bench.build_mnist_shape(M=100)
    B = args.batch
    K = 10
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    print(f"# mnist_dgp2 step profile: B={B}, K={K}, "
          f"GH={model.likelihood.num_gauss_hermite_points}", flush=True)

    def rec(name, ms):
        print(f"{name:<52} {ms:9.4f} ms", flush=True)
        return ms

    Xb = jnp.asarray(model.X_data[:B])
    Yb = jnp.asarray(model.Y_data[:B])

    # --- the full step the bench row measures (grads + adam update);
    # carry = the batch, so every application is a unique dispatch
    tx = masked_optimizer(optax.adam(0.01), model)
    opt_state = tx.init(model)

    def full_step(c):
        def loss_fn(m):
            return -(m.elbo(c, Yb, key) + log_prior(m))
        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, _ = tx.update(grads, opt_state, model)
        s = sum(jnp.sum(u) for u in jax.tree_util.tree_leaves(updates))
        return c + 1e-12 * loss + 0.0 * s

    t_full = rec("full step (elbo fwd+bwd + adam)",
                 scan_time(full_step, Xb))

    def fwd_only(c):
        return c + 1e-12 * model.elbo(c, Yb, key)
    t_fwd = rec("elbo fwd", scan_time(fwd_only, Xb))

    # --- the GH likelihood tail in isolation, at the exact moment
    # shapes the step produces (S=1 -> (B, K) moments)
    Fmu = jnp.asarray(rng.randn(B, K).astype("float32"))
    Fvar = jnp.asarray((rng.rand(B, K) * 0.5 + 0.1).astype("float32"))
    lik = model.likelihood

    def ve_fwd(c):
        ve = lik.variational_expectations(c, Fvar, Yb)
        return c + 1e-12 * jnp.sum(ve)
    t_ve = rec("MultiClass var_exp fwd (B,K)", scan_time(ve_fwd, Fmu))

    def ve_fb(c):
        g = jax.grad(lambda m: jnp.sum(
            lik.variational_expectations(m, Fvar, Yb)))(c)
        return c + 1e-12 * g
    t_veg = rec("MultiClass var_exp fwd+bwd", scan_time(ve_fb, Fmu))

    # --- per-layer conditionals (the other cost centers)
    l1, l2 = model.layers
    H = jnp.asarray(rng.randn(B, 30).astype("float32"))

    def cond(layer, inp):
        def f(c):
            mean, var = layer.conditional_ND(c)
            return c + 1e-12 * (jnp.sum(mean) + jnp.sum(var))
        return f

    def cond_g(layer, inp):
        def f(c):
            def loss(x):
                mean, var = layer.conditional_ND(x)
                return jnp.sum(mean) + jnp.sum(var)
            return c + 1e-12 * jax.grad(loss)(c)
        return f

    rec("layer1 conditional fwd (784->30)", scan_time(cond(l1, Xb), Xb))
    t_c1 = rec("layer1 conditional fwd+bwd",
               scan_time(cond_g(l1, Xb), Xb))
    rec("layer2 conditional fwd (30->10)", scan_time(cond(l2, H), H))
    t_c2 = rec("layer2 conditional fwd+bwd", scan_time(cond_g(l2, H), H))

    # the D=784 cross-gram alone (MXU leg of layer 1)
    Zv = l1.Z.value

    def gram(c):
        return c + 1e-12 * jnp.sum(l1.kern.K(Zv, c))
    rec("Kuf gram (100x1000, D=784) fwd", scan_time(gram, Xb))

    print(f"\n# shares of the full step ({t_full:.2f} ms): "
          f"GH likelihood fwd+bwd {100 * t_veg / t_full:.1f}%, "
          f"layer1 cond {100 * t_c1 / t_full:.1f}%, "
          f"layer2 cond {100 * t_c2 / t_full:.1f}%, "
          f"elbo fwd {100 * t_fwd / t_full:.1f}%", flush=True)


if __name__ == "__main__":
    main()
