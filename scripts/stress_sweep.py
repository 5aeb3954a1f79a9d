#!/usr/bin/env python
"""f32-TPU long-run stress sweep across model families (PERF.md
methodology, made reusable): train every family for a stress horizon at
the FRAMEWORK-DEFAULT numerics (float32, solve_mode='inverse',
matmul_precision from config — 'mixed' since round-2) and require

  1. every logged loss finite,
  2. final loss < first loss (training actually progresses),
  3. a finite prediction/evaluation pass at the end.

One JSON line per family; exits non-zero if any family fails.  Run on
the real chip:

  python scripts/stress_sweep.py                # all families, 2k iters
  python scripts/stress_sweep.py --families hetero quad_1d --scale 0.1
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _kerns(dsd, D, L, white=True):
    out = []
    for l in range(L):
        k = dsd.RBF.make(D)
        if white and l < L - 1:
            k = k + dsd.White.make(D, variance=2e-6, trainable=False)
        out.append(k)
    return out


def build_hetero(dsd, rng):
    N, D = 800, 2
    X = rng.randn(N, D)
    noise = 0.02 + 0.3 * (X[:, :1] > 0)
    Y = np.sin(X[:, :1]) + rng.randn(N, 1) * noise
    layers = dsd.init_layers_linear(X, Y, X[:30], _kerns(dsd, D, 2),
                                    num_outputs=2)
    return dsd.DGPHeteroscedastic.make(X, Y, dsd.Gaussian.make(0.05),
                                       layers, num_samples=5), X, Y


def build_quad_1d(dsd, rng):
    # ill-conditioned 1-D (near-collinear Z) — the regime that caught
    # the P-form inverse divergence
    N = 200
    X = rng.randn(N, 1)
    Y = np.sign(np.sin(3 * X)) * 0.5 + 0.05 * rng.randn(N, 1)
    layers = dsd.init_layers_linear(X, Y, X[:20],
                                    [dsd.RBF.make(1), dsd.RBF.make(1)],
                                    num_outputs=1)
    return dsd.DGPQuad.build(X, Y, dsd.Gaussian.make(0.05), layers,
                             H=20), X, Y


def build_multiclass(dsd, rng):
    N, D, K = 2000, 784, 10
    W = rng.randn(D, K) * 0.5
    X = rng.rand(N, D)
    Y = np.argmax(X @ W + rng.randn(N, K) * 0.1, 1)[:, None] * 1.0
    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X.astype("float64"), 100, minit="points", seed=0)[0]
    kerns = [dsd.RBF.make(D, lengthscales=2.0, variance=2.0),
             dsd.RBF.make(30, lengthscales=2.0, variance=2.0)]
    return dsd.DGP.build(X, Y, Z, kerns, dsd.MultiClass.make(K),
                         num_outputs=K, num_samples=1), X, Y


def build_bernoulli(dsd, rng):
    N, D = 600, 2
    X = rng.randn(N, D)
    Y = (np.sin(2 * X[:, :1]) + 0.3 * rng.randn(N, 1) > 0) * 1.0
    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, 30, minit="points", seed=0)[0]
    return dsd.DGP.build(X, Y, Z, _kerns(dsd, D, 2),
                         dsd.Bernoulli.make(), num_samples=5), X, Y


def build_studentt(dsd, rng):
    N, D = 600, 2
    X = rng.randn(N, D)
    Y = np.sin(2 * X[:, :1]) + 0.1 * rng.standard_t(3.0, size=(N, 1))
    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, 30, minit="points", seed=0)[0]
    return dsd.DGP.build(X, Y, Z, _kerns(dsd, D, 2),
                         dsd.StudentT.make(), num_samples=5), X, Y


def build_input_prop(dsd, rng):
    N, D = 600, 2
    X = rng.randn(N, D)
    Y = np.sin(2 * X[:, :1]) + 0.1 * rng.randn(N, 1)
    # input-prop stacks: layer l>0 sees (hidden_dim + D) inputs
    kerns = [dsd.RBF.make(D), dsd.RBF.make(1 + D)]
    layers = dsd.init_layers_input_prop(X, Y, X[:25].copy(), kerns)
    return dsd.DGPBase.make(X, Y, dsd.Gaussian.make(0.05), layers,
                            num_samples=5), X, Y


def build_collapsed_gpr(dsd, rng):
    from doubly_stochastic_dgp_tpu import GPRLayer
    N, D = 300, 1
    X = rng.rand(N, D) * 2 - 1
    Y = np.sin(3 * X) + rng.randn(N, D) * 0.1
    Z = np.linspace(-1, 1, 20)[:, None]
    layers = dsd.init_layers_linear(
        X, Y, Z, [dsd.RBF.make(1, lengthscales=0.4),
                  dsd.RBF.make(1, lengthscales=0.4)])
    last = GPRLayer.make(layers[-1].kern, layers[-1].mean_function, 1)
    return dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05),
                                 layers[:-1] + [last]), X, Y


def build_deep5(dsd, rng):
    # the headline family at full depth
    N, D = 2000, 8
    X = rng.rand(N, D)
    W = rng.randn(D, 1)
    Y = np.sin(3 * (X @ W)) + 0.05 * rng.randn(N, 1)
    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, 100, minit="points", seed=0)[0]
    m = dsd.DGP.build(X, Y, Z, _kerns(dsd, D, 5),
                      dsd.Gaussian.make(0.05), num_samples=10)
    layers = list(m.layers)
    for i, layer in enumerate(layers[:-1]):
        layers[i] = layer.replace(
            q_sqrt=layer.q_sqrt.with_value(layer.q_sqrt.value * 1e-5))
    return m.replace(layers=layers), X, Y


def run_mcmc_family(name, scale):
    """Sampler families: f32-TPU MCMC robustness (leapfrog, dual
    averaging, and NUTS tree-building all run in the framework-default
    numerics on-chip; every CPU test is f64).  ok = finite samples,
    healthy acceptance, and the chain actually moving."""
    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.models.dgp import DGPBase
    from doubly_stochastic_dgp_tpu.utils.modules import log_prior

    rng = np.random.RandomState(0)
    N, M = 60, 10
    X = np.sort(rng.uniform(-1, 1, (N, 1)), axis=0)
    Y = np.sin(6 * X) * np.exp(-X) + rng.normal(size=(N, 1)) * 0.1
    Z = np.linspace(-1, 1, M)[:, None]
    layer = dsd.SGPMCLayer.make(dsd.RBF.make(1, lengthscales=0.4), Z, 1,
                                white=True)
    model = DGPBase.make(X, Y, dsd.Gaussian.make(0.05), [layer],
                         num_samples=1)
    elbo_key = jax.random.PRNGKey(7)

    def log_post(m):
        return m.elbo(key=elbo_key) + log_prior(m)

    def freeze(path, param):
        return "q_mu" not in path

    n = max(50, int(400 * scale))
    t0 = time.perf_counter()
    if name == "nuts_sgpmc":
        from doubly_stochastic_dgp_tpu.training.nuts import nuts_sample
        samples, acc, _, info = nuts_sample(
            model, log_post, jax.random.PRNGKey(0), num_samples=n,
            num_burn=n // 2, step_size=0.1, max_depth=6, freeze=freeze)
        extra = {"divergences": int(info["divergences"]),
                 "mean_tree_depth": round(info["mean_tree_depth"], 2)}
    else:
        from doubly_stochastic_dgp_tpu.training.hmc import hmc_sample
        samples, acc, _, info = hmc_sample(
            model, log_post, jax.random.PRNGKey(0), num_samples=n,
            num_burn=n // 2, step_size=0.1, num_leapfrog=10,
            freeze=freeze, adapt_step_size=True)
        extra = {"adapted_step_size": round(float(info.step_size), 4)}
    dt = time.perf_counter() - t0
    s = np.asarray(samples)
    finite = bool(np.isfinite(s).all())
    moved = bool(s.std(0).max() > 0.05)
    ok = finite and moved and 0.3 < acc <= 1.0
    print(json.dumps({
        "family": name, "samples": n, "ok": ok,
        "samples_finite": finite, "chain_moved": moved,
        "accept": round(float(acc), 3), "seconds": round(dt, 1),
        **extra,
    }), flush=True)
    return ok


MCMC_FAMILIES = {"hmc_sgpmc", "nuts_sgpmc"}

FAMILIES = {
    "hetero": (build_hetero, 2000, {}),
    "quad_1d": (build_quad_1d, 1500, {}),
    "multiclass": (build_multiclass, 2000, {"batch_size": 500}),
    "bernoulli": (build_bernoulli, 2000, {}),
    "studentt": (build_studentt, 2000, {}),
    "input_prop": (build_input_prop, 2000, {}),
    "collapsed_gpr": (build_collapsed_gpr, 2000, {}),
    "deep5": (build_deep5, 2000, {"batch_size": 1000}),
    "natgrad": (build_deep5, 1000, {"batch_size": 1000,
                                    "natgrad_gamma": 0.1}),
    # sampler families live in MCMC_FAMILIES / run_mcmc_family
}


def run_family(name, scale):
    import jax
    import jax.numpy as jnp
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.training.loop import fit

    builder, iters, fit_kw = FAMILIES[name]
    iters = max(20, int(iters * scale))
    rng = np.random.RandomState(0)
    model, X, Y = builder(dsd, rng)
    t0 = time.perf_counter()
    model, hist = fit(model, iters, learning_rate=0.01,
                      log_every=max(10, iters // 20), **fit_kw)
    dt = time.perf_counter() - t0
    losses = [h["loss"] for h in hist]
    finite = all(np.isfinite(l) for l in losses)
    improved = losses[-1] < losses[0]

    # evaluability: a finite predictive pass on held-in points
    Xs = jnp.asarray(X[:64])
    Ys = jnp.asarray(Y[:64])
    key = jax.random.PRNGKey(1)
    dens = model.predict_density(Xs, Ys, 20, key=key)
    eval_finite = bool(np.isfinite(np.asarray(dens)).all())

    ok = finite and improved and eval_finite
    print(json.dumps({
        "family": name, "iterations": iters, "ok": ok,
        "losses_finite": finite, "improved": improved,
        "eval_finite": eval_finite,
        "first_loss": round(losses[0], 2),
        "final_loss": round(losses[-1], 2),
        "seconds": round(dt, 1),
    }), flush=True)
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--families", nargs="+",
                   default=None,
                   help="default: all training + sampler families")
    p.add_argument("--scale", type=float, default=1.0,
                   help="iteration-budget multiplier (0.01 for smoke)")
    p.add_argument("--precision", default=None,
                   help="override config.matmul_precision for the sweep")
    args = p.parse_args()

    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config

    if jax.default_backend() in ("tpu", "axon"):
        dsd.set_default_float("float32")
        dsd.set_default_jitter(1e-5)
        config.solve_mode = "inverse"
    if args.precision is not None:
        config.matmul_precision = args.precision
    print(json.dumps({"backend": jax.default_backend(),
                      "precision": config.matmul_precision,
                      "solve_mode": config.solve_mode}), flush=True)

    families = (args.families if args.families is not None
                else list(FAMILIES) + sorted(MCMC_FAMILIES))
    ok = True
    for name in families:
        if name in MCMC_FAMILIES:
            ok = run_mcmc_family(name, args.scale) and ok
        else:
            ok = run_family(name, args.scale) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
