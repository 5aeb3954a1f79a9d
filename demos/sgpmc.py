#!/usr/bin/env python
"""Sparse GP MCMC demo: HMC over the inducing values of an SGPMC layer
(reference layers.py:249-260 — SGPMC_Layer exists to run MCMC over
*sparse* inducing outputs; the reference ships the layer but no demo).

A 1-D regression with M << N inducing points: the chain targets
ELBO + N(0,1) prior on the whitened q_mu (exactly the role of the
q_mu Gaussian prior at reference layers.py:272), runs as one jitted
lax.scan with dual-averaged step size, and the posterior predictive is
the mixture over thinned draws.  Prints a JSON summary.

``--sampler nuts`` swaps the fixed-length HMC kernel for the adaptive
No-U-Turn sampler (training/nuts.py); same target, same diagnostics.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=80)
    p.add_argument("--num-inducing", type=int, default=12)
    p.add_argument("--num-samples", type=int, default=500)
    p.add_argument("--num-burn", type=int, default=300)
    p.add_argument("--num-leapfrog", type=int, default=10)
    p.add_argument("--sampler", choices=["hmc", "nuts"], default="hmc")
    p.add_argument("--max-depth", type=int, default=7,
                   help="NUTS doubling cap (ignored for hmc)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.models.dgp import DGPBase
    from doubly_stochastic_dgp_tpu.training.hmc import (
        effective_sample_size, hmc_sample)
    from doubly_stochastic_dgp_tpu.utils.modules import log_prior

    rng = np.random.default_rng(args.seed)
    N, M = args.num_data, args.num_inducing
    X = np.sort(rng.uniform(-1, 1, (N, 1)), axis=0)
    f_true = np.sin(6 * X) * np.exp(-X)
    Y = f_true + rng.normal(size=(N, 1)) * 0.1
    Z = np.linspace(-1, 1, M)[:, None]
    Xs = np.linspace(-1.1, 1.1, 60)[:, None]

    kern = dsd.RBF.make(1, lengthscales=0.4)
    layer = dsd.SGPMCLayer.make(kern, Z, 1, white=True)
    model = DGPBase.make(X, Y, dsd.Gaussian.make(0.05), [layer],
                         num_samples=1)

    elbo_key = jax.random.PRNGKey(7)

    def log_post(m):
        return m.elbo(key=elbo_key) + log_prior(m)

    def freeze(path, param):          # sample only the inducing values
        return "q_mu" not in path

    if args.sampler == "nuts":
        from doubly_stochastic_dgp_tpu.training.nuts import nuts_sample
        samples, acc, rebuild, info = nuts_sample(
            model, log_post, jax.random.PRNGKey(args.seed),
            num_samples=args.num_samples, num_burn=args.num_burn,
            step_size=0.1, max_depth=args.max_depth, freeze=freeze)
        step_size, extra = info["step_size"], {
            "mean_tree_depth": round(info["mean_tree_depth"], 2),
            "divergences": info["divergences"]}
    else:
        samples, acc, rebuild, info = hmc_sample(
            model, log_post, jax.random.PRNGKey(args.seed),
            num_samples=args.num_samples, num_burn=args.num_burn,
            step_size=0.1, num_leapfrog=args.num_leapfrog,
            freeze=freeze, adapt_step_size=True)
        step_size, extra = info.step_size, {}

    thin = np.asarray(samples)[:: max(1, args.num_samples // 40)]
    predict = jax.jit(lambda v, x: rebuild(v).predict_y(x, S=1))
    mus, vars_ = [], []
    for v in thin:
        mu, var = predict(jnp.asarray(v), jnp.asarray(Xs))
        mus.append(np.asarray(mu)[0])
        vars_.append(np.asarray(var)[0])
    mu_mix = np.mean(mus, 0)
    var_mix = np.mean(np.asarray(vars_) + np.asarray(mus) ** 2, 0) \
        - mu_mix ** 2

    f_ref = np.sin(6 * Xs) * np.exp(-Xs)
    inside = np.mean((f_ref >= mu_mix - 1.96 * np.sqrt(var_mix))
                     & (f_ref <= mu_mix + 1.96 * np.sqrt(var_mix)))
    ess = effective_sample_size(np.asarray(samples)[None])
    print(json.dumps({
        "sampler": args.sampler,
        "accept_rate": round(float(acc), 3),
        "adapted_step_size": round(float(step_size), 4),
        "ess_min": int(ess.min()), "ess_median": int(np.median(ess)),
        "posterior_mean_rmse_vs_truth": round(float(
            np.sqrt(np.mean((mu_mix - f_ref) ** 2))), 4),
        "truth_coverage_95": round(float(inside), 3),
        **extra,
    }, indent=2))


if __name__ == "__main__":
    main()
