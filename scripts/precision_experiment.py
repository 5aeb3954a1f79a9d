#!/usr/bin/env python
"""f32-TPU vs f64 MC-trajectory precision experiment (round-1 VERDICT
next-step #2).

The Damianou-demo DGP2 MC config (compositional synthetic N=1500, D=4,
M=50, S=5, Adam 0.01, full batch — demos/damianou.py) showed a large
mid-horizon loglik gap at 1000 iters: TPU f32 -0.016 vs CPU f64 +0.600
(RESULTS.md).  This script runs the {default, HIGHEST-precision
conditional} x {seeds} x {1k, 3k iters} matrix so the gap can be
attributed to (a) bf16-class matmul precision in the conditional, or
(b) seed/MC-trajectory variance.

Run on TPU (default platform) for the f32 rows and with --float64 on
CPU for the reference rows; each (variant, seed) prints one JSON line.

Usage:
  python scripts/precision_experiment.py --seeds 0 1 2
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/precision_experiment.py --float64 --seeds 0 1 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1500)
    p.add_argument("--dims", type=int, default=4)
    p.add_argument("--inducing", type=int, default=50)
    p.add_argument("--iterations", type=int, default=3000)
    p.add_argument("--eval-at", type=int, nargs="+", default=[1000, 3000])
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--variants", nargs="+",
                   default=["default", "highest"])
    p.add_argument("--float64", action="store_true")
    args = p.parse_args()

    import jax
    import optax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu import with_config
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.data.datasets import (
        CompositionalRegression)
    from doubly_stochastic_dgp_tpu.training.loop import evaluate_regression
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if args.float64:
        dsd.set_default_float("float64")
        dsd.set_default_jitter(1e-8)
        dtype = "float64"
    else:
        dsd.set_default_float("float32")
        dsd.set_default_jitter(1e-5)
        config.solve_mode = "inverse"
        dtype = "float32"

    data = CompositionalRegression(N=args.n + args.n // 9,
                                   D=args.dims).get_data(split=0)
    X, Y = data["X"].astype(dtype), data["Y"].astype(dtype)
    Xs, Ys, Y_std = data["Xs"].astype(dtype), data["Ys"].astype(dtype), \
        data["Y_std"]
    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, min(args.inducing, len(X) // 2), minit="points",
                seed=0)[0]
    D = X.shape[1]

    def build(precision):
        kerns = []
        for l in range(2):
            k = dsd.RBF.make(D)
            if l < 1:
                k = k + dsd.White.make(D, variance=2e-6, trainable=False)
            kerns.append(k)
        m = dsd.DGP.build(X, Y, Z.copy(), kerns, dsd.Gaussian.make(0.05),
                          num_samples=5)
        layers = list(m.layers)
        layers[0] = layers[0].replace(
            q_sqrt=layers[0].q_sqrt.with_value(
                layers[0].q_sqrt.value * 1e-5))
        m = m.replace(layers=layers)
        if precision != "default":
            m = with_config(m, precision=precision)
        return m

    variants = ["default"] if args.float64 else args.variants
    for variant in variants:
        for seed in args.seeds:
            model = build(variant)
            tx = masked_optimizer(optax.adam(0.01), model)
            state = tx.init(model)

            @jax.jit
            def step(model, state, key):
                loss, grads = jax.value_and_grad(
                    lambda m: -m.elbo(key=key))(model)
                updates, state = tx.update(grads, state, model)
                return optax.apply_updates(model, updates), state, loss

            key = jax.random.PRNGKey(seed)
            evals = {}
            t0 = None
            for i in range(args.iterations):
                model, state, loss = step(model, state,
                                          jax.random.fold_in(key, i))
                if i == 0:
                    loss.block_until_ready()
                    t0 = time.perf_counter()   # exclude compile
                if (i + 1) in args.eval_at:
                    loss.block_until_ready()
                    t_pause = time.perf_counter()
                    r = evaluate_regression(model, Xs, Ys, Y_std, S=100,
                                            seed=seed)
                    evals[i + 1] = {"loglik": round(r["loglik"], 4),
                                    "rmse": round(r["rmse"], 4)}
                    t0 += time.perf_counter() - t_pause
            loss.block_until_ready()
            rate = (args.iterations - 1) / (time.perf_counter() - t0)
            print(json.dumps({
                "backend": jax.default_backend(), "dtype": dtype,
                "variant": variant, "seed": seed,
                "steps_per_sec": round(rate, 1),
                "final_loss": round(float(loss), 2),
                "evals": evals,
            }), flush=True)


if __name__ == "__main__":
    main()
