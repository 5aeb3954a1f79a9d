#!/usr/bin/env python
"""UCI benchmark harness (reference demos/demo_regression_UCI.ipynb):
train the single-layer baselines (SGPR, SVGP, FITC — notebook cell 8)
and 1-3 layer DGPs (cell 15), optionally with the alternating
NatGrad+Adam loop (cell 17), and report test log-likelihood and RMSE
per model.

Offline environments use the shape-matched synthetic dataset unless the
real CSV is cached under --data-path.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="kin8nm")
    p.add_argument("--split", type=int, default=0)
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--max-layers", type=int, default=3)
    p.add_argument("--natgrad-gamma", type=float, default=None)
    p.add_argument("--data-path", default="data/")
    p.add_argument("--num-inducing", type=int, default=100)
    p.add_argument("--eval-samples", type=int, default=50)
    args = p.parse_args()

    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.data.datasets import (Datasets,
                                                         SyntheticRegression)
    from doubly_stochastic_dgp_tpu.training.loop import (evaluate_regression,
                                                         fit)
    from doubly_stochastic_dgp_tpu.training.optim import lbfgs_minimize

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"
    config.matmul_precision = "highest"   # f32-TPU MC trajectories track f64 with HIGHEST conditional contractions (PERF.md round-2 precision experiment); cost is amortized at accuracy-run shapes

    try:
        data = Datasets(args.data_path).all_datasets[args.dataset] \
            .get_data(split=args.split)
        real = True
    except Exception:
        data = SyntheticRegression(
            name=f"{args.dataset}_synth",
            data_path=args.data_path).get_data(split=args.split)
        real = False
    X, Y, Xs, Ys, Y_std = (data[k].astype("float32")
                           if k[0] in "XY" else data[k]
                           for k in ["X", "Y", "Xs", "Ys", "Y_std"])

    from scipy.cluster.vq import kmeans2
    M = min(args.num_inducing, X.shape[0])
    Z = kmeans2(X, M, minit="points", seed=0)[0]
    D = X.shape[1]
    results = {}

    def eval_deterministic(m, name):
        """Single-layer models: deterministic predictive moments."""
        from scipy.stats import norm
        pf = jax.jit(lambda mm, x: mm.predict_y(x))
        means, vars_ = [], []
        for mb in range(-(-len(Xs) // 1000)):
            mean, var = pf(m, Xs[mb * 1000:(mb + 1) * 1000])
            means.append(np.asarray(mean))
            vars_.append(np.asarray(var))
        mean = np.concatenate(means, 0)
        var = np.concatenate(vars_, 0)
        rmse = float(np.average(Y_std * np.mean((Ys - mean) ** 2) ** 0.5))
        ll = float(np.average(
            norm.logpdf(Ys * Y_std, mean * Y_std, var ** 0.5 * Y_std)))
        results[name] = {"loglik": ll, "rmse": rmse}
        print(f"{name:12s} loglik {ll:+.4f}  rmse {rmse:.4f}", flush=True)

    # --- single-layer baselines (notebook cell 8): L-BFGS like the
    # notebook's ScipyOptimizer
    kern = lambda: dsd.RBF.make(D)
    for name, build in [
        ("SGPR", lambda: dsd.SGPR.build(X, Y, kern(), Z.copy(),
                                        noise_variance=0.01)),
        ("FITC", lambda: dsd.GPRFITC.build(X, Y, kern(), Z.copy(),
                                           noise_variance=0.01)),
    ]:
        m = build()
        m, _ = lbfgs_minimize(lambda mm: -mm.log_likelihood(), m,
                              max_iters=min(300, args.iterations))
        eval_deterministic(m, name)

    m_svgp = dsd.SVGP.build(X, Y, kern(), dsd.Gaussian.make(0.01),
                            Z.copy())
    m_svgp, _ = fit(m_svgp, args.iterations, learning_rate=0.01,
                    batch_size=min(1000, X.shape[0]), log_every=200)
    eval_deterministic(m_svgp, "SVGP")

    # --- DGPs, 1..max_layers (notebook cell 15/17)
    for L in range(1, args.max_layers + 1):
        kernels = []
        for l in range(L):
            k = dsd.RBF.make(D)
            if l < L - 1:
                k = k + dsd.White.make(D, variance=2e-6, trainable=False)
            kernels.append(k)
        m = dsd.DGP.build(X, Y, Z.copy(), kernels, dsd.Gaussian.make(0.05),
                          num_samples=1)
        layers = list(m.layers)
        for i, layer in enumerate(layers[:-1]):
            layers[i] = layer.replace(
                q_sqrt=layer.q_sqrt.with_value(layer.q_sqrt.value * 1e-5))
        m = m.replace(layers=layers)
        m, _ = fit(m, args.iterations, learning_rate=0.01,
                   batch_size=min(1000, X.shape[0]),
                   natgrad_gamma=args.natgrad_gamma, log_every=200)
        res = evaluate_regression(m, Xs, Ys, Y_std,
                                  S=args.eval_samples, batch_size=1000)
        results[f"DGP{L}"] = {"loglik": res["loglik"], "rmse": res["rmse"]}
        print(f"{'DGP' + str(L):12s} loglik {res['loglik']:+.4f}  "
              f"rmse {res['rmse']:.4f}", flush=True)

    print(json.dumps({"dataset": args.dataset, "real_data": real,
                      "results": results}))


if __name__ == "__main__":
    main()
