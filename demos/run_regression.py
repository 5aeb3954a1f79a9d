#!/usr/bin/env python
"""UCI regression experiment runner — the reference paper's harness
(/root/reference/demos/run_regression.py) rebuilt on the TPU-native
stack: same model config (per-layer RBF(D) + White(D, 2e-6) inter-layer
noise, M=100 kmeans inducing points, num_samples=1, near-deterministic
inner q_sqrt init, Adam(0.01), minibatch 10000, 10k iters), with JSONL/
TensorBoard monitoring, checkpoints, and streaming test RMSE/NLL
(S=100 in 1000-row batches) every 100 iterations.

Usage: python run_regression.py <dataset> <L> <split>
       [--iterations N] [--data-path P] [--results P] [--synthetic]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("L", type=int)
    p.add_argument("split", type=int)
    p.add_argument("--iterations", type=int, default=10000)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--minibatch", type=int, default=10000)
    p.add_argument("--data-path", default="data/")
    p.add_argument("--results", default="results/")
    p.add_argument("--synthetic", action="store_true",
                   help="use shape-matched synthetic data (offline)")
    p.add_argument("--float64", action="store_true")
    p.add_argument("--natgrad-gamma", type=float, default=None)
    args = p.parse_args()

    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.data.datasets import (Datasets,
                                                         SyntheticRegression)
    from doubly_stochastic_dgp_tpu.training.checkpoint import save_checkpoint
    from doubly_stochastic_dgp_tpu.training.loop import (evaluate_regression,
                                                         fit)
    from doubly_stochastic_dgp_tpu.training.monitor import (JsonlLogger,
                                                            PrintTimings)

    if args.float64:
        dsd.set_default_float("float64")
    else:
        dsd.set_default_float("float32")
        dsd.set_default_jitter(1e-5)
        config.solve_mode = "inverse"
        config.matmul_precision = "highest"   # f32-TPU MC trajectories track f64 with HIGHEST conditional contractions (PERF.md round-2 precision experiment); cost is amortized at accuracy-run shapes

    if args.synthetic:
        ds = SyntheticRegression(name=f"{args.dataset}_synth",
                                 data_path=args.data_path)
        data = ds.get_data(split=args.split)
    else:
        data = Datasets(args.data_path).all_datasets[args.dataset] \
            .get_data(split=args.split)
    X, Y, Xs, Ys, Y_std = (data[k] for k in ["X", "Y", "Xs", "Ys", "Y_std"])
    dtype = "float64" if args.float64 else "float32"
    X, Y, Xs, Ys = (a.astype(dtype) for a in (X, Y, Xs, Ys))

    print(f"##### {args.dataset} L={args.L} split={args.split}  "
          f"N={X.shape[0]} D={X.shape[1]} Ns={Xs.shape[0]}")

    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, min(100, X.shape[0]), minit="points", seed=0)[0]

    D = X.shape[1]
    kernels = []
    for l in range(args.L):
        k = dsd.RBF.make(D)
        if l < args.L - 1:
            k = k + dsd.White.make(D, variance=2e-6, trainable=False)
        kernels.append(k)

    mb = args.minibatch if X.shape[0] > args.minibatch else None
    model = dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.05),
                          num_samples=1)
    # near-deterministic inner layers (reference run_regression.py:71-74)
    layers = list(model.layers)
    for i, l in enumerate(layers[:-1]):
        layers[i] = l.replace(q_sqrt=l.q_sqrt.with_value(
            l.q_sqrt.value * 1e-5))
    model = model.replace(layers=layers)

    outdir = os.path.join(args.results,
                          f"{args.dataset}_L{args.L}_split{args.split}")
    os.makedirs(outdir, exist_ok=True)
    logger = JsonlLogger(os.path.join(outdir, "train.jsonl"))

    def test_metrics_cb(step, m, loss, stats):
        res = evaluate_regression(m, Xs, Ys, Y_std, S=100,
                                  batch_size=1000)
        stats.update({"test_rmse": res["rmse"], "test_nll": res["nll"]})
        save_checkpoint(os.path.join(outdir, "checkpoints"), m, step)

    model, hist = fit(model, args.iterations, learning_rate=0.01,
                      batch_size=mb, natgrad_gamma=args.natgrad_gamma,
                      callbacks=[PrintTimings(), test_metrics_cb, logger],
                      log_every=args.log_every)

    final = evaluate_regression(model, Xs, Ys, Y_std, S=100,
                                batch_size=1000)
    print(json.dumps({"dataset": args.dataset, "L": args.L,
                      "split": args.split, **final}))


if __name__ == "__main__":
    main()
