#!/usr/bin/env python
"""MNIST multiclass demo (reference demos/demo_mnist.ipynb): DGP with a
robust-max MultiClass(10) likelihood, M=100 inducing points, minibatch
1000 — DGP2 = 784->30->10, DGP3 = 784->30->30->10.

Offline note: MNIST cannot be downloaded in a zero-egress environment;
this script looks for a cached npz at --data (keys X, Y, Xs, Ys with X
in [0,1], Y integer labels) and otherwise runs on a synthetic
10-class problem with the same shapes scaled down (--synthetic)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_multiclass(N=6000, D=784, K=10, Ns=1000, seed=0):
    rng = np.random.RandomState(seed)
    W = rng.randn(D, K) * 0.5
    X = rng.rand(N + Ns, D)
    logits = X @ W + rng.randn(N + Ns, K) * 0.1
    Y = np.argmax(logits, 1)[:, None].astype(float)
    return X[:N], Y[:N], X[N:], Y[N:]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--minibatch", type=int, default=1000)
    p.add_argument("--data", default="data/mnist.npz")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the minibatch over all local devices "
                        "(BASELINE config #4)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate test accuracy every N iterations "
                        "(0 = final only)")
    args = p.parse_args()

    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.training.loop import fit
    from doubly_stochastic_dgp_tpu.training.monitor import PrintTimings

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"
    config.matmul_precision = "highest"   # f32-TPU MC trajectories track f64 with HIGHEST conditional contractions (PERF.md round-2 precision experiment); cost is amortized at accuracy-run shapes

    if not args.synthetic and os.path.isfile(args.data):
        from doubly_stochastic_dgp_tpu.data.datasets import load_mnist_npz
        d = load_mnist_npz(args.data)
        X, Y, Xs, Ys = d["X"], d["Y"], d["Xs"], d["Ys"]
    else:
        X, Y, Xs, Ys = synthetic_multiclass()
    X = X.astype("float32")
    Xs = Xs.astype("float32")
    K = 10

    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, 100, minit="points", seed=0)[0]

    D = X.shape[1]
    dims = [D] + [30] * (args.layers - 1)
    kernels = [dsd.RBF.make(d, lengthscales=2.0, variance=2.0)
               for d in dims]

    model = dsd.DGP.build(X, Y, Z, kernels, dsd.MultiClass.make(K),
                          num_outputs=K, num_samples=1)

    if args.data_parallel and len(jax.devices()) > 1:
        import optax
        from doubly_stochastic_dgp_tpu.parallel.dp import make_dp_train_step
        from doubly_stochastic_dgp_tpu.parallel.mesh import (make_mesh,
                                                             replicate,
                                                             shard_along)
        from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

        mesh = make_mesh()
        n_dev = len(jax.devices())
        B = args.minibatch - args.minibatch % n_dev
        model = replicate(model, mesh)
        tx = masked_optimizer(optax.adam(0.01), model)
        opt_state = tx.init(model)
        step = make_dp_train_step(tx, mesh, batch_size=B)
        key = jax.random.PRNGKey(0)
        rng = np.random.RandomState(0)
        hist = []
        import time as _t
        t0 = _t.perf_counter()
        for i in range(args.iterations):
            idx = rng.randint(0, X.shape[0], B)
            Xb = shard_along(jax.numpy.asarray(X[idx]), mesh)
            Yb = shard_along(jax.numpy.asarray(
                Y[idx].astype("float32")), mesh)
            model, opt_state, loss = step(model, opt_state, Xb, Yb,
                                          jax.random.fold_in(key, i))
            if (i + 1) % 100 == 0 or i == 0:
                hist.append({"iter": i + 1, "loss": float(loss),
                             "elapsed": _t.perf_counter() - t0})
                print(f"[dp x{n_dev}] iter {i+1}: loss {float(loss):.2f}",
                      flush=True)
    else:
        next_eval = {"at": args.eval_every or float("inf")}

        def acc_cb(step_i, m, loss, stats):
            if step_i >= next_eval["at"]:
                next_eval["at"] = step_i + args.eval_every
                a, l = _evaluate(m, Xs, Ys)
                stats["test_acc"] = a
                print(f"  iter {step_i}: test acc {a:.4f} "
                      f"loglik {l:.4f}", flush=True)

        model, hist = fit(model, args.iterations, learning_rate=0.01,
                          batch_size=args.minibatch,
                          callbacks=[PrintTimings(), acc_cb],
                          log_every=100)

    acc, ll = _evaluate(model, Xs, Ys, S=100)
    print(json.dumps({"accuracy": acc, "test_loglik": ll,
                      "layers": args.layers,
                      "final_loss": hist[-1]["loss"]}))


def _evaluate(model, Xs, Ys, S=25):
    """Predictive class probabilities, 1000-row batches (reference
    demo_mnist.ipynb cell 11) — the library metric.  The published
    numbers use S=100 (the final eval); mid-training callbacks use a
    cheaper S=25."""
    from doubly_stochastic_dgp_tpu.training.loop import \
        evaluate_classification

    r = evaluate_classification(model, Xs, Ys, S=S, batch_size=1000)
    return r["accuracy"], r["loglik"]


if __name__ == "__main__":
    main()
