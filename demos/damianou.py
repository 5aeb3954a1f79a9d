#!/usr/bin/env python
"""DGPDamianou demo: the Damianou & Lawrence (2013) fully-collapsed deep
GP — the model the reference left as a TODO stub
(/root/reference/doubly_stochastic_dgp/model_zoo.py:91-104) — trained on
a held-out regression problem and compared against the collapsed
single-layer SGPR baseline and the doubly-stochastic MC DGP of the same
depth.

The interesting contrast: the Damianou bound is deterministic (no MC
noise — psi statistics integrate the hidden uncertainty analytically)
but full-batch and O(N) in variational parameters; the Salimbeni MC
bound is stochastic but minibatchable.  On the compositional synthetic
both deep models should beat the single-layer baseline on held-out
log-likelihood.

float32-on-TPU note: the collapsed bound pairs +-||Y||^2/(2 sigma^2)
terms whose f32 significance runs out once the learned likelihood
variance is small (cond(B) ~ 1/sigma^2 crosses 1/eps_f32) — the
reference family computes these bounds in float64 for the same reason.
The TPU path here is NaN-proof (variance floor, PSD Gram assembly,
jitter ladders) and tracks the float64 trajectory through the early/mid
phase (~1000 iterations at these shapes); run --float64 on CPU for
fully-converged numbers.

Usage:
  python demos/damianou.py --n 1500 --iterations 1500
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
    p.add_argument("--n", type=int, default=1500, help="training rows")
    p.add_argument("--dims", type=int, default=4)
    p.add_argument("--inducing", type=int, default=50)
    p.add_argument("--iterations", type=int, default=1500)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--float64", action="store_true",
                   help="force float64 (CPU parity mode)")
    args = p.parse_args()

    import jax
    import optax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.data.datasets import (
        CompositionalRegression)
    from doubly_stochastic_dgp_tpu.models.layers import SGPRLayer
    from doubly_stochastic_dgp_tpu.models.mean_functions import Zero
    from doubly_stochastic_dgp_tpu.training.loop import evaluate_regression
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and not args.float64:
        dsd.set_default_float("float32")
        dsd.set_default_jitter(1e-5)
        config.solve_mode = "inverse"
        config.matmul_precision = "highest"   # f32-TPU MC trajectories track f64 with HIGHEST conditional contractions (PERF.md round-2 precision experiment); cost is amortized at accuracy-run shapes
    else:
        dsd.set_default_float("float64")
        dsd.set_default_jitter(1e-8)

    data = CompositionalRegression(N=args.n + args.n // 9,
                                   D=args.dims).get_data(split=0)
    X, Y = data["X"], data["Y"]
    Xs, Ys, Y_std = data["Xs"], data["Ys"], data["Y_std"]
    dtype = "float64" if (args.float64 or not on_tpu) else "float32"
    X, Y, Xs, Ys = (a.astype(dtype) for a in (X, Y, Xs, Ys))
    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, min(args.inducing, len(X) // 2), minit="points",
                seed=0)[0]
    D = X.shape[1]

    def fit(model, label, ng_last=False):
        tx = masked_optimizer(optax.adam(args.lr), model)
        state = tx.init(model)

        @jax.jit
        def step(model, state, key):
            loss, grads = jax.value_and_grad(
                lambda m: -m.elbo(key=key))(model)
            updates, state = tx.update(grads, state, model)
            return optax.apply_updates(model, updates), state, loss

        key = jax.random.PRNGKey(0)
        t0 = time.time()
        for i in range(args.iterations):
            model, state, loss = step(model, state,
                                      jax.random.fold_in(key, i))
            if i % max(1, args.iterations // 10) == 0:
                print(f"[{label}] iter {i}: loss {float(loss):.2f}")
        dt = time.time() - t0
        res = evaluate_regression(model, Xs, Ys, Y_std, S=100)
        res.update(label=label, seconds=round(dt, 1),
                   final_loss=round(float(loss), 2))
        # stream each model's result as it completes (long f64 CPU runs
        # can be killed mid-way; the finished models' numbers survive)
        print(json.dumps(res, default=float), flush=True)
        return res

    results = []

    # 1-layer collapsed SGPR (the Titsias baseline)
    lay = SGPRLayer.make(dsd.RBF.make(D), Z, Y.shape[1],
                         Zero(output_dim=Y.shape[1]))
    m_sgpr = dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05), [lay])
    results.append(fit(m_sgpr, "SGPR (collapsed, 1 layer)"))

    # 2-layer Damianou-Lawrence
    kerns = [dsd.RBF.make(D), dsd.RBF.make(D)]
    m_dam = dsd.DGPDamianou.build(X, Y, Z, kerns, dsd.Gaussian.make(0.05))
    results.append(fit(m_dam, "DGPDamianou (2 layers)"))

    # 2-layer doubly-stochastic MC DGP (Salimbeni-Deisenroth)
    kerns = []
    for l in range(2):
        k = dsd.RBF.make(D)
        if l < 1:
            k = k + dsd.White.make(D, variance=2e-6, trainable=False)
        kerns.append(k)
    m_dgp = dsd.DGP.build(X, Y, Z, kerns, dsd.Gaussian.make(0.05),
                          num_samples=5)
    layers = list(m_dgp.layers)
    layers[0] = layers[0].replace(
        q_sqrt=layers[0].q_sqrt.with_value(layers[0].q_sqrt.value * 1e-5))
    m_dgp = m_dgp.replace(layers=layers)
    results.append(fit(m_dgp, "DGP2 (doubly stochastic MC)"))

    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
