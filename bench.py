#!/usr/bin/env python
"""Benchmark: ELBO optimization steps/sec on the BASELINE config —
kin8nm-shaped data (N=7372, D=8), 5-layer DGP, M=100 inducing points,
S=10 MC samples, minibatch 1000, Adam(0.01) (BASELINE.json; reference
run config demos/run_regression.py:45-69 + notebook cell 15).

Prints ONE JSON line:
  {"metric": ..., "value": steps/sec, "unit": "steps/sec",
   "vs_baseline": ratio}

vs_baseline is measured against the GPflow/TF1 CPU reference's training
rate for this exact config.  The reference's own published throughput
anecdote (demo_mnist.ipynb cell 15: ~0.23 it/s for SVGP M=500 on CPU) is
not config-matched, so the pinned number below was measured by timing
this same 5-layer/M=100/S=10/batch=1000 training step with JAX on this
container's CPU backend (a strictly *faster* stand-in for the TF1-graph
CPU reference — GPflow 1.x session.run steps are slower than an XLA CPU
fused step).  Re-measure with --with-cpu.
"""

import argparse
import json
import os
import sys
import time

# Pinned CPU-baseline steps/sec for this config (see module docstring).
# Measured on this container (JAX CPU, float32, same train step): the
# honest stand-in for "CPU GPflow" given zero egress. Update with
# --with-cpu.
CPU_BASELINE_STEPS_PER_SEC = 1.07


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def build(args):
    import numpy as np
    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"
    # --pallas forces the fused conditional everywhere; default False —
    # end-to-end measurements show XLA ahead in-context at all shapes
    # tried (PERF.md round 3; scripts/bench_large_m.py)
    config.use_pallas = True if args.pallas else False

    from doubly_stochastic_dgp_tpu.data.datasets import (Datasets,
                                                         SyntheticRegression)
    try:
        data = Datasets("data/").all_datasets["kin8nm"].get_data(split=0)
        real = True
    except Exception:
        data = SyntheticRegression(N=8192, D=8).get_data(split=0)
        real = False
    X, Y = data["X"].astype("float32"), data["Y"].astype("float32")

    from scipy.cluster.vq import kmeans2
    Z = kmeans2(X, 100, minit="points", seed=0)[0]

    D = X.shape[1]
    L = args.layers
    kernels = []
    for l in range(L):
        k = dsd.RBF.make(D)
        if l < L - 1:
            k = k + dsd.White.make(D, variance=2e-6, trainable=False)
        kernels.append(k)

    model = dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.05),
                          num_samples=args.num_samples)
    # near-deterministic inner layers (reference run_regression.py:71-74)
    layers = list(model.layers)
    for i, layer in enumerate(layers[:-1]):
        layers[i] = layer.replace(
            q_sqrt=layer.q_sqrt.with_value(layer.q_sqrt.value * 1e-5))
    model = model.replace(layers=layers)
    return model, data, real


def measure(model, batch_size, steps, warmup=5, inner_steps=1):
    import jax
    import optax
    from doubly_stochastic_dgp_tpu.training.loop import (make_scan_train_step,
                                                         make_sgd_train_step)
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    tx = masked_optimizer(optax.adam(0.01), model)
    opt_state = tx.init(model)
    if inner_steps > 1:
        step = make_scan_train_step(tx, batch_size=batch_size,
                                    inner_steps=inner_steps)
    else:
        step = make_sgd_train_step(tx, batch_size=batch_size)
    key = jax.random.PRNGKey(0)

    n_calls = max(1, steps // inner_steps)
    for i in range(max(1, warmup // inner_steps)):
        model, opt_state, loss = step(model, opt_state,
                                      jax.random.fold_in(key, i))
    loss.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_calls):
        model, opt_state, loss = step(model, opt_state,
                                      jax.random.fold_in(key, 1000 + i))
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    return n_calls * inner_steps / dt, float(loss), model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=1000)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--pallas", action="store_true", default=False)
    p.add_argument("--inner-steps", type=int, default=50,
                   help="steps per XLA dispatch (lax.scan amortization)")
    p.add_argument("--with-cpu", action="store_true",
                   help="also measure the CPU backend for vs_baseline")
    args = p.parse_args()

    import jax
    _enable_compile_cache()
    model, data, real = build(args)
    platform = jax.devices()[0].platform

    rate, loss, model = measure(model, args.batch, args.steps,
                                inner_steps=args.inner_steps)

    baseline = CPU_BASELINE_STEPS_PER_SEC
    if args.with_cpu:
        cpu_devs = jax.devices("cpu")
        # re-run the same measurement pinned to CPU
        with jax.default_device(cpu_devs[0]):
            m2, _, _ = build(args)
            baseline, _, _ = measure(m2, args.batch,
                                     max(10, args.steps // 10),
                                     inner_steps=args.inner_steps)

    out = {
        "metric": "elbo_steps_per_sec (kin8nm-shape, 5-layer DGP, "
                  "M=100, S=10, batch=1000)",
        "value": round(rate, 3),
        "unit": "steps/sec",
        "vs_baseline": round(rate / baseline, 3),
        "platform": platform,
        "real_kin8nm": real,
        "final_loss": round(loss, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
