#!/usr/bin/env python
"""End-to-end training throughput at the fused-Pallas win region.

Measures whether the fused Pallas conditional converts its isolated
probe numbers (scripts/probe_crossover.py) into a *training-loop* win:
a 2-layer regression DGP at M in {256, 512}, batch 8192, S=5, Adam,
scanned steps, with use_pallas in (False, True, 'saved') — explicit
opt-ins only; the 'auto' shape gate was removed from the layer surface
(round-3 VERDICT weak #4).  Verdict on record (PERF.md): the kernel
loses end-to-end at every measured shape; config.use_pallas stays
False.

Usage:  python scripts/bench_large_m.py [--steps 300] [--m 256 512]
Prints one JSON line per (M, mode) plus a speedup summary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, measure  # noqa: E402


def build(M, use_pallas, num_samples):
    import numpy as np
    from scipy.cluster.vq import kmeans2

    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config
    from doubly_stochastic_dgp_tpu.data.datasets import SyntheticRegression

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"
    config.use_pallas = use_pallas

    data = SyntheticRegression(N=16384, D=8).get_data(split=0)
    X, Y = data["X"].astype("float32"), data["Y"].astype("float32")
    Z = kmeans2(X, M, minit="points", seed=0)[0]

    D = X.shape[1]
    kernels = [dsd.RBF.make(D) + dsd.White.make(D, variance=2e-6,
                                                trainable=False),
               dsd.RBF.make(D)]
    model = dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.05),
                          num_samples=num_samples)
    layers = list(model.layers)
    layers[0] = layers[0].replace(
        q_sqrt=layers[0].q_sqrt.with_value(layers[0].q_sqrt.value * 1e-5))
    return model.replace(layers=layers)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--num-samples", type=int, default=5)
    p.add_argument("--inner-steps", type=int, default=25)
    p.add_argument("--m", type=int, nargs="+", default=[256, 512])
    args = p.parse_args()

    import jax
    _enable_compile_cache()
    platform = jax.devices()[0].platform

    results = {}
    for M in args.m:
        for mode in (False, True, "saved"):
            model = build(M, mode, args.num_samples)
            rate, loss, _ = measure(model, args.batch, args.steps,
                                    inner_steps=args.inner_steps)
            results[(M, mode)] = rate
            print(json.dumps({
                "metric": f"elbo_steps_per_sec (2-layer DGP, M={M}, "
                          f"S={args.num_samples}, batch={args.batch})",
                "use_pallas": mode, "value": round(rate, 2),
                "unit": "steps/sec", "platform": platform,
                "final_loss": round(loss, 2),
            }), flush=True)
    for M in args.m:
        xla, pallas = results[(M, False)], results[(M, True)]
        saved = results[(M, "saved")]
        print(json.dumps({"summary": f"M={M}",
                          "pallas_vs_xla": round(pallas / xla, 3),
                          "saved_vs_xla": round(saved / xla, 3),
                          "saved_vs_pallas": round(saved / pallas, 3)}))


if __name__ == "__main__":
    main()
