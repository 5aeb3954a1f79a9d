#!/usr/bin/env python
"""large_M throughput at the staging-precision tiers (round-3).

PERF.md's M=512 scan profile measured the three v5e f32 matmul
algorithms at ~124 (default, 1-pass bf16-class), ~66 (HIGH, 3-pass)
and ~32 TF/s (HIGHEST, 6-pass).  'mixed' — the framework default —
pins the four staging contractions of the staged-inverse conditional
(G = Li Kuf, alpha, C, mean) at HIGHEST; 'mixed_high' (experimental)
pins the same set at HIGH.  This probe measures the end-to-end
large_M training step (M=512, batch 8192, L=2 — bench.py's large_M
row) at each tier so the speed side of the promote/reject decision is
on record; the accuracy side is scripts/precision_experiment.py
--variants mixed mixed_high.

Usage:  python scripts/probe_mixed_high.py [--steps 60] [--m 512]
Prints one JSON line per (M, precision).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (_enable_compile_cache, _regression_data,  # noqa: E402
                   achievable_ceiling, build_regression, measure,
                   step_flops)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--inner-steps", type=int, default=20)
    p.add_argument("--m", type=int, nargs="+", default=[512])
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--precisions", nargs="+",
                   default=["mixed", "mixed_high", "default"])
    args = p.parse_args()

    import jax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu import with_config
    from doubly_stochastic_dgp_tpu.config import config

    _enable_compile_cache()
    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"
    X, Y, real = _regression_data()

    for M in args.m:
        for prec in args.precisions:
            model = with_config(
                build_regression(X, Y, args.layers, M, 1),
                precision=prec)
            flops = step_flops(model, M, 1, args.batch)
            rate, loss, _ = measure(model, args.batch, args.steps,
                                    inner_steps=args.inner_steps)
            sustained = flops * rate
            print(json.dumps({
                "backend": jax.default_backend(), "M": M,
                "precision": prec, "batch": args.batch,
                "steps_per_sec": round(rate, 2),
                "tflops_sustained": round(sustained / 1e12, 2),
                "pct_of_achievable": round(
                    100 * sustained / achievable_ceiling(M), 1),
                "final_loss": round(loss, 2), "real_data": real,
            }), flush=True)


if __name__ == "__main__":
    main()
