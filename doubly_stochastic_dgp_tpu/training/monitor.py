"""Monitoring: timing, scalar logging (CSV/JSONL + optional TensorBoard),
and profiler hooks.

Rebuilds the gpflow_monitor surface used by the reference harness
(/root/reference/demos/run_regression.py:83-133): PrintTimings,
ModelTensorBoard/LmlTensorBoard scalar streams, and the custom
test-RMSE/NLL task.  TensorBoard is optional (torch.utils.tensorboard
when present); the always-available sink is JSONL, plus
jax.profiler trace capture for TPU performance work.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

__all__ = ["PrintTimings", "JsonlLogger", "TensorBoardLogger",
           "profile_trace"]


class PrintTimings:
    """Prints iteration rate, like gpflow_monitor.PrintTimings."""

    def __init__(self, prefix: str = ""):
        self.prefix = prefix

    def __call__(self, step, model, loss, stats):
        print(f"{self.prefix}iter {step}: loss {loss:.4f} "
              f"({stats['iters_per_sec']:.2f} it/s)", flush=True)


class JsonlLogger:
    """Appends one JSON object per log event (the TensorBoard-scalar
    equivalent with no external deps)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def __call__(self, step, model, loss, stats):
        rec = dict(stats)
        rec["step"] = step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TensorBoardLogger:
    """Optional TensorBoard scalars via torch.utils.tensorboard."""

    def __init__(self, logdir: str):
        from torch.utils.tensorboard import SummaryWriter  # lazy
        self.writer = SummaryWriter(logdir)

    def __call__(self, step, model, loss, stats):
        self.writer.add_scalar("train/loss", loss, step)
        for k, v in stats.items():
            if isinstance(v, (int, float)) and k != "iter":
                self.writer.add_scalar(f"train/{k}", v, step)

    def close(self):
        self.writer.close()


class FullElboCallback:
    """Evaluates the ELBO on the full stored dataset every log event —
    the gpflow_monitor LmlTensorBoard analogue (reference
    run_regression.py:91-92).  Jitted once; result lands in stats."""

    def __init__(self, key=None):
        import jax
        self._fn = jax.jit(lambda m, k: m.elbo(key=k))
        self._key = key

    def __call__(self, step, model, loss, stats):
        import jax
        key = self._key if self._key is not None else jax.random.PRNGKey(0)
        stats["full_elbo"] = float(self._fn(model, key))


class profile_trace:
    """Context manager around jax.profiler.trace for TPU traces."""

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax
        jax.profiler.stop_trace()
        return False
