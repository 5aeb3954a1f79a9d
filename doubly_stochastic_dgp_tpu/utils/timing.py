"""Device-timing helper for the tunneled-TPU (axon) backend.

Measurement methodology (PERF.md "Tunneled-TPU timing pitfall"):
``block_until_ready`` under-reports for loops that re-dispatch the
*same compiled program with the same buffers* — the runtime appears to
coalesce/elide identical executions.  The reliable recipe, shared by
every timing harness in this repo (bench.py serving rows,
scripts/probe_crossover.py, scripts/profile_breakdown.py):

1. give every call a unique input (a ``fold_in``'d PRNG key or an
   iteration-dependent epsilon on one argument) so each dispatch is a
   unique execution, and
2. close the loop with a **scalar host readback** (the only reliable
   sync on this runtime), measuring the readback round trip separately
   (~25 ms tunnel RTT) and subtracting it.

The caller supplies the uniqueness via ``call(i)``; this module owns
the sync/RTT/loop structure so a future methodology fix lands in one
place.
"""

import time

import jax
import jax.numpy as jnp

__all__ = ["timed_per_call", "timed_per_call_stats"]


def _sync(out):
    """Scalar host readback of the first element of the first leaf."""
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def timed_per_call_stats(call, n=30, repeats=3):
    """Per-repeat mean seconds per ``call(i)``, with spread.

    ``call(i)`` must dispatch one unique execution (fold the integer
    ``i`` into a PRNG key or perturb an input by ``i * 1e-12``) and
    return its device output.  ``call`` is invoked once with a negative
    index to warm up / obtain an output for the RTT probe; measurement
    indices are ``0 .. repeats*n - 1``.

    Returns a dict with the best (min), median and max of the
    ``repeats`` block means plus ``spread_pct`` — so a bench row can
    record whether a round-over-round delta exceeds its own noise
    (round-3 VERDICT weak #1).
    """
    import statistics

    out = call(-1)
    rtt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(out)
        rtt = min(rtt, time.perf_counter() - t0)
    means = []
    for r in range(max(1, repeats)):
        t0 = time.perf_counter()
        for i in range(n):
            out = call(r * n + i)
        _sync(out)
        means.append((time.perf_counter() - t0 - rtt) / n)
    best = min(means)
    return {
        "best": best,
        "median": statistics.median(means),
        "max": max(means),
        "spread_pct": (100.0 * (max(means) - best) / best
                       if best > 0 else 0.0),
        "repeats": len(means),
    }


def timed_per_call(call, n=30, repeats=3):
    """Best-of-``repeats`` mean seconds per ``call(i)`` (see
    ``timed_per_call_stats`` for the contract and methodology)."""
    return timed_per_call_stats(call, n=n, repeats=repeats)["best"]
