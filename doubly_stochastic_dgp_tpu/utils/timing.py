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

__all__ = ["timed_per_call"]


def _sync(out):
    """Scalar host readback of the first element of the first leaf."""
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def timed_per_call(call, n=30, repeats=3):
    """Best-of-``repeats`` mean seconds per ``call(i)``.

    ``call(i)`` must dispatch one unique execution (fold the integer
    ``i`` into a PRNG key or perturb an input by ``i * 1e-12``) and
    return its device output.  ``call`` is invoked once with a negative
    index to warm up / obtain an output for the RTT probe; measurement
    indices are ``0 .. repeats*n - 1``.
    """
    out = call(-1)
    rtt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(out)
        rtt = min(rtt, time.perf_counter() - t0)
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(n):
            out = call(r * n + i)
        _sync(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / n)
    return best
