"""Serving/export: serialize jitted prediction (or training) functions
to portable StableHLO artifacts via jax.export.

The reference has no serving story (its "deployment" is a live TF1
session); for a production TPU framework the exported artifact is the
deployable unit: it embeds the compiled computation and the model
pytree structure, can be reloaded in a process with no model-building
code, and runs on any compatible backend.

Custom Module pytree nodes need registered (de)serializers for their
static aux data; :func:`register_module_serialization` walks every
Module subclass and registers a pickle-backed codec once.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Optional

import jax

from .utils.modules import Module

__all__ = ["register_module_serialization", "export_fn", "load_exported",
           "export_predict_y", "make_server"]

_registered = False


def register_module_serialization():
    """Register every Module subclass (recursively) with jax.export.
    Idempotent; call before export/deserialize."""
    global _registered
    if _registered:
        return
    from jax import export

    def walk(cls):
        yield cls
        for sub in cls.__subclasses__():
            yield from walk(sub)

    for cls in set(walk(Module)):
        name = f"dsdgp::{cls.__module__}.{cls.__qualname__}"
        try:
            export.register_pytree_node_serialization(
                cls,
                serialized_name=name,
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads,
            )
        except ValueError:
            pass  # already registered
    _registered = True


def export_fn(fn: Callable, *example_args, path: Optional[str] = None):
    """Export a jittable function at the example arguments' shapes.
    Returns the serialized bytes (and writes them to ``path`` if given).
    """
    register_module_serialization()
    from jax import export

    from .utils.modules import assert_live
    assert_live(example_args, what="example-argument")
    exp = export.export(jax.jit(fn))(*example_args)
    data = exp.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def _warmup_linalg_custom_calls():
    """jax 0.9.0 CPU workaround: calling a DESERIALIZED export whose
    program contains LAPACK custom calls (cholesky/triangular_solve)
    in a fresh process segfaults (native crash, no Python frame)
    unless the handlers were first instantiated by a live computation
    in that process — measured: chol/tsolve artifacts die with
    SIGSEGV, elementwise/RNG artifacts run fine, and a 2x2 warmup
    cures it.  Cheap (one-time, tiny) and harmless elsewhere."""
    global _warmed
    if _warmed:
        return
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    eye = jnp.eye(2)
    jax.block_until_ready(jnp.linalg.cholesky(eye))
    jax.block_until_ready(
        jsl.solve_triangular(eye, jnp.ones((2, 1)), lower=True))
    _warmed = True


_warmed = False


def load_exported(data_or_path):
    """Load a serialized artifact; returns a callable (``.call``)."""
    register_module_serialization()
    _warmup_linalg_custom_calls()
    from jax import export

    if isinstance(data_or_path, (bytes, bytearray)):
        data = bytes(data_or_path)
    else:
        with open(data_or_path, "rb") as f:
            data = f.read()
    exp = export.deserialize(data)
    return exp.call


def make_server(model, S: int, *, method: str = "predict_y",
                precompute: bool = True, warmup_batch: Optional[int] = None,
                key=None, batch_buckets=None):
    """Production serving callable: the measured-fastest request path
    as a one-call API (round-4 PERF.md serving verdict).

    The serving A/B record (scripts/bench_serving_ab.py, PERF.md
    round-4) found that (a) the cached posterior's staging factors
    (Lu^{-1}, alpha, C — models/posterior.py) remove the per-request
    Cholesky/inverse, and (b) passing the cached model as a jit
    *argument* pays per-request pytree leaf handling that cancels much
    of the win — the production form is a **closure jit**: the
    (pre-computed) model is closed over, so its factors are baked into
    the compiled program as constants.  This helper packages that
    pattern, plus the fresh-process LAPACK warmup serving.py already
    applies to deserialized exports.

    Parameters
    ----------
    model : a trained model (any model :func:`~..models.posterior.
        precompute` accepts, or any model with ``method`` when
        ``precompute=False``).
    S : MC samples per request (the reference eval loop uses S=100,
        run_regression.py:109-123).
    method : ``'predict_y'`` (default; requests are ``serve(X)``) or
        ``'predict_density'`` (requests are ``serve(X, Y)``).
    precompute : map the model through the posterior cache first
        (default True — prediction becomes gram + MXU matmuls only).
    warmup_batch : if given, compile + execute one request of this many
        rows before returning, so the first real request is not a
        multi-second compile.  With ``batch_buckets``, every bucket is
        warmed instead (all compiles paid up front).
    key : base PRNG key for requests that don't pass their own
        (successive requests fold an internal counter into it, the
        unique-dispatch discipline of utils/timing.py).
    batch_buckets : optional ascending row-count buckets (e.g.
        ``(128, 512, 1000)``).  Production request sizes vary, and a
        plain jit recompiles per distinct batch shape; with buckets a
        request is right-padded to the smallest covering bucket and the
        outputs sliced back, so exactly ``len(batch_buckets)`` programs
        ever exist (the DynamicPredictor S-bucket idea applied to the
        batch axis).  Requests larger than the top bucket are served in
        top-bucket chunks and concatenated.  Per-row predictions are
        independent, so padding does not change the kept rows'
        moments (to roundoff for deterministic models; for MC models
        the padded shape participates in the sample draw, so results
        match a same-shape padded call, not an unpadded one).

    Returns a callable ``serve(X[, Y], key=None)`` returning the jitted
    device output of ``model.<method>(X[, Y], S=S, key=key)``.
    """
    import itertools

    import jax.numpy as jnp

    from .config import default_float
    from .utils.modules import assert_live

    assert_live(model, what="model")
    # input/output widths for warmup requests — read off the RAW model
    # (the posterior-cached pytrees don't keep the training set).  The
    # Y width matters: a (b, 1) warmup for a multi-output
    # predict_density server would compile a program no real request
    # uses, silently defeating the warmup.
    D_in, D_out = None, 1
    try:
        D_in = int(model.X_data.shape[1])
        D_out = int(model.Y_data.shape[1])
    except AttributeError:
        pass
    if precompute:
        from .models.posterior import precompute as _precompute
        model = _precompute(model)
    _warmup_linalg_custom_calls()

    needs_y = method == "predict_density"
    bound = getattr(model, method)   # closure jit: model pytree leaves
    # (incl. the cached staging factors) become compile-time constants

    if needs_y:
        _serve = jax.jit(lambda x, y, k: bound(x, y, S=S, key=k))
    else:
        _serve = jax.jit(lambda x, k: bound(x, S=S, key=k))

    base_key = jax.random.PRNGKey(0) if key is None else key
    counter = itertools.count()
    buckets = (tuple(sorted({int(b) for b in batch_buckets}))
               if batch_buckets else None)

    def _next_key():
        return jax.random.fold_in(base_key, next(counter))

    def _call(Xb, Yb, k):
        return _serve(Xb, Yb, k) if needs_y else _serve(Xb, k)

    def _rows(out_leaf, n):
        # request outputs carry rows on axis -2 ((S, B, D) moments and
        # (B, D) squeezed/density forms alike); 1-D leaves on axis 0
        ax = -2 if out_leaf.ndim >= 2 else 0
        return jax.lax.slice_in_dim(out_leaf, 0, n, axis=ax)

    def _pad_rows(A, pad):
        return jnp.pad(A, ((0, pad),) + ((0, 0),) * (A.ndim - 1))

    def serve(X, Y=None, key=None):
        X = jnp.asarray(X, dtype=default_float())
        if needs_y:
            if Y is None:
                raise ValueError("predict_density requests need Y")
            Y = jnp.asarray(Y, dtype=default_float())
        if buckets is None:
            return _call(X, Y, key if key is not None else _next_key())
        B = X.shape[0]
        top = buckets[-1]
        chunks = []
        start = 0
        chunk_idx = 0
        while start < B:
            n = min(top, B - start)
            bb = next(b for b in buckets if n <= b)
            Xb = _pad_rows(X[start:start + n], bb - n)
            Yb = (_pad_rows(Y[start:start + n], bb - n)
                  if needs_y else None)
            # a caller-pinned key stays authoritative on the chunked
            # path too: chunk keys are derived from it deterministically
            # (fold_in per chunk), so identical pinned-key requests
            # reproduce bit-for-bit; only keyless requests draw from
            # the internal counter
            if key is not None:
                k = (key if B <= top
                     else jax.random.fold_in(key, chunk_idx))
            else:
                k = _next_key()
            out = _call(Xb, Yb, k)
            chunks.append(jax.tree_util.tree_map(
                lambda a: _rows(a, n), out))
            start += n
            chunk_idx += 1
        if len(chunks) == 1:
            return chunks[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(
                xs, axis=-2 if xs[0].ndim >= 2 else 0), *chunks)

    if (warmup_batch or buckets) and D_in is not None:
        for b in (buckets or (warmup_batch,)):
            if not b:
                continue
            x0 = jnp.zeros((b, D_in), dtype=default_float())
            out = (serve(x0, jnp.zeros((b, D_out),
                                       dtype=default_float()))
                   if needs_y else serve(x0))
            jax.block_until_ready(out)
    return serve


def export_predict_y(model, batch_size: int, S: int,
                     path: Optional[str] = None,
                     precomputed: bool = False):
    """Convenience: export ``model.predict_y`` at a fixed batch size and
    sample count.  The artifact takes (model, X, key) so refreshed
    parameters can be fed at serving time.

    ``precomputed=True`` first maps the model through
    :func:`models.posterior.precompute`, so the exported program
    contains no Cholesky/inverse at all — only grams and MXU matmuls
    against the cached staging factors.  Feed refreshed parameters by
    re-running ``precompute`` on the retrained model and passing the
    cached model pytree to the artifact."""
    import jax.numpy as jnp

    from .config import default_float

    D = model.X_data.shape[1]
    if precomputed:
        from .models.posterior import precompute
        model = precompute(model)

    def fn(model, X, key):
        return model.predict_y(X, S=S, key=key)

    x = jnp.zeros((batch_size, D), dtype=default_float())
    return export_fn(fn, model, x, jax.random.PRNGKey(0), path=path)
