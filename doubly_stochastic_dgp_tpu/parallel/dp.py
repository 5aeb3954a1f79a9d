"""Data-parallel ELBO / training / prediction over a device mesh.

Design (SURVEY §2.4): the ELBO is a sum of per-datum expected
log-likelihood terms plus a replicated KL (reference dgp.py:92-98) —
embarrassingly data-parallel.  We shard the minibatch N axis over the
mesh with ``shard_map``, ``psum`` the local likelihood sums over ICI,
keep parameters replicated, and count the KL term exactly once.  The
per-device RNG is decorrelated by folding the mesh position into the
key.  For prediction at S=100 samples (run_regression.py:111) the S axis
shards instead.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["dp_elbo", "make_dp_train_step", "dp_predict_y"]


def _local_elbo_terms(model, X_local, Y_local, key, axis, zs=None):
    """Per-device partial sum of variational expectations."""
    if key is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
    ve = model.E_log_p_Y(X_local, Y_local, key) if zs is None else None
    if zs is not None:
        _, Fmeans, Fvars = model.propagate(X_local, zs=zs, full_cov=False,
                                           S=zs[0].shape[0])
        ve_s = model.likelihood.variational_expectations(
            Fmeans[-1], Fvars[-1], Y_local)
        ve = jnp.mean(ve_s, axis=0)
    return jnp.sum(ve)


def dp_elbo(model, X, Y, key, mesh: Mesh, axis: str = "data",
            batch_size: Optional[int] = None, zs=None):
    """Data-parallel ELBO == the single-device ELBO, with the batch
    sharded over ``axis``.  ``batch_size`` is the global batch size (for
    the num_data/batch scale; defaults to X.shape[0])."""
    B = batch_size or X.shape[0]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis), P()),
             out_specs=P())
    def _run(model, X_l, Y_l, key):
        local = _local_elbo_terms(model, X_l, Y_l, key, axis, zs=zs)
        total = jax.lax.psum(local, axis)
        # KL: identical on every device (params replicated) — added once,
        # outside the psum, so it is not double counted.
        KL = sum((l.KL() for l in model.layers),
                 jnp.zeros((), dtype=total.dtype))
        scale = jnp.asarray(model.num_data, dtype=total.dtype) / B
        return total * scale - KL

    return _run(model, X, Y, key)


def make_dp_train_step(tx: optax.GradientTransformation, mesh: Mesh,
                       axis: str = "data",
                       batch_size: Optional[int] = None):
    """Jitted data-parallel train step: grads of the sharded ELBO; the
    psum inside dp_elbo makes XLA produce an all-reduced gradient, so the
    optimizer update runs identically (replicated) on every device."""

    def loss_fn(model, X, Y, key):
        return -dp_elbo(model, X, Y, key, mesh, axis=axis,
                        batch_size=batch_size)

    @jax.jit
    def step(model, opt_state, X, Y, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, X, Y, key)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step


def dp_predict_y(model, Xnew, S: int, key, mesh: Mesh,
                 axis: str = "data"):
    """Prediction with the MC sample axis S sharded over the mesh:
    each device draws S/num_devices samples, and the predictive moments
    are psum-averaged (sample parallelism, SURVEY §2.4)."""
    n_dev = mesh.shape[axis]
    assert S % n_dev == 0, f"S={S} must divide over {n_dev} devices"
    S_local = S // n_dev

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=(P(), P()))
    def _run(model, X, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        Fmean, Fvar = model._predict(X, key=key, full_cov=False, S=S_local)
        m, v = model.likelihood.predict_mean_and_var(Fmean, Fvar)
        # moment-pool the per-device sample mixtures
        m_mean = jax.lax.pmean(jnp.mean(m, axis=0), axis)
        second = jax.lax.pmean(jnp.mean(v + m ** 2, axis=0), axis)
        return m_mean, second - m_mean ** 2

    return _run(model, Xnew, key)
