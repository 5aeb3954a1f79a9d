"""Output-dimension (model-parallel) sharding of a DGP over a mesh axis.

SURVEY §2.4's third parallelism axis ("output-dim / batched-linalg
parallelism") as a real mesh axis — the tensor-parallel analogue for
this model family.  Each layer's D_out-batched variational parameters
(q_mu columns, q_sqrt's leading axis) and the column axis of any Linear
skip-connection mean shard over the mesh; kernels, inducing inputs and
the minibatch stay replicated.  Every device computes the conditional +
reparameterized sample for its own slice of latent dimensions (the
(D, M, M)-batched Cholesky/solve/matmul work XLA otherwise vmaps on one
chip), and the sampled dims are all-gathered over ICI before the next
layer consumes them — one (S, N, D_l) all_gather per layer.  Likelihoods that
factorize over output dims (every elementwise one — Gaussian,
Bernoulli, Poisson, ...) score each device's own dims and the loss
reduction is a single psum; non-factorizing likelihoods (MultiClass —
the robust-max construction couples the K latent dims, exactly
SURVEY §2.4's motivating MNIST case of 10/30 latent GPs,
demo_mnist.ipynb cell 5) take ONE extra all_gather of the final
layer's (S, N, K) moments before the variational expectation (K is
tiny; the gather rides ICI), with the targets replicated over the dim
axis instead of column-sharded.

Input-propagation stacks work too: the propagated raw input columns
are replicated, so each layer's hidden D_out shards and the gathered
samples get the raw columns re-prepended before the next layer.

Restrictions (asserted): homogeneous SVGP layers,
Zero/Identity/Linear/Constant mean functions, and every layer's hidden
D_out (and D_Y, when the likelihood factorizes) divisible by the axis
size.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..models.mean_functions import Identity, MeanFunction, Zero
from ..ops.linalg import reparameterize
from ..utils.modules import static_field

__all__ = ["outdim_specs", "outdim_shard", "outdim_elbo",
           "make_outdim_train_step", "elbo_2d", "make_2d_train_step",
           "elbo_3d", "make_3d_train_step"]


class ShardedIdentity(MeanFunction):
    """Identity mean under output-dim sharding: each device emits its
    own slice of the input dims."""

    width: int = static_field(default=1)       # local width
    axis: str = static_field(default="dim")

    def __call__(self, X):
        start = jax.lax.axis_index(self.axis) * self.width
        return jax.lax.dynamic_slice_in_dim(X, start, self.width, axis=-1)


def _path_names(path):
    out = []
    for p in path:
        n = getattr(p, "name", None)
        if n is None:
            n = getattr(p, "idx", getattr(p, "key", None))
        out.append(n)
    return out


def _factorizes(likelihood) -> bool:
    return bool(getattr(likelihood, "factorizes_over_dims", True))


def _gather_next_input(F, F_local, layer, axis):
    """All-gather the locally sampled dims into the next layer's input.
    Layers carrying ``input_prop_dim`` re-prepend the propagated raw
    input columns (replicated — they are F's leading dims, exactly as
    ``Layer.sample`` concatenates them on one device)."""
    nxt = jax.lax.all_gather(F_local, axis, axis=2, tiled=True)
    p = getattr(layer, "input_prop_dim", None)
    if p:
        nxt = jnp.concatenate([F[:, :, :p], nxt], axis=2)
    return nxt


def outdim_specs(model, axis: str = "dim"):
    """PartitionSpec pytree for ``model``: q_mu/q_sqrt/Linear-mean
    leaves sharded over ``axis`` on their D_out dimension, Y_data
    sharded over its column axis (replicated instead for
    non-factorizing likelihoods, whose targets every device scores),
    everything else replicated."""
    fact = _factorizes(model.likelihood)

    def spec_for(path, leaf):
        names = _path_names(path)
        rank = jnp.ndim(leaf)
        if "layers" in names:
            if "q_mu" in names:
                return P(None, axis)
            if "q_sqrt" in names:
                return P(axis, None, None)
            if "mean_function" in names:
                if "W" in names:
                    return P(None, axis)
                if "b" in names or "c" in names:
                    return P(axis)
        if "Y_data" in names and fact:
            return P(None, axis)
        return P(*([None] * rank))

    return jax.tree_util.tree_map_with_path(spec_for, model)


def outdim_shard(model, mesh: Mesh, axis: str = "dim"):
    """device_put the model with the output-dim shardings."""
    specs = outdim_specs(model, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        model, specs)


def _localize(model, n_dev: int, axis: str):
    """Rebuild static metadata for the per-device slice: each layer's
    num_outputs and mean function describe the local dims."""
    layers = []
    for layer in model.layers:
        D = layer.num_outputs_
        assert D % n_dev == 0, (
            f"layer D_out={D} not divisible by mesh axis size {n_dev}")
        d_local = D // n_dev
        mf = layer.mean_function
        if isinstance(mf, Zero):
            mf = Zero(output_dim=d_local)
        elif isinstance(mf, Identity):
            mf = ShardedIdentity(width=d_local, axis=axis)
        # Linear/Constant: their parameter leaves are already sharded by
        # the in_specs, so the local module is correct as-is.
        layers.append(layer.replace(num_outputs_=d_local,
                                    mean_function=mf))
    return model.replace(layers=layers)


def outdim_elbo(model, X, Y, key, mesh: Mesh, axis: str = "dim",
                batch_size: Optional[int] = None, zs=None):
    """ELBO with every layer's latent dims sharded over ``axis``.

    ``model`` is the plain (replicated-layout) model — pass it through
    :func:`outdim_shard` first for multi-chip placement.  ``zs`` (fixed
    whitened points per layer, each (S, 1, D_l) or (S, N, D_l)) makes
    the bound deterministic; they are sharded on their last axis."""
    fact = _factorizes(model.likelihood)
    n_dev = mesh.shape[axis]
    B = batch_size or X.shape[0]
    specs = outdim_specs(model, axis)
    zs_specs = (None if zs is None
                else [P(None, None, axis) for _ in zs])

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P(), P(None, axis) if fact else P(), P(),
                       zs_specs),
             out_specs=P())
    def run(model, X, Y_l, key, zs_l):
        m = _localize(model, n_dev, axis)
        S = m.num_samples
        dev = jax.lax.axis_index(axis)
        F = jnp.tile(X[None, :, :], (S, 1, 1))
        keys = (jax.random.split(key, len(m.layers))
                if key is not None else [None] * len(m.layers))
        for li, layer in enumerate(m.layers):
            mean, var = layer.conditional_SND(F)       # local dims
            if zs_l is not None:
                z = jnp.broadcast_to(zs_l[li], mean.shape)
            else:
                z = jax.random.normal(
                    jax.random.fold_in(keys[li], dev), mean.shape,
                    dtype=mean.dtype)
            F_local = reparameterize(mean, var, z,
                                     jitter=layer.jitter)
            if li < len(m.layers) - 1:
                # next layer consumes every dim: gather over ICI
                F = _gather_next_input(F, F_local, layer, axis)
        KL_local = sum((l.KL() for l in m.layers),
                       jnp.zeros((), dtype=mean.dtype))
        scale = jnp.asarray(m.num_data, dtype=mean.dtype) / B
        if fact:
            ve = m.likelihood.variational_expectations(mean, var, Y_l)
            local = jnp.sum(jnp.mean(ve, axis=0))
            # both the likelihood term and the KL are sums over dims =>
            # one psum of the local bound
            return jax.lax.psum(local * scale - KL_local, axis)
        # non-factorizing (MultiClass): gather the final (S, N, K)
        # moments over ICI, score the full-dim expectation (identical
        # on every dim device; pmean marks the replication)
        mean = jax.lax.all_gather(mean, axis, axis=2, tiled=True)
        var = jax.lax.all_gather(var, axis, axis=2, tiled=True)
        ve = m.likelihood.variational_expectations(mean, var, Y_l)
        like = jax.lax.pmean(jnp.sum(jnp.mean(ve, axis=0)), axis)
        return like * scale - jax.lax.psum(KL_local, axis)

    return run(model, X, Y, key, zs)


def elbo_2d(model, X, Y, key, mesh: Mesh, data_axis: str = "data",
            dim_axis: str = "dim", batch_size: Optional[int] = None,
            zs=None):
    """ELBO over a 2-D mesh: the minibatch rows shard over
    ``data_axis`` (data parallelism, psum'd likelihood) AND every
    layer's latent dims shard over ``dim_axis`` (model parallelism,
    per-layer all_gather) — the composed dp x tp layout.  The KL is
    summed over the dim axis and counted once per data replica."""
    fact = _factorizes(model.likelihood)
    n_dim = mesh.shape[dim_axis]
    B = batch_size or X.shape[0]
    specs = outdim_specs(model, dim_axis)
    zs_specs = (None if zs is None
                else [P(None, None, dim_axis) for _ in zs])

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P(data_axis),
                       P(data_axis, dim_axis) if fact else P(data_axis),
                       P(), zs_specs),
             out_specs=P())
    def run(model, X_l, Y_l, key, zs_l):
        m = _localize(model, n_dim, dim_axis)
        S = m.num_samples
        ddev = jax.lax.axis_index(dim_axis)
        bdev = jax.lax.axis_index(data_axis)
        F = jnp.tile(X_l[None, :, :], (S, 1, 1))
        keys = (jax.random.split(jax.random.fold_in(key, bdev),
                                 len(m.layers))
                if key is not None else [None] * len(m.layers))
        for li, layer in enumerate(m.layers):
            mean, var = layer.conditional_SND(F)       # local dims
            if zs_l is not None:
                z = jnp.broadcast_to(zs_l[li], mean.shape)
            else:
                z = jax.random.normal(
                    jax.random.fold_in(keys[li], ddev), mean.shape,
                    dtype=mean.dtype)
            F_local = reparameterize(mean, var, z, jitter=layer.jitter)
            if li < len(m.layers) - 1:
                F = _gather_next_input(F, F_local, layer, dim_axis)
        if fact:
            ve = m.likelihood.variational_expectations(mean, var, Y_l)
            # likelihood terms: partial over BOTH rows and dims
            like = jax.lax.psum(
                jax.lax.psum(jnp.sum(jnp.mean(ve, axis=0)), dim_axis),
                data_axis)
        else:
            # gather the final (S, n_local, K) moments over the dim
            # axis; every dim device scores its own rows' full-dim
            # expectation (pmean marks dim replication), rows psum
            mean = jax.lax.all_gather(mean, dim_axis, axis=2, tiled=True)
            var = jax.lax.all_gather(var, dim_axis, axis=2, tiled=True)
            ve = m.likelihood.variational_expectations(mean, var, Y_l)
            like = jax.lax.psum(
                jax.lax.pmean(jnp.sum(jnp.mean(ve, axis=0)), dim_axis),
                data_axis)
        # KL: partial over dims only; replicated across data replicas
        KL = jax.lax.psum(
            sum((l.KL() for l in m.layers),
                jnp.zeros((), dtype=like.dtype)), dim_axis)
        scale = jnp.asarray(m.num_data, dtype=like.dtype) / B
        return like * scale - KL

    return run(model, X, Y, key, zs)


def make_2d_train_step(tx: optax.GradientTransformation, mesh: Mesh,
                       data_axis: str = "data", dim_axis: str = "dim",
                       batch_size: Optional[int] = None):
    """Jitted train step over the composed (data x dim) mesh."""

    def loss_fn(model, X, Y, key):
        # MAP objective: + log_prior, once (params replicated or
        # dim-sharded; the sum over leaves is a single global value)
        from ..utils.modules import log_prior
        return -log_prior(model) - elbo_2d(model, X, Y, key, mesh,
                                          data_axis=data_axis,
                        dim_axis=dim_axis, batch_size=batch_size)

    @jax.jit
    def step(model, opt_state, X, Y, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, X, Y, key)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step


def elbo_3d(model, X, Y, key, mesh: Mesh, data_axis: str = "data",
            sample_axis: str = "sample", dim_axis: str = "dim",
            batch_size: Optional[int] = None, zs=None):
    """ELBO over the FULL 3-D mesh — every parallelism axis this model
    family has (SURVEY §2.4), composed: minibatch rows shard over
    ``data_axis`` (dp), the S MC samples over ``sample_axis`` (each
    sample-group device propagates S/n_samp decorrelated samples), and
    every layer's latent dims over ``dim_axis`` (tp; one per-layer
    all_gather over ICI).  The likelihood term pmean's over sample
    groups and psums over rows and dims; the KL psums over dims and is
    counted once across data/sample replicas.

    With explicit ``zs`` (each (S, 1|N, D_l), sharded over
    (sample, -, dim)) the value equals the single-device bound exactly.
    """
    fact = _factorizes(model.likelihood)
    n_dim = mesh.shape[dim_axis]
    n_samp = mesh.shape[sample_axis]
    B = batch_size or X.shape[0]
    specs = outdim_specs(model, dim_axis)
    zs_specs = (None if zs is None
                else [P(sample_axis, None, dim_axis) for _ in zs])
    if zs is None:
        assert model.num_samples % n_samp == 0, (
            f"num_samples={model.num_samples} must divide the "
            f"'{sample_axis}' axis ({n_samp})")
    S_local = model.num_samples // n_samp if zs is None else None

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P(data_axis),
                       P(data_axis, dim_axis) if fact else P(data_axis),
                       P(), zs_specs),
             out_specs=P())
    def run(model, X_l, Y_l, key, zs_l):
        m = _localize(model, n_dim, dim_axis)
        ddev = jax.lax.axis_index(dim_axis)
        bdev = jax.lax.axis_index(data_axis)
        sdev = jax.lax.axis_index(sample_axis)
        S_l = zs_l[0].shape[0] if zs_l is not None else S_local
        F = jnp.tile(X_l[None, :, :], (S_l, 1, 1))
        if key is not None:
            kroot = jax.random.fold_in(jax.random.fold_in(key, bdev),
                                       sdev)
            keys = jax.random.split(kroot, len(m.layers))
        else:
            keys = [None] * len(m.layers)
        for li, layer in enumerate(m.layers):
            mean, var = layer.conditional_SND(F)        # local dims
            if zs_l is not None:
                z = jnp.broadcast_to(zs_l[li], mean.shape)
            else:
                z = jax.random.normal(
                    jax.random.fold_in(keys[li], ddev), mean.shape,
                    dtype=mean.dtype)
            F_local = reparameterize(mean, var, z, jitter=layer.jitter)
            if li < len(m.layers) - 1:
                F = _gather_next_input(F, F_local, layer, dim_axis)
        if not fact:
            # gather the final (S_l, n_local, K) moments over the dim
            # axis before the (dim-coupled) variational expectation
            mean = jax.lax.all_gather(mean, dim_axis, axis=2, tiled=True)
            var = jax.lax.all_gather(var, dim_axis, axis=2, tiled=True)
        ve = m.likelihood.variational_expectations(mean, var, Y_l)
        like = jnp.sum(jnp.mean(ve, axis=0))
        # one axis per collective call (mixed varying states are
        # rejected; see parallel/dp.py): average the equal-size sample
        # groups, then sum rows and dims (pmean over dims when the
        # gathered expectation is already replicated across them)
        like = jax.lax.pmean(like, sample_axis)
        like = jax.lax.psum(like, data_axis)
        like = (jax.lax.psum(like, dim_axis) if fact
                else jax.lax.pmean(like, dim_axis))
        KL = jax.lax.psum(
            sum((l.KL() for l in m.layers),
                jnp.zeros((), dtype=like.dtype)), dim_axis)
        scale = jnp.asarray(m.num_data, dtype=like.dtype) / B
        return like * scale - KL

    return run(model, X, Y, key, zs)


def make_3d_train_step(tx: optax.GradientTransformation, mesh: Mesh,
                       data_axis: str = "data",
                       sample_axis: str = "sample",
                       dim_axis: str = "dim",
                       batch_size: Optional[int] = None):
    """Jitted train step over the composed (data x sample x dim) mesh."""

    def loss_fn(model, X, Y, key):
        # MAP objective: + log_prior, once (params replicated or
        # dim-sharded; the sum over leaves is a single global value)
        from ..utils.modules import log_prior
        return -log_prior(model) - elbo_3d(model, X, Y, key, mesh,
                                          data_axis=data_axis,
                        sample_axis=sample_axis, dim_axis=dim_axis,
                        batch_size=batch_size)

    @jax.jit
    def step(model, opt_state, X, Y, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, X, Y, key)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step


def make_outdim_train_step(tx: optax.GradientTransformation, mesh: Mesh,
                           axis: str = "dim",
                           batch_size: Optional[int] = None):
    """Jitted train step over the output-dim mesh: grads of the sharded
    ELBO (differentiated through shard_map; parameter grads come back
    with their owners' shardings), replicated-safe optimizer update."""

    def loss_fn(model, X, Y, key):
        # MAP objective: + log_prior, once (params replicated or
        # dim-sharded; the sum over leaves is a single global value)
        from ..utils.modules import log_prior
        return -log_prior(model) - outdim_elbo(model, X, Y, key, mesh,
                                          axis=axis,
                            batch_size=batch_size)

    @jax.jit
    def step(model, opt_state, X, Y, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, X, Y, key)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step
