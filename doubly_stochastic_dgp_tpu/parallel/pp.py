"""Pipeline parallelism over the DGP layer stack (GPipe-style).

The fourth mesh axis for this model family, complementing data
(`parallel/dp.py`), sample (`sp_elbo`) and output-dim
(`parallel/outdim.py`) parallelism: the L layers of a *homogeneous*
stack are sharded over a ``stage`` mesh axis — each device physically
holds only ``L / n_stages`` layers' parameters (q_mu, q_sqrt, Z,
kernel/mean params all land with ``PartitionSpec('stage', ...)``), which
is the memory-scaling axis for deep trunks whose per-layer state
(D_out x M x M q_sqrt + M x M inducing algebra) dominates HBM.

Schedule: the minibatch splits into ``n_micro`` microbatches that flow
through the stages GPipe-style — one ``lax.scan`` over
``n_micro + n_stages - 1`` ticks, each tick ``ppermute``-ing the
activation (the sampled (S, b, D) layer output, reference dgp.py:62-76)
one stage forward over ICI while every stage applies its own layers to
the microbatch it currently holds.  Bubble ticks process zeros and are
masked out of the likelihood sum, so the value (and its gradients, via
the ppermute/scan transpose) equals the single-device ELBO exactly.
The per-layer KLs are local to their owning stage and ``psum`` once.

The reference has no analogue (it is a single-device TF1 graph,
SURVEY §2.4); the layer loop being pipelined is reference dgp.py:69.

Restrictions (asserted by :func:`pp_stack`): all layers share one
pytree structure and leaf shapes — same class, M, D_in == D_out, mean
function type, numerics statics — and no input propagation.  Use it
for deep homogeneous trunks; heterogeneous stacks keep the dp/sp/dim
axes.  ``L`` must divide by the stage-axis size and the batch by
``n_micro``.

An optional ``data_axis`` composes with data parallelism: rows shard
over it, every data replica runs its own pipeline, and the likelihood
partials psum over both axes (dp x pp mesh).
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

from ..utils.modules import log_prior

__all__ = ["pp_stack", "pp_specs", "pp_shard", "pp_elbo",
           "make_pp_train_step"]


def pp_stack(model, split_final: bool = False):
    """Stack a homogeneous layer list into one pytree whose leaves carry
    a leading (L,) axis — the axis :func:`pp_specs` shards over stages.

    Returns a model whose ``layers`` is a one-element list holding the
    stacked layer.  Asserts homogeneity: identical layer class, pytree
    structure (this covers every static/numerics field), leaf shapes,
    square D_in == D_out (the activation width must be constant through
    the pipe) and no input propagation.

    ``split_final=True`` handles the paper's canonical shape (equal
    hidden widths, a *different* final layer — e.g. RBF+White D→D
    trunks under an RBF D→D_Y Zero-mean head, run_regression.py:61-66):
    only ``layers[:-1]`` stack/shard over stages; the final layer rides
    along replicated (``layers`` becomes ``[stacked_trunk, final]``),
    and the last stage evaluates its conditional moments for the
    likelihood term — the ELBO needs no sample draw from the final
    layer (reference dgp.py:83-90 consumes Fmeans[-1]/Fvars[-1]).
    """
    layers = list(model.layers)
    final = None
    if split_final:
        if len(layers) < 3:
            raise ValueError("split_final pipeline parallelism needs at "
                             "least a 2-layer trunk + the final layer")
        final = layers[-1]
        layers = layers[:-1]
    if len(layers) < 2:
        raise ValueError("pipeline parallelism needs at least 2 layers")
    t0 = type(layers[0])
    s0 = jax.tree_util.tree_structure(layers[0])
    shapes0 = [jnp.shape(x) for x in jax.tree_util.tree_leaves(layers[0])]
    for i, l in enumerate(layers[1:], start=1):
        if type(l) is not t0:
            raise ValueError(
                f"pp_stack needs a homogeneous stack: layer 0 is "
                f"{t0.__name__}, layer {i} is {type(l).__name__}")
        if jax.tree_util.tree_structure(l) != s0:
            raise ValueError(
                f"pp_stack: layer {i}'s pytree structure (incl. static "
                f"fields) differs from layer 0's — the stack is not "
                f"homogeneous")
        shapes = [jnp.shape(x) for x in jax.tree_util.tree_leaves(l)]
        if shapes != shapes0:
            raise ValueError(
                f"pp_stack: layer {i}'s parameter shapes {shapes} differ "
                f"from layer 0's {shapes0}")
    for i, l in enumerate(layers):
        if getattr(l, "input_prop_dim", None):
            raise ValueError(
                f"pp_stack: layer {i} uses input propagation, which "
                f"changes the activation width between stages")
        D_in = l.Z.value.shape[1] if getattr(l, "Z", None) is not None \
            else None
        if D_in is not None and D_in != l.num_outputs:
            raise ValueError(
                f"pp_stack: layer {i} maps D_in={D_in} -> "
                f"D_out={l.num_outputs}; the pipelined activation must "
                f"keep one width")
    if final is not None:
        fZ = getattr(final, "Z", None)
        if fZ is not None and fZ.value.shape[1] != layers[0].num_outputs:
            raise ValueError(
                f"pp_stack: the final layer consumes width "
                f"{fZ.value.shape[1]} but the trunk produces "
                f"{layers[0].num_outputs}")
        if getattr(final, "input_prop_dim", None):
            raise ValueError("pp_stack: the final layer uses input "
                             "propagation, which the pipeline does not "
                             "carry")
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    new_layers = [stacked] if final is None else [stacked, final]
    return model.replace(layers=new_layers)


def _n_layers(stacked):
    return jax.tree_util.tree_leaves(stacked)[0].shape[0]


def _layer_at(stacked, i):
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def _path_names(path):
    out = []
    for p in path:
        n = getattr(p, "name", None)
        if n is None:
            n = getattr(p, "idx", getattr(p, "key", None))
        out.append(n)
    return out


def pp_specs(model, axis: str = "stage"):
    """PartitionSpec pytree for a :func:`pp_stack`-ed model: every layer
    leaf shards its leading (L,) axis over ``axis``; everything else
    (likelihood, data buffers) is replicated."""

    def spec_for(path, leaf):
        names = _path_names(path)
        rank = jnp.ndim(leaf)
        if "layers" in names:
            i = names.index("layers")
            # layers[0] is the stacked trunk (stage-sharded); layers[1],
            # when present, is the split-final head (replicated)
            if len(names) > i + 1 and names[i + 1] == 0:
                return P(axis, *([None] * (rank - 1)))
        return P(*([None] * rank))

    return jax.tree_util.tree_map_with_path(spec_for, model)


def pp_shard(model, mesh: Mesh, axis: str = "stage"):
    """device_put the stacked model with the stage shardings — after
    this, each device holds only its own stages' layer parameters."""
    specs = pp_specs(model, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        model, specs)


def pp_elbo(model, X, Y, key, mesh: Mesh, axis: str = "stage",
            n_micro: Optional[int] = None, data_axis: Optional[str] = None,
            batch_size: Optional[int] = None, zs=None):
    """Pipeline-parallel ELBO == the single-device ELBO exactly.

    ``model`` must come from :func:`pp_stack` (pass through
    :func:`pp_shard` first for multi-chip placement).  ``n_micro``
    microbatches (default: the stage-axis size) flow through the
    stages; the batch must divide by ``n_micro`` (and by the data-axis
    size first, when ``data_axis`` is given).

    RNG scheme (for emulation/tests): the whitened draw for global
    layer ``gl`` on microbatch ``j`` is
    ``normal(fold_in(fold_in(key', gl), j), (S, b, D))`` where ``key'``
    folds in the data-axis index first when ``data_axis`` is set.

    ``zs`` — a stacked (L, S, N, D) array of fixed whitened points
    (``jnp.stack`` of the per-layer zs lists used elsewhere; trunk
    layers only under ``split_final``) — makes the bound deterministic;
    it shards (stage, -, data, -).

    A model from ``pp_stack(..., split_final=True)`` carries its final
    layer replicated: the last stage evaluates its conditional moments
    on the trunk output for the likelihood term (no sample draw — the
    bound consumes only the final moments, reference dgp.py:83-90) and
    its KL is added once outside the stage psum.

    **Bubble cost** (GPipe schedule): the scan runs
    ``T = n_micro + n_stages - 1`` ticks of which ``n_stages - 1`` are
    fill/drain bubbles, so the idle fraction is
    ``(n_stages - 1) / (n_micro + n_stages - 1)`` — 50% less one tick
    at the default ``n_micro = n_stages``.  Raise ``n_micro`` to
    amortize (at ``2*n_stages`` the bubble is ~33%, at ``8*n_stages``
    ~11%); each microbatch must stay large enough to keep the MXU busy
    (B/n_micro rows).  A warning fires when ``n_micro < 2*n_stages``;
    see SCALING.md §3b for the full cost model (pipeline parallelism
    here is a parameter-memory lever, not a throughput lever).
    """
    from ..models.dgp import DGPBase
    if (type(model).E_log_p_Y is not DGPBase.E_log_p_Y
            or type(model).elbo is not DGPBase.elbo):
        raise ValueError(
            f"pp_elbo pipelines the standard MC bound "
            f"(DGPBase.E_log_p_Y); {type(model).__name__} overrides it "
            f"(quadrature / heteroscedastic / collapsed bounds) — use "
            f"that model's dedicated training path")
    n_stages = mesh.shape[axis]
    stacked = model.layers[0]
    final = model.layers[1] if len(model.layers) > 1 else None
    L = _n_layers(stacked)
    if L % n_stages != 0:
        raise ValueError(f"L={L} layers must divide over the '{axis}' "
                         f"axis ({n_stages} stages)")
    L_local = L // n_stages
    n_micro = n_micro or n_stages
    if n_stages > 1 and n_micro < 2 * n_stages:
        import warnings
        bubble = (n_stages - 1) / (n_micro + n_stages - 1)
        warnings.warn(
            f"pp_elbo: n_micro={n_micro} with {n_stages} stages leaves "
            f"{bubble:.0%} of the pipeline ticks as fill/drain bubbles "
            f"(idle fraction = (n_stages-1)/(n_micro+n_stages-1)); "
            f"raise n_micro to >= {2 * n_stages} to push it below ~33% "
            f"(see SCALING.md §3b)", stacklevel=2)
    n_data = mesh.shape[data_axis] if data_axis is not None else 1
    N = X.shape[0]
    if N % (n_data * n_micro) != 0:
        raise ValueError(
            f"batch N={N} must divide by data-axis size {n_data} x "
            f"n_micro={n_micro}")
    B = batch_size or N
    S = model.num_samples
    T = n_micro + n_stages - 1

    specs = pp_specs(model, axis)
    row_spec = P(data_axis) if data_axis is not None else P()
    zs_spec = (None if zs is None
               else P(axis, None, data_axis, None))
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, row_spec, row_spec, P(), zs_spec),
             out_specs=P())
    def run(model, X_l, Y_l, key, zs_l):
        stacked = model.layers[0]               # (L_local, ...) leaves
        final_l = model.layers[1] if len(model.layers) > 1 else None
        s_idx = jax.lax.axis_index(axis)
        if key is not None and data_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        n_loc = X_l.shape[0]
        b = n_loc // n_micro
        D = X_l.shape[1]
        X_mb = X_l.reshape(n_micro, b, D)
        Y_mb = Y_l.reshape(n_micro, b, Y_l.shape[1])

        def stage_fn(act_in, t):
            """Apply this stage's layers to the activation it holds at
            tick ``t`` (microbatch j = t - s_idx; garbage on bubble
            ticks, masked out below)."""
            j = jnp.clip(t - s_idx, 0, n_micro - 1)
            F = act_in
            mean = var = None
            for i in range(L_local):
                layer = _layer_at(stacked, i)
                gl = s_idx * L_local + i
                if zs_l is not None:
                    z = jax.lax.dynamic_slice_in_dim(
                        zs_l[i], j * b, b, axis=1)          # (S, b, D)
                else:
                    kz = jax.random.fold_in(
                        jax.random.fold_in(key, gl), j)
                    z = jax.random.normal(kz, (S, b, layer.num_outputs),
                                          dtype=F.dtype)
                F, mean, var = layer.sample_from_conditional(F, z=z)
            if final_l is not None:
                # split-final head (replicated): the bound consumes its
                # conditional moments on the trunk output — no draw
                mean, var = final_l.conditional_SND(F)
            return F, mean, var

        if getattr(model, "remat", False):
            stage_fn = jax.checkpoint(stage_fn)

        def tick(carry, t):
            act, ve_sum = carry
            # pass last tick's produced activations one stage forward
            # over ICI; stage 0 has no upstream — it injects
            # microbatch t instead
            act_in = (jax.lax.ppermute(act, axis, perm)
                      if n_stages > 1 else act)
            jt = jnp.clip(t, 0, n_micro - 1)
            inj = jnp.broadcast_to(X_mb[jt][None], (S, b, D))
            act_in = jnp.where(s_idx == 0, inj, act_in)
            F, mean, var = stage_fn(act_in, t)
            # the final stage's last layer is global layer L-1: score
            # its microbatch (j = t - (n_stages-1)) when it is real
            j_out = t - (n_stages - 1)
            valid = ((s_idx == n_stages - 1) & (j_out >= 0)
                     & (j_out < n_micro))
            Yj = Y_mb[jnp.clip(j_out, 0, n_micro - 1)]
            ve = model.likelihood.variational_expectations(mean, var, Yj)
            ve_j = jnp.sum(jnp.mean(ve, axis=0))
            ve_sum = ve_sum + jnp.where(valid, ve_j,
                                        jnp.zeros((), dtype=ve_j.dtype))
            return (F, ve_sum), None

        # the tick outputs are varying over the mesh axes (they depend
        # on axis_index / sharded rows); the scan carry's initial values
        # must carry the same varying-axes type
        vary_axes = ((axis,) if data_axis is None else (axis, data_axis))
        if hasattr(jax.lax, "pcast"):
            def pvary(x, axes):
                return jax.lax.pcast(x, axes, to="varying")
        elif hasattr(jax.lax, "pvary"):
            pvary = jax.lax.pvary
        else:  # older jax: no vma typing to satisfy
            def pvary(x, axes):
                return x
        act0 = pvary(jnp.zeros((S, b, D), dtype=X_l.dtype), vary_axes)
        ve0 = pvary(jnp.zeros((), dtype=X_l.dtype), vary_axes)
        (_, ve_sum), _ = jax.lax.scan(tick, (act0, ve0), jnp.arange(T))

        # likelihood partials: only the last stage (and each data shard)
        # holds a non-zero sum
        ve_total = jax.lax.psum(ve_sum, axis)
        if data_axis is not None:
            ve_total = jax.lax.psum(ve_total, data_axis)
        # per-layer KLs live on their owning stage; params are
        # data-replicated so the stage psum counts each exactly once
        KL_local = jnp.zeros((), dtype=X_l.dtype)
        for i in range(L_local):
            KL_local = KL_local + _layer_at(stacked, i).KL()
        KL = jax.lax.psum(KL_local, axis)
        if final_l is not None:
            # the split-final head is replicated: its KL enters once,
            # outside the stage psum
            KL = KL + final_l.KL()
        scale = jnp.asarray(model.num_data, dtype=ve_total.dtype) / B
        return ve_total * scale - KL

    return run(model, X, Y, key, zs)


def make_pp_train_step(tx: optax.GradientTransformation, mesh: Mesh,
                       axis: str = "stage",
                       n_micro: Optional[int] = None,
                       data_axis: Optional[str] = None,
                       batch_size: Optional[int] = None):
    """Jitted pipeline-parallel train step: grads of the staged ELBO
    (differentiated through the scan/ppermute schedule — layer grads
    come back with their stage shardings, so optimizer state shards the
    same way and each device updates only its own layers)."""

    def loss_fn(model, X, Y, key):
        # MAP objective: + log_prior, once (the sum over the stacked
        # leaves is a single global value)
        return -log_prior(model) - pp_elbo(
            model, X, Y, key, mesh, axis=axis, n_micro=n_micro,
            data_axis=data_axis, batch_size=batch_size)

    @jax.jit
    def step(model, opt_state, X, Y, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, X, Y, key)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step
