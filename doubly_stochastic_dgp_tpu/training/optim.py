"""Optimizer plumbing: optax transforms over model pytrees with
trainability masks, jitted train steps, and an L-BFGS wrapper.

Rebuilds the optimizer surface of the reference (SURVEY §2.3):
AdamOptimizer (run_regression.py:83) -> optax.adam over the model pytree;
ScipyOptimizer (L-BFGS, tests/test_dgp.py:150) -> optax.lbfgs with line
search; the alternating NatGrad+Adam loop (UCI nb cell 17) -> compose a
frozen-mask Adam with training.natgrad.NaturalGradient.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..utils.modules import Param, trainable_mask

__all__ = ["masked_optimizer", "make_train_step", "adam", "lbfgs_minimize",
           "freeze_q_params"]


def freeze_q_params(layer_indices: Sequence[int], num_layers: int):
    """A freeze predicate for trainable_mask that removes (q_mu, q_sqrt)
    of the given layers from the gradient optimizer — they are handled by
    the natural-gradient optimizer in the alternating loop."""
    idxs = {i % num_layers for i in layer_indices}

    def freeze(path, param: Param) -> bool:
        # paths look like ('layers', i, 'q_mu', 'unconstrained')-prefixes
        for j, p in enumerate(path):
            if p == "layers" and j + 2 < len(path) + 1:
                try:
                    i = int(path[j + 1])
                except (ValueError, TypeError, IndexError):
                    continue
                if i in idxs and any(q in path for q in ("q_mu", "q_sqrt")):
                    return True
        return False

    return freeze


def masked_optimizer(tx: optax.GradientTransformation, model,
                     freeze=None) -> optax.GradientTransformation:
    """Wrap an optax transform so only trainable Param leaves update.

    Buffers (bare arrays: data holders, fixed Cholesky factors) and
    frozen Params pass through untouched — the JAX analogue of GPflow's
    per-parameter ``set_trainable`` (reference
    layer_initializations.py:42)."""
    mask = trainable_mask(model, freeze=freeze)
    labels = jax.tree_util.tree_map(
        lambda t: "train" if t else "frozen", mask)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)


def adam(learning_rate: float = 0.01, **kwargs):
    return optax.adam(learning_rate, **kwargs)


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    donate: bool = True):
    """Build a jitted train step: (model, opt_state, *args) ->
    (model, opt_state, loss).

    ``loss_fn(model, *args)`` is typically
    ``lambda m, X, Y, key: -m.elbo(X, Y, key)`` — the whole reference
    per-step session.run (SURVEY §3.2) collapses into this one XLA
    program.
    """

    def step(model, opt_state, *args):
        loss, grads = jax.value_and_grad(loss_fn)(model, *args)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def partition_trainable(model, freeze=None):
    """Split the model into a flat vector of trainable leaves and a
    rebuild function (for whole-vector optimizers like L-BFGS)."""
    from jax.flatten_util import ravel_pytree

    mask = trainable_mask(model, freeze=freeze)
    leaves, treedef = jax.tree_util.tree_flatten(model)
    mask_leaves = jax.tree_util.tree_flatten(mask)[0]
    train_leaves = [l for l, t in zip(leaves, mask_leaves) if t]
    flat, unravel = ravel_pytree(train_leaves)

    def rebuild(flat_vec):
        tl = iter(unravel(flat_vec))
        new_leaves = [next(tl) if t else l
                      for l, t in zip(leaves, mask_leaves)]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    return flat, rebuild


def lbfgs_minimize(loss_fn: Callable, model, max_iters: int = 500,
                   tol: float = 1e-9, freeze=None):
    """L-BFGS over the trainable leaves (the ScipyOptimizer analogue;
    reference tests/test_dgp.py:150).  optax.lbfgs with zoom line search
    on the raveled trainable vector."""
    flat, rebuild = partition_trainable(model, freeze=freeze)

    def flat_loss(v):
        return loss_fn(rebuild(v))

    tx = optax.lbfgs()
    opt_state = tx.init(flat)
    value_and_grad = optax.value_and_grad_from_state(flat_loss)

    @jax.jit
    def step(v, opt_state):
        loss, grads = value_and_grad(v, state=opt_state)
        updates, opt_state = tx.update(
            grads, opt_state, v, value=loss, grad=grads,
            value_fn=flat_loss)
        v = optax.apply_updates(v, updates)
        return v, opt_state, loss

    prev = jnp.inf
    loss = prev
    for _ in range(max_iters):
        flat, opt_state, loss = step(flat, opt_state)
        if abs(float(prev) - float(loss)) < tol:
            break
        prev = loss
    return rebuild(flat), float(loss)
