"""Data-parallel Damianou bound (parallel/collapsed.py): the mesh
computation must equal the single-device bound and its gradients
exactly (float64 CPU mesh), and dp training must improve the bound."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import doubly_stochastic_dgp_tpu as dsd
from doubly_stochastic_dgp_tpu.parallel.collapsed import (
    damianou_shard, dp_damianou_elbo, make_dp_damianou_train_step)
from doubly_stochastic_dgp_tpu.parallel.mesh import make_mesh
from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer


def _model(N=32, D=3, M=6, L=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(N, D))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.randn(N, 1)
    kerns = [dsd.RBF.make(D, lengthscales=0.8)] + \
        [dsd.RBF.make(D) for _ in range(L - 1)]
    return dsd.DGPDamianou.build(X, Y, X[:M].copy(), kerns,
                                 dsd.Gaussian.make(0.05))


def test_dp_damianou_elbo_equals_single_device():
    model = _model()
    mesh = make_mesh()
    sharded = damianou_shard(model, mesh)
    e1 = float(model.elbo())
    e8 = float(dp_damianou_elbo(sharded, mesh))
    np.testing.assert_allclose(e8, e1, rtol=1e-10)


def test_dp_damianou_single_layer_is_collapsed_sgpr():
    model = _model(L=1)
    mesh = make_mesh()
    sharded = damianou_shard(model, mesh)
    np.testing.assert_allclose(float(dp_damianou_elbo(sharded, mesh)),
                               float(model.elbo()), rtol=1e-10)


def test_dp_damianou_grads_equal_single_device():
    model = _model()
    mesh = make_mesh()
    sharded = damianou_shard(model, mesh)
    g1 = jax.grad(lambda m: m.elbo())(model)
    g8 = jax.grad(lambda m: dp_damianou_elbo(m, mesh))(sharded)
    leaves1 = jax.tree_util.tree_leaves(g1)
    leaves8 = jax.tree_util.tree_leaves(g8)
    assert len(leaves1) == len(leaves8)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


def test_dp_damianou_training_improves():
    model = _model(N=48)
    mesh = make_mesh()
    model = damianou_shard(model, mesh)
    tx = masked_optimizer(optax.adam(0.02), model)
    state = tx.init(model)
    step = make_dp_damianou_train_step(tx, mesh)
    loss0 = None
    for _ in range(40):
        model, state, loss = step(model, state)
        if loss0 is None:
            loss0 = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < loss0 - 1.0
    # the sharded q(H) state moved (it trains in place on its devices)
    assert float(jnp.std(model.h_var[0].value)) > 0
