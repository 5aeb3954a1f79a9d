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


# ---------------------------------------------------------------------------
# Generic DGPCollapsed over the mesh (round-2 VERDICT next-step #2): MC
# inner layers propagate locally, the collapsed moments psum.
# ---------------------------------------------------------------------------

def _collapsed_model(N=32, D=2, D_Y=2, M=8, L=2, last="sgpr", seed=3):
    """L-layer DGPCollapsed: (L-1) stochastic SVGP inner layers + a
    collapsed final layer (SGPR or exact GPR)."""
    from doubly_stochastic_dgp_tpu.models.layers import (GPRLayer,
                                                         SGPRLayer)
    rng = np.random.RandomState(seed)
    X = rng.randn(N, D)
    Y = np.sin(X[:, :1]) + np.linspace(0, 1, D_Y)[None] \
        + 0.1 * rng.randn(N, D_Y)
    Z = X[:M].copy()
    kerns = [dsd.RBF.make(D) for _ in range(L)]
    layers = dsd.init_layers_linear(X, Y, Z, kerns, num_outputs=D_Y)
    if last == "sgpr":
        fin = SGPRLayer.make(layers[-1].kern,
                             np.asarray(layers[-1].Z.value), D_Y,
                             layers[-1].mean_function)
    else:
        fin = GPRLayer.make(layers[-1].kern, layers[-1].mean_function,
                            D_Y)
    inner = []
    for l in layers[:-1]:
        inner.append(l.replace(q_mu=l.q_mu.with_value(
            rng.randn(*l.q_mu.value.shape) * 0.4)))
    m = dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05),
                              inner + [fin])
    return m, X, Y


def _collapsed_oracle(m, zs):
    """Single-device bound with the same fixed inner draws."""
    last = m._collapsed_last_layer(key=jax.random.PRNGKey(0), zs=zs)
    KL = sum((l.KL() for l in m.layers[:-1]),
             jnp.zeros((), dtype=m.X_data.dtype))
    return last.build_likelihood() - KL


def _fixed_zs(m, seed=1):
    rng = np.random.RandomState(seed)
    N = m.X_data.shape[0]
    return [jnp.asarray(rng.randn(1, N, l.num_outputs))
            for l in m.layers]


def test_dp_collapsed_elbo_equals_single_device():
    from doubly_stochastic_dgp_tpu.parallel.collapsed import (
        collapsed_shard, dp_collapsed_elbo)
    m, _, _ = _collapsed_model()
    mesh = make_mesh()
    zs = _fixed_zs(m)
    ref = float(_collapsed_oracle(m, zs))
    sharded = collapsed_shard(m, mesh)
    got = float(dp_collapsed_elbo(sharded, mesh, zs=zs))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_dp_collapsed_three_layer_elbo_equals_single_device():
    """Two stochastic inner layers: the sharded inner propagation (same
    row-sharded zs) feeds the same collapsed moments."""
    from doubly_stochastic_dgp_tpu.parallel.collapsed import \
        dp_collapsed_elbo
    m, _, _ = _collapsed_model(L=3, N=24, M=6)
    mesh = make_mesh()
    zs = _fixed_zs(m, seed=2)
    ref = float(_collapsed_oracle(m, zs))
    got = float(dp_collapsed_elbo(m, mesh, zs=zs))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_dp_collapsed_gpr_final_layer_equals_single_device():
    from doubly_stochastic_dgp_tpu.parallel.collapsed import \
        dp_collapsed_elbo
    m, _, _ = _collapsed_model(last="gpr", N=24, M=6)
    mesh = make_mesh()
    zs = _fixed_zs(m, seed=4)
    ref = float(_collapsed_oracle(m, zs))
    got = float(dp_collapsed_elbo(m, mesh, zs=zs))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_dp_collapsed_grads_equal_single_device():
    from doubly_stochastic_dgp_tpu.parallel.collapsed import \
        dp_collapsed_elbo
    m, _, _ = _collapsed_model(N=16, M=4)
    mesh = make_mesh()
    zs = _fixed_zs(m, seed=5)

    g1 = jax.tree_util.tree_leaves(
        jax.grad(lambda mm: -_collapsed_oracle(mm, zs))(m))
    g2 = jax.tree_util.tree_leaves(
        jax.grad(lambda mm: -dp_collapsed_elbo(mm, mesh, zs=zs))(m))
    assert len(g1) == len(g2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


def test_dp_collapsed_training_improves():
    from doubly_stochastic_dgp_tpu.parallel.collapsed import (
        collapsed_shard, make_dp_collapsed_train_step)
    m, _, _ = _collapsed_model()
    mesh = make_mesh()
    m = collapsed_shard(m, mesh)
    tx = masked_optimizer(optax.adam(0.02), m)
    st = tx.init(m)
    step = make_dp_collapsed_train_step(tx, mesh)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(20):
        m, st, loss = step(m, st, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def test_dp_collapsed_rejects_heinonen():
    """DGPHeinonen's GPMC latents are full-N and replicated — feeding
    them through the row-sharded stages would all_gather n_dev copies
    against N targets and die with an opaque shape error; the entry
    point must reject it up front (code-review round-3 finding)."""
    import pytest

    from doubly_stochastic_dgp_tpu import (DGPHeinonen, Gaussian,
                                           Identity, Zero)
    from doubly_stochastic_dgp_tpu.models.layers import (GPMCLayer,
                                                         GPRLayer)
    from doubly_stochastic_dgp_tpu.parallel.collapsed import \
        dp_collapsed_elbo

    rng = np.random.RandomState(0)
    X = rng.randn(16, 2)
    Y = np.sin(X[:, :1])
    layer0 = GPMCLayer.make(dsd.RBF.make(2), X.copy(), 2, Identity())
    layer1 = GPRLayer.make(dsd.RBF.make(2), Zero(output_dim=1), 1)
    m = DGPHeinonen.make(X, Y, Gaussian.make(0.05), [layer0, layer1])
    with pytest.raises(NotImplementedError, match="Heinonen"):
        dp_collapsed_elbo(m, make_mesh())
