"""Output-dim (model-parallel) sharding tests on the virtual CPU mesh:
the dim-sharded ELBO and its gradients must equal the single-device
values exactly (fixed zs), and the train step must improve the bound."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import DGP, Gaussian, RBF
from doubly_stochastic_dgp_tpu.parallel.mesh import make_mesh
from doubly_stochastic_dgp_tpu.parallel.outdim import (
    make_outdim_train_step, outdim_elbo, outdim_shard)


def _model(N=12, D=4, M=5, S=3, D_Y=4):
    """Hidden widths == D so every layer has D_out divisible by the
    mesh; Identity/Zero mean functions exercise the localization."""
    np.random.seed(0)
    X = np.random.randn(N, D)
    Y = np.random.randn(N, D_Y)
    Z = np.random.randn(M, D)
    kerns = [RBF.make(D), RBF.make(D)]
    return DGP.build(X, Y, Z, kerns, Gaussian.make(0.1), num_samples=S,
                     num_outputs=D_Y)


def _single_device_elbo(m, zs):
    S = m.num_samples
    _, Fm, Fv = m.propagate(m.X_data, zs=zs, S=S)
    ve = m.likelihood.variational_expectations(Fm[-1], Fv[-1], m.Y_data)
    KL = sum((l.KL() for l in m.layers), jnp.zeros((), dtype=ve.dtype))
    return jnp.sum(jnp.mean(ve, 0)) - KL


def test_outdim_elbo_matches_single_device():
    m = _model()
    mesh = make_mesh(num_devices=4, axis="dim")
    S = m.num_samples
    rng = np.random.RandomState(1)
    zs = [jnp.asarray(rng.randn(S, 1, l.num_outputs)) for l in m.layers]

    ref = float(_single_device_elbo(m, zs))
    got = float(outdim_elbo(m, m.X_data, m.Y_data, None, mesh,
                            axis="dim", zs=zs))
    assert_allclose(got, ref, rtol=1e-12)


def test_outdim_gradients_match_single_device():
    m = _model(D=2, D_Y=2, S=1)
    mesh = make_mesh(num_devices=2, axis="dim")
    rng = np.random.RandomState(2)
    zs = [jnp.asarray(rng.randn(1, 1, l.num_outputs)) for l in m.layers]

    def loss_single(model):
        return -_single_device_elbo(model, zs)

    def loss_tp(model):
        return -outdim_elbo(model, model.X_data, model.Y_data, None,
                            mesh, axis="dim", zs=zs)

    g1 = jax.tree_util.tree_leaves(jax.grad(loss_single)(m))
    g2 = jax.tree_util.tree_leaves(jax.grad(loss_tp)(m))
    assert len(g1) == len(g2)
    for a, b in zip(g1, g2):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9,
                        atol=1e-12)


def test_outdim_train_step_improves():
    import optax
    m = _model()
    mesh = make_mesh(num_devices=4, axis="dim")
    m = outdim_shard(m, mesh)
    tx = optax.adam(0.02)
    opt_state = tx.init(m)
    step = make_outdim_train_step(tx, mesh)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        m, opt_state, loss = step(m, opt_state, m.X_data, m.Y_data,
                                  jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def test_2d_mesh_elbo_matches_single_device():
    """Composed data x dim mesh (2 x 4): the double-sharded ELBO equals
    the single-device bound exactly (fixed zs; KL counted once)."""
    from jax.sharding import Mesh
    from doubly_stochastic_dgp_tpu.parallel.outdim import elbo_2d

    m = _model(N=16, D=4, D_Y=4, S=2)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "dim"))
    S = m.num_samples
    rng = np.random.RandomState(3)
    zs = [jnp.asarray(rng.randn(S, 1, l.num_outputs)) for l in m.layers]

    ref = float(_single_device_elbo(m, zs))
    got = float(elbo_2d(m, m.X_data, m.Y_data, None, mesh, zs=zs))
    assert_allclose(got, ref, rtol=1e-12)


def test_2d_mesh_train_step_improves():
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from doubly_stochastic_dgp_tpu.parallel.outdim import (
        make_2d_train_step, outdim_specs)

    m = _model(N=16, D=4, D_Y=4, S=2)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "dim"))
    # place params with their dim shardings; replicate over data
    specs = outdim_specs(m, "dim")
    m = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), m, specs)
    X = jax.device_put(m.X_data, NamedSharding(mesh, P("data")))
    Y = jax.device_put(m.Y_data, NamedSharding(mesh, P("data", "dim")))
    tx = optax.adam(0.02)
    st = tx.init(m)
    step = make_2d_train_step(tx, mesh)
    losses = []
    for i in range(15):
        m, st, loss = step(m, st, X, Y,
                           jax.random.fold_in(jax.random.PRNGKey(0), i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def test_3d_mesh_elbo_matches_single_device():
    """Full 3-D (data x sample x dim) mesh, 2x2x2: the triple-sharded
    ELBO equals the single-device bound exactly (fixed zs sharded over
    sample and dim; KL counted once)."""
    from jax.sharding import Mesh
    from doubly_stochastic_dgp_tpu.parallel.outdim import elbo_3d

    m = _model(N=16, D=4, D_Y=4, S=4)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "sample", "dim"))
    S = m.num_samples
    rng = np.random.RandomState(5)
    zs = [jnp.asarray(rng.randn(S, 1, l.num_outputs)) for l in m.layers]

    ref = float(_single_device_elbo(m, zs))
    got = float(elbo_3d(m, m.X_data, m.Y_data, None, mesh, zs=zs))
    assert_allclose(got, ref, rtol=1e-12)


def test_3d_mesh_train_step_improves():
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from doubly_stochastic_dgp_tpu.parallel.outdim import (
        make_3d_train_step, outdim_specs)

    m = _model(N=16, D=4, D_Y=4, S=4)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "sample", "dim"))
    specs = outdim_specs(m, "dim")
    m = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), m, specs)
    X = jax.device_put(m.X_data, NamedSharding(mesh, P("data")))
    Y = jax.device_put(m.Y_data, NamedSharding(mesh, P("data", None)))
    tx = optax.adam(0.02)
    st = tx.init(m)
    step = make_3d_train_step(tx, mesh)
    losses = []
    for i in range(12):
        m, st, loss = step(m, st, X, Y,
                           jax.random.fold_in(jax.random.PRNGKey(0), i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def _mnist_shape_model(N=16, D=784, H=12, K=10, M=8, S=2):
    """The MNIST-shape MultiClass DGP of SURVEY §2.4 / demo_mnist.ipynb
    cell 5 (784 -> hidden -> 10 latent GPs under robust-max), tiny
    N/M/H so the f64 CPU oracle stays cheap (the PCA step-down needs
    N >= hidden width)."""
    from doubly_stochastic_dgp_tpu import MultiClass

    rng = np.random.RandomState(7)
    X = rng.randn(N, D)
    Y = rng.randint(0, K, size=(N, 1))
    Z = X[:M].copy()
    kerns = [RBF.make(D), RBF.make(H)]
    m = DGP.build(X, Y, Z, kerns, MultiClass.make(K), num_samples=S,
                  num_outputs=K)
    # non-trivial q_mu so the robust-max expectation has real structure
    layers = [l.replace(q_mu=l.q_mu.with_value(
        rng.randn(*l.q_mu.value.shape) * 0.5)) for l in m.layers]
    return m.replace(layers=layers)


def test_outdim_multiclass_elbo_matches_single_device():
    """Round-2 VERDICT next-step #1: the MNIST-shape MultiClass model
    trains dim-sharded — the final-layer moments all_gather before the
    (dim-coupled) robust-max variational expectation."""
    m = _mnist_shape_model()
    mesh = make_mesh(num_devices=2, axis="dim")
    S = m.num_samples
    rng = np.random.RandomState(11)
    zs = [jnp.asarray(rng.randn(S, 1, l.num_outputs)) for l in m.layers]

    ref = float(_single_device_elbo(m, zs))
    got = float(outdim_elbo(m, m.X_data, m.Y_data, None, mesh,
                            axis="dim", zs=zs))
    assert_allclose(got, ref, rtol=1e-12)


def test_outdim_multiclass_gradients_match_single_device():
    m = _mnist_shape_model(N=8, D=12, H=4, K=4, M=4, S=1)
    mesh = make_mesh(num_devices=2, axis="dim")
    rng = np.random.RandomState(12)
    zs = [jnp.asarray(rng.randn(1, 1, l.num_outputs)) for l in m.layers]

    def loss_single(model):
        return -_single_device_elbo(model, zs)

    def loss_tp(model):
        return -outdim_elbo(model, model.X_data, model.Y_data, None,
                            mesh, axis="dim", zs=zs)

    g1 = jax.tree_util.tree_leaves(jax.grad(loss_single)(m))
    g2 = jax.tree_util.tree_leaves(jax.grad(loss_tp)(m))
    assert len(g1) == len(g2)
    for a, b in zip(g1, g2):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9,
                        atol=1e-12)


def test_2d_mesh_multiclass_elbo_and_train_step():
    """The composed data x dim mesh (4 x 2) on the MNIST-shape
    MultiClass model: exact equality with fixed zs, then the jitted
    train step improves the stochastic bound."""
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from doubly_stochastic_dgp_tpu.parallel.outdim import (
        elbo_2d, make_2d_train_step, outdim_specs)

    m = _mnist_shape_model(N=16, D=20, H=6, K=10, M=6, S=2)
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "dim"))
    S = m.num_samples
    rng = np.random.RandomState(13)
    zs = [jnp.asarray(rng.randn(S, 1, l.num_outputs)) for l in m.layers]

    ref = float(_single_device_elbo(m, zs))
    got = float(elbo_2d(m, m.X_data, m.Y_data, None, mesh, zs=zs))
    assert_allclose(got, ref, rtol=1e-12)

    specs = outdim_specs(m, "dim")
    m = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), m, specs)
    X = jax.device_put(m.X_data, NamedSharding(mesh, P("data")))
    Y = jax.device_put(m.Y_data, NamedSharding(mesh, P("data")))
    tx = optax.adam(0.02)
    st = tx.init(m)
    step = make_2d_train_step(tx, mesh)
    losses = []
    for i in range(12):
        m, st, loss = step(m, st, X, Y,
                           jax.random.fold_in(jax.random.PRNGKey(0), i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def test_3d_mesh_multiclass_elbo_matches_single_device():
    from jax.sharding import Mesh
    from doubly_stochastic_dgp_tpu.parallel.outdim import elbo_3d

    m = _mnist_shape_model(N=8, D=10, H=4, K=4, M=4, S=4)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "sample", "dim"))
    S = m.num_samples
    rng = np.random.RandomState(14)
    zs = [jnp.asarray(rng.randn(S, 1, l.num_outputs)) for l in m.layers]

    ref = float(_single_device_elbo(m, zs))
    got = float(elbo_3d(m, m.X_data, m.Y_data, None, mesh, zs=zs))
    assert_allclose(got, ref, rtol=1e-12)


def test_outdim_input_prop_elbo_and_grads_match_single_device():
    """Input-propagation stacks under dim sharding (round-3): the
    propagated raw input columns are replicated, each layer's hidden
    D_out shards, and the gathered samples get the raw columns
    re-prepended — must equal the single-device bound and gradients
    exactly with fixed zs."""
    from doubly_stochastic_dgp_tpu import Gaussian as G
    from doubly_stochastic_dgp_tpu import init_layers_input_prop
    from doubly_stochastic_dgp_tpu.models.dgp import DGPBase

    np.random.seed(4)
    N, D, M, S, D_Y = 10, 2, 5, 2, 2
    X = np.random.randn(N, D)
    Y = np.random.randn(N, D_Y)
    Z = np.random.randn(M, D)
    # hidden width 2 (divisible by the 2-device mesh): layer widths
    # D -> (2 hidden + D prop) -> D_Y
    kerns = [RBF.make(D), RBF.make(D + 2)]
    layers = init_layers_input_prop(X, Y, Z, kerns, num_outputs=D_Y)
    m = DGPBase.make(X, Y, G.make(0.1), layers, num_samples=S)

    mesh = make_mesh(num_devices=2, axis="dim")
    rng = np.random.RandomState(7)
    zs = [jnp.asarray(rng.randn(S, 1, l.num_outputs)) for l in m.layers]

    ref = float(_single_device_elbo(m, zs))
    got = float(outdim_elbo(m, m.X_data, m.Y_data, None, mesh,
                            axis="dim", zs=zs))
    assert_allclose(got, ref, rtol=1e-12)

    g1 = jax.grad(lambda mm: -_single_device_elbo(mm, zs))(m)
    g2 = jax.grad(lambda mm: -outdim_elbo(mm, mm.X_data, mm.Y_data,
                                          None, mesh, axis="dim",
                                          zs=zs))(m)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9,
                        atol=1e-11)
