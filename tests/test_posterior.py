"""Cached-posterior (precompute) tests: the serving-time staged cache
must reproduce the live prediction surface exactly, carry no trainable
state, refuse to train, and survive the export path.

The reference recomputes the full conditional pipeline per prediction
(reference layers.py:167-219); precompute() hoists the parameter-only
work (Kuu Cholesky, inverse, staging) out of the per-request path.
Contract: cached == live `solve_mode='inverse'` predictions to float
roundoff (bitwise on the diag path — same op sequence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import doubly_stochastic_dgp_tpu as dsd
from doubly_stochastic_dgp_tpu import precompute, with_config
from doubly_stochastic_dgp_tpu.models.posterior import CachedSVGPLayer
from doubly_stochastic_dgp_tpu.utils.modules import trainable_mask


def _build(white=False, input_prop=False, n=50, d=3):
    rng = np.random.RandomState(1)
    X = rng.randn(n, d)
    Y = np.sin(X[:, :1]) + 0.1 * rng.randn(n, 1)
    Z = X[: n // 3].copy()
    if input_prop:
        kerns = [dsd.RBF.make(d), dsd.RBF.make(d + 1)]
        layers = dsd.init_layers_input_prop(X, Y, Z, kerns)
        m = dsd.DGP.make(X, Y, dsd.Gaussian.make(0.05), layers,
                         num_samples=2)
    else:
        kerns = [dsd.RBF.make(d), dsd.RBF.make(d)]
        m = dsd.DGP.build(X, Y, Z, kerns, dsd.Gaussian.make(0.05),
                          num_samples=2, white=white)
    # non-trivial q so the cache actually carries information
    layers = list(m.layers)
    rng2 = np.random.RandomState(2)
    for i, l in enumerate(layers):
        layers[i] = l.replace(
            q_mu=l.q_mu.with_value(rng2.randn(*l.q_mu.value.shape) * 0.3))
    return m.replace(layers=layers), X, Y


@pytest.mark.parametrize("white", [False, True])
def test_cached_equals_live_inverse(white):
    m, X, Y = _build(white=white)
    m_inv = with_config(m, solve_mode="inverse")
    post = precompute(m_inv)
    key = jax.random.PRNGKey(7)
    for fn in [lambda mm: mm.predict_f(X[:11], S=3, key=key),
               lambda mm: mm.predict_y(X[:11], S=3, key=key),
               lambda mm: mm.predict_density(X[:11], Y[:11], S=3, key=key),
               lambda mm: mm.predict_all_layers(X[:7], S=2, key=key)]:
        a = jax.tree_util.tree_leaves(fn(m_inv))
        b = jax.tree_util.tree_leaves(fn(post))
        for ai, bi in zip(a, b):
            np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))


def test_cached_full_cov_matches_solve_mode():
    m, X, _ = _build()
    post = precompute(m)
    key = jax.random.PRNGKey(3)
    a = m.predict_f_full_cov(X[:9], S=2, key=key)
    b = post.predict_f_full_cov(X[:9], S=2, key=key)
    for ai, bi in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   atol=1e-10)


def test_cached_input_prop_and_sgpmc():
    # input propagation concat survives the cache
    m, X, _ = _build(input_prop=True)
    post = precompute(m)
    key = jax.random.PRNGKey(11)
    a = m.predict_f(X[:8], S=2, key=key)
    b = post.predict_f(X[:8], S=2, key=key)
    for ai, bi in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   atol=1e-12)
    # q_sqrt=None (SGPMC) path: C is None in the cache
    m2, X2, _ = _build()
    from doubly_stochastic_dgp_tpu.models.layers import SGPMCLayer
    layers = list(m2.layers)
    l0 = layers[-1]
    sg = SGPMCLayer.make(l0.kern, np.asarray(l0.Z.value), l0.num_outputs_)
    sg = sg.replace(q_mu=sg.q_mu.with_value(
        np.random.RandomState(5).randn(*sg.q_mu.value.shape)))
    layers[-1] = sg
    m2 = m2.replace(layers=layers)
    post2 = precompute(m2)
    assert post2.layers[-1].C is None
    a = m2.predict_f(X2[:6], S=2, key=key)
    b = post2.predict_f(X2[:6], S=2, key=key)
    for ai, bi in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   atol=1e-12)


def test_cached_model_has_no_trainables_and_refuses_training():
    m, _, _ = _build()
    post = precompute(m)
    assert all(isinstance(l, CachedSVGPLayer) for l in post.layers)
    # the WHOLE model, not just the layers: the MC-family branch must
    # freeze the likelihood too (round-3 review finding)
    mask = jax.tree_util.tree_leaves(trainable_mask(post))
    assert not any(mask), "no Param in the cached model may be trainable"
    with pytest.raises(NotImplementedError):
        post.elbo(key=jax.random.PRNGKey(0))


# -- collapsed family (round-2 continuation) --------------------------------
# The collapsed models re-run the full collapsed factorization (psi
# stats over all N rows + Choleskys) on every prediction; precompute()
# snapshots it.  zs pins the sampling path so live and cached propagate
# are comparable point-for-point.


def _compare_propagate(m, post, Xs, zs, full_cov=False, atol=1e-8):
    key = jax.random.PRNGKey(0)
    a = m.propagate(jnp.asarray(Xs), key=key, zs=zs, S=2,
                    full_cov=full_cov)
    b = post.propagate(jnp.asarray(Xs), key=key, zs=zs, S=2,
                       full_cov=full_cov)
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for ai, bi in zip(la, lb):
        assert ai.shape == bi.shape
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   atol=atol)


def _build_collapsed(n=24, d=2, d_y=2):
    rng = np.random.RandomState(3)
    X = rng.randn(n, d)
    Y = np.sin(X[:, :1]) + np.array([[0.0, 1.0]]) + 0.1 * rng.randn(n, d_y)
    Z = X[: n // 2].copy()
    kerns = [dsd.RBF.make(d), dsd.RBF.make(d)]
    layers = dsd.init_layers_linear(X, Y, Z, kerns, num_outputs=d_y)
    from doubly_stochastic_dgp_tpu.models.layers import SGPRLayer
    last = SGPRLayer.make(layers[-1].kern, np.asarray(layers[-1].Z.value),
                          d_y, layers[-1].mean_function)
    layers[0] = layers[0].replace(
        q_mu=layers[0].q_mu.with_value(rng.randn(n // 2, d) * 0.4))
    m = dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05),
                              [layers[0], last])
    return m, X, Y


def test_cached_collapsed_sgpr_matches_live():
    m, X, Y = _build_collapsed()
    zs = [0.37, -0.81]
    post = precompute(m, zs=zs)
    assert isinstance(post.layers[-1], CachedSVGPLayer)
    _compare_propagate(m, post, X[:9], zs)
    _compare_propagate(m, post, X[:5], zs, full_cov=True)
    # prediction-only: the collapsed bound is gone, KL raises
    with pytest.raises(NotImplementedError):
        post.elbo(key=jax.random.PRNGKey(0))
    mask = jax.tree_util.tree_leaves(trainable_mask(post))
    assert not any(mask)


def test_cached_heinonen_matches_live():
    from doubly_stochastic_dgp_tpu.models.layers import GPMCLayer, GPRLayer
    from doubly_stochastic_dgp_tpu.models.mean_functions import (Identity,
                                                                 Zero)
    rng = np.random.RandomState(5)
    N, d, d_y = 10, 3, 2
    X = rng.uniform(size=(N, d))
    Y = rng.randn(N, d_y)
    layer0 = GPMCLayer.make(dsd.Matern52.make(d, lengthscales=0.5),
                            X.copy(), d, Identity())
    layer0 = layer0.replace(
        q_mu=layer0.q_mu.with_value(rng.randn(N, d) * 0.3))
    layer1 = GPRLayer.make(dsd.Matern52.make(d, lengthscales=0.7),
                           Zero(output_dim=d_y), d_y)
    m = dsd.DGPHeinonen.make(X, Y, dsd.Gaussian.make(0.01),
                             [layer0, layer1])
    post = precompute(m)
    assert all(isinstance(l, CachedSVGPLayer) for l in post.layers)
    _compare_propagate(m, post, X[:7], zs=[0.11, -0.4])
    _compare_propagate(m, post, X[:4], zs=[0.11, -0.4], full_cov=True)
    # y-space surface goes through the same cached stack
    key = jax.random.PRNGKey(2)
    zsf = [0.0, 0.0]
    a = m.propagate(jnp.asarray(X[:6]), key=key, zs=zsf, S=1)
    b = post.propagate(jnp.asarray(X[:6]), key=key, zs=zsf, S=1)
    np.testing.assert_allclose(np.asarray(a[1][-1]), np.asarray(b[1][-1]),
                               atol=1e-8)


def test_cached_damianou_matches_live():
    rng = np.random.RandomState(7)
    n, d, d_y = 20, 2, 2
    X = rng.randn(n, d)
    Y = np.cos(X[:, :1]) + 0.1 * rng.randn(n, d_y)
    Z = X[: n // 2].copy()
    kerns = [dsd.RBF.make(d), dsd.RBF.make(d)]
    m = dsd.DGPDamianou.build(X, Y, Z, kerns, dsd.Gaussian.make(0.05))
    # non-trivial q(H) so the inner cache carries real state
    m = m.replace(h_mean=[m.h_mean[0].with_value(
        np.asarray(m.h_mean[0].value) + 0.2 * rng.randn(n, d))])
    post = precompute(m)
    assert all(isinstance(l, CachedSVGPLayer) for l in post.layers)
    # the inner layer carries the generative noise sigma_l^2
    assert post.layers[0].extra_var is not None
    np.testing.assert_allclose(np.asarray(post.layers[0].extra_var),
                               np.asarray(m.noise[0].value))
    assert post.layers[-1].extra_var is None
    zs = [0.25, -0.6]
    _compare_propagate(m, post, X[:8], zs)
    _compare_propagate(m, post, X[:4], zs, full_cov=True)
    # predict_y shapes and values through the generic surface
    key = jax.random.PRNGKey(4)
    my, vy = post.predict_y(X[:5], S=3, key=key)
    assert my.shape == (3, 5, d_y) and vy.shape == (3, 5, d_y)
    assert np.all(np.isfinite(np.asarray(my)))
    with pytest.raises(NotImplementedError):
        post.elbo(key=key)


def test_cached_single_layer_baselines_match_live():
    """GPR / SGPR / GPRFITC (the UCI-notebook gpflow baselines) cache to
    the same staged form; the non-sampled prediction API is preserved."""
    from doubly_stochastic_dgp_tpu.models.posterior import (
        CachedSingleLayerGP)
    from doubly_stochastic_dgp_tpu.models.single_layer import (GPR, GPRFITC,
                                                               SGPR)
    rng = np.random.RandomState(9)
    n, d, d_y = 25, 2, 2
    X = rng.randn(n, d)
    Y = np.sin(X[:, :1]) + 0.1 * rng.randn(n, d_y)
    Z = X[:8].copy()
    Xs = rng.randn(7, d)
    models = [GPR.build(X, Y, dsd.RBF.make(d), noise_variance=0.05),
              SGPR.build(X, Y, dsd.RBF.make(d), Z, noise_variance=0.05),
              GPRFITC.build(X, Y, dsd.RBF.make(d), Z, noise_variance=0.05)]
    for m in models:
        post = precompute(m)
        assert isinstance(post, CachedSingleLayerGP)
        for fn in [lambda mm: mm.predict_f(Xs),
                   lambda mm: mm.predict_f_full_cov(Xs),
                   lambda mm: mm.predict_y(Xs),
                   lambda mm: mm.predict_density(Xs, Y[:7])]:
            a = jax.tree_util.tree_leaves(fn(m))
            b = jax.tree_util.tree_leaves(fn(post))
            for ai, bi in zip(a, b):
                assert ai.shape == bi.shape
                np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                           atol=1e-9)
        mask = jax.tree_util.tree_leaves(trainable_mask(post))
        assert not any(mask)
        with pytest.raises(NotImplementedError):
            post.log_likelihood()


def test_cached_collapsed_composes_with_mesh_prediction():
    """The prediction-only cached stack is an ordinary pytree model, so
    the sample-sharded mesh paths (dp_predict_y / dp_predict_density)
    work on it unchanged; equality vs the per-device emulation oracle."""
    from doubly_stochastic_dgp_tpu.parallel.dp import (dp_predict_density,
                                                       dp_predict_y)
    from doubly_stochastic_dgp_tpu.parallel.mesh import make_mesh
    m, X, Y = _build_collapsed()
    post = precompute(m)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(0)
    S, n = 8, mesh.shape["data"]
    got = dp_predict_y(post, jnp.asarray(X[:16]), S=S, key=key, mesh=mesh)
    ms, vs = [], []
    for d in range(n):
        Fm, Fv = post._predict(jnp.asarray(X[:16]),
                               key=jax.random.fold_in(key, d),
                               full_cov=False, S=S // n)
        mm, vv = post.sample_predict_y(Fm, Fv)
        ms.append(mm)
        vs.append(vv)
    mm = jnp.concatenate(ms)
    vv = jnp.concatenate(vs)
    mp = jnp.mean(mm, 0)
    want = (mp, jnp.mean(vv + mm ** 2, 0) - mp ** 2)
    for gi, wi in zip(got, want):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   atol=1e-12)
    dens = dp_predict_density(post, jnp.asarray(X[:16]),
                              jnp.asarray(Y[:16]), S=S, key=key, mesh=mesh)
    assert np.all(np.isfinite(np.asarray(dens)))


def test_export_predict_y_cached_single_layer(tmp_path):
    """Round-2 ADVICE #1: precomputed export of the single-layer
    baselines maps to CachedSingleLayerGP, whose predictive is
    deterministic — the export fn's S=/key= kwargs must be accepted
    (and ignored) instead of raising TypeError at trace time."""
    from doubly_stochastic_dgp_tpu.models.single_layer import (GPR, GPRFITC,
                                                               SGPR)
    from doubly_stochastic_dgp_tpu.serving import (export_predict_y,
                                                   load_exported)
    rng = np.random.RandomState(5)
    X = rng.randn(20, 2)
    Y = np.sin(X[:, :1]) + 0.05 * rng.randn(20, 1)
    Z = X[:6].copy()
    models = [GPR.build(X, Y, dsd.RBF.make(2), noise_variance=0.05),
              SGPR.build(X, Y, dsd.RBF.make(2), Z, noise_variance=0.05),
              GPRFITC.build(X, Y, dsd.RBF.make(2), Z, noise_variance=0.05)]
    for m in models:
        path = str(tmp_path / f"{type(m).__name__}.bin")
        export_predict_y(m, batch_size=5, S=3, path=path, precomputed=True)
        call = load_exported(path)
        got = call(precompute(m), jnp.asarray(X[:5]), jax.random.PRNGKey(0))
        want = m.predict_y(X[:5])
        for gi, wi in zip(jax.tree_util.tree_leaves(got),
                          jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                       atol=1e-9)


def _build_collapsed_deep(n=20, d=2, d_y=1):
    """3-layer collapsed stack: TWO stochastic inner layers, so the
    collapsed factorization depends on the inner propagation draw."""
    from doubly_stochastic_dgp_tpu.models.layers import SGPRLayer
    rng = np.random.RandomState(8)
    X = rng.randn(n, d)
    Y = np.sin(X[:, :1]) + 0.1 * rng.randn(n, d_y)
    Z = X[: n // 2].copy()
    kerns = [dsd.RBF.make(d), dsd.RBF.make(d), dsd.RBF.make(d)]
    layers = dsd.init_layers_linear(X, Y, Z, kerns, num_outputs=d_y)
    last = SGPRLayer.make(layers[-1].kern, np.asarray(layers[-1].Z.value),
                          d_y, layers[-1].mean_function)
    for i in (0, 1):
        layers[i] = layers[i].replace(
            q_mu=layers[i].q_mu.with_value(rng.randn(n // 2, d) * 0.4))
    return dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05),
                                 layers[:2] + [last]), X, Y


def test_precompute_warns_on_multi_stochastic_inner_draw():
    """Round-2 ADVICE #2: with >1 stochastic inner layer and no explicit
    key/zs, precompute bakes ONE inner draw into the snapshot — warn so
    the frozen draw isn't mistaken for the live (re-drawn) predictive."""
    import warnings
    m3, X, _ = _build_collapsed_deep()
    with pytest.warns(UserWarning, match="inner-propagation draw"):
        precompute(m3)
    # explicit key (or zs): the caller chose the draw — no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        precompute(m3, key=jax.random.PRNGKey(1))
        precompute(m3, zs=[0.1, -0.2, 0.3])
        # one inner layer: the collapsed inputs are the deterministic
        # first-layer moments — nothing is frozen, no warning
        m2, _, _ = _build_collapsed()
        precompute(m2)


def test_cached_export_roundtrip(tmp_path):
    from doubly_stochastic_dgp_tpu.serving import (export_predict_y,
                                                   load_exported)
    from doubly_stochastic_dgp_tpu.models.posterior import precompute as pc
    m, X, _ = _build(n=30)
    path = str(tmp_path / "cached.bin")
    export_predict_y(m, batch_size=8, S=3, path=path, precomputed=True)
    call = load_exported(path)
    key = jax.random.PRNGKey(0)
    got = call(pc(m), jnp.asarray(X[:8]), key)
    want = m.predict_y(X[:8], S=3, key=key)
    for gi, wi in zip(jax.tree_util.tree_leaves(got),
                      jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   atol=1e-10)
