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
    mask = jax.tree_util.tree_leaves(trainable_mask(post.layers))
    assert not any(mask), "cache buffers must not be trainable"
    with pytest.raises(NotImplementedError):
        post.elbo(key=jax.random.PRNGKey(0))


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
