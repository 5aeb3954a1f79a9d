"""End-to-end parity of the fused-Pallas layer path: full DGP ELBO and
gradients with config.use_pallas must match the XLA path (interpret mode
on CPU, float64)."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import DGP, Gaussian, RBF, White, with_config


def _model():
    np.random.seed(0)
    N, D, M = 48, 3, 10
    X = np.random.rand(N, D)
    Y = np.sin(X.sum(1, keepdims=True))
    Z = X[:M].copy()
    kerns = [RBF.make(D, lengthscales=0.6) + White.make(D, variance=2e-6),
             RBF.make(D, lengthscales=0.6)]
    return DGP.build(X, Y, Z, kerns, Gaussian.make(0.05), num_samples=3)


def _det_loss(m):
    zs = [jnp.zeros((3, 1, l.num_outputs)) for l in m.layers]
    _, Fm, Fv = m.propagate(m.X_data, zs=zs, S=3)
    ve = m.likelihood.variational_expectations(Fm[-1], Fv[-1], m.Y_data)
    KL = sum((l.KL() for l in m.layers), jnp.zeros((), ve.dtype))
    return -(jnp.sum(jnp.mean(ve, 0)) - KL)


def test_fused_elbo_and_grads_match_xla():
    m = _model()
    m_ref = with_config(m, solve_mode="inverse", use_pallas=False)
    m_fused = with_config(m, solve_mode="inverse", use_pallas=True)
    l_ref = float(_det_loss(m_ref))
    g_ref = jax.grad(_det_loss)(m_ref)
    l_pl = float(_det_loss(m_fused))
    g_pl = jax.grad(_det_loss)(m_fused)

    assert_allclose(l_pl, l_ref, rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pl)):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                        atol=1e-10)


def test_auto_mode_on_cpu_takes_xla_path():
    """use_pallas='auto' must resolve to the XLA path off-TPU (and thus
    agree exactly with use_pallas=False)."""
    m = _model()
    m_auto = with_config(m, use_pallas="auto")
    m_off = with_config(m, use_pallas=False)
    l_a = float(_det_loss(m_auto))
    l_o = float(_det_loss(m_off))
    assert l_a == l_o


def test_fused_predictions_match():
    m = _model()
    Xs = jnp.asarray(np.random.rand(20, 3))
    key = jax.random.PRNGKey(0)
    m1, v1 = with_config(m, solve_mode="inverse",
                         use_pallas=False).predict_y(Xs, S=2, key=key)
    m2, v2 = with_config(m, solve_mode="inverse",
                         use_pallas=True).predict_y(Xs, S=2, key=key)
    assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-8, atol=1e-10)
    assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-8, atol=1e-10)
