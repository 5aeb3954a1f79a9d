"""Single-layer model classes (the UCI-notebook baselines): GPR vs
numpy exact, SGPR vs numpy Titsias + SGPR->GPR at Z=X, SVGP degeneracy,
FITC vs brute-force dense marginal."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose
from scipy import stats

from doubly_stochastic_dgp_tpu import Gaussian, RBF
from doubly_stochastic_dgp_tpu.config import temp_config
from doubly_stochastic_dgp_tpu.models.single_layer import (GPR, GPRFITC,
                                                           SGPR, SVGP)

from oracles import np_gpr_marginal, np_gpr_predict, np_rbf, np_sgpr_bound


def _data(N=12, M=5, D=2, D_Y=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.rand(N, D)
    Y = rng.randn(N, D_Y)
    Z = rng.rand(M, D)
    Xs = rng.rand(7, D)
    return X, Y, Z, Xs


def test_gpr_exact():
    X, Y, Z, Xs = _data()
    with temp_config(jitter=1e-12):
        kern = RBF.make(2, variance=1.3, lengthscales=0.7)
        m = GPR.build(X, Y, kern, noise_variance=0.1)
        kf = lambda a, b: np_rbf(a, b, 1.3, 0.7)
        assert_allclose(float(m.log_likelihood()),
                        np_gpr_marginal(kf(X, X), Y, 0.1), rtol=1e-9)
        mean, var = m.predict_f(Xs)
        me, ve = np_gpr_predict(kf, X, Y, Xs, 0.1)
        assert_allclose(np.asarray(mean), me, rtol=1e-8, atol=1e-10)
        assert_allclose(np.asarray(var)[:, 0], ve, rtol=1e-7, atol=1e-10)


def test_sgpr_titsias():
    X, Y, Z, Xs = _data()
    with temp_config(jitter=1e-12):
        kern = RBF.make(2, variance=1.1, lengthscales=0.6)
        m = SGPR.build(X, Y, kern, Z, noise_variance=0.2)
        kf = lambda a, b: np_rbf(a, b, 1.1, 0.6)
        kd = lambda a: np.diag(kf(a, a))
        expected = np_sgpr_bound(kf, kd, X, Y, Z, 0.2, jitter=1e-12)
        assert_allclose(float(m.log_likelihood()), expected, rtol=1e-8)

        # Z = X: the collapsed bound equals the exact marginal
        m2 = SGPR.build(X, Y, kern, X.copy(), noise_variance=0.2)
        assert_allclose(float(m2.log_likelihood()),
                        np_gpr_marginal(kf(X, X), Y, 0.2), rtol=1e-6)


def test_svgp_elbo_below_sgpr_and_tight_after_natgrad():
    """SGPR is the analytically optimal SVGP: a gamma=1 natgrad step on
    the SVGP's (q_mu, q_sqrt) must land exactly on the SGPR bound."""
    from doubly_stochastic_dgp_tpu.training.natgrad import NaturalGradient
    X, Y, Z, Xs = _data()
    with temp_config(jitter=1e-12):
        kern = lambda: RBF.make(2, variance=1.1, lengthscales=0.6)
        m_s = SGPR.build(X, Y, kern(), Z, noise_variance=0.2)
        m_v = SVGP.build(X, Y, kern(), Gaussian.make(0.2), Z, white=False)

        l0 = float(m_v.log_likelihood())
        L_sgpr = float(m_s.log_likelihood())
        assert l0 < L_sgpr  # untrained ELBO is strictly below the optimum

        m_v2 = NaturalGradient(gamma=1.0, var_layers=(0,)).step(
            m_v, lambda m: -m.elbo(key=jax.random.PRNGKey(0)))
        l1 = float(m_v2.log_likelihood())
        assert_allclose(l1, L_sgpr, rtol=1e-8)


def test_fitc_vs_dense_marginal():
    X, Y, Z, Xs = _data(N=10, M=4)
    with temp_config(jitter=1e-12):
        kern = RBF.make(2, variance=1.4, lengthscales=0.8)
        m = GPRFITC.build(X, Y, kern, Z, noise_variance=0.15)

        # brute-force FITC covariance: Qff + diag(Kff - Qff) + sigma2 I
        kf = lambda a, b: np_rbf(a, b, 1.4, 0.8)
        Kuu = kf(Z, Z) + np.eye(4) * 1e-12
        Kuf = kf(Z, X)
        Qff = Kuf.T @ np.linalg.solve(Kuu, Kuf)
        Sigma = Qff + np.diag(np.diag(kf(X, X)) - np.diag(Qff)) \
            + 0.15 * np.eye(10)
        expected = sum(
            stats.multivariate_normal.logpdf(Y[:, d], np.zeros(10), Sigma)
            for d in range(Y.shape[1]))
        assert_allclose(float(m.log_likelihood()), expected, rtol=1e-8)

        # predictions: finite, diag var positive, and full_cov consistent
        mean, var = m.predict_f(Xs)
        meanf, varf = m.predict_f_full_cov(Xs)
        assert_allclose(np.asarray(mean), np.asarray(meanf), rtol=1e-9)
        assert_allclose(np.asarray(var)[:, 0],
                        np.diagonal(np.asarray(varf)[:, :, 0]), rtol=1e-7)
        assert np.all(np.asarray(var) > 0)


def test_fitc_equals_gpr_at_Z_eq_X():
    X, Y, Z, Xs = _data(N=9)
    with temp_config(jitter=1e-10):
        kern = RBF.make(2, variance=1.0, lengthscales=0.5)
        m_f = GPRFITC.build(X, Y, kern, X.copy(), noise_variance=0.3)
        kf = lambda a, b: np_rbf(a, b, 1.0, 0.5)
        assert_allclose(float(m_f.log_likelihood()),
                        np_gpr_marginal(kf(X, X), Y, 0.3), rtol=1e-6)
        mean, var = m_f.predict_f(Xs)
        me, ve = np_gpr_predict(kf, X, Y, Xs, 0.3)
        assert_allclose(np.asarray(mean), me, rtol=1e-5, atol=1e-7)
        assert_allclose(np.asarray(var)[:, 0], ve, rtol=1e-4, atol=1e-7)


def test_fitc_diag_variance_clamped_nonnegative():
    """Round-2 ADVICE #3: at Z=X the FITC predictive residual
    Kdiag - ||tmp1||^2 + ||tmp2||^2 cancels to roundoff at the training
    points; the diag branch clamps at 0 (matching the GPR/SGPR layers
    and the cached-posterior path), so live and cached variances agree
    in sign under cancellation."""
    from doubly_stochastic_dgp_tpu import precompute
    X, Y, _, _ = _data(N=10, M=10)
    with temp_config(jitter=1e-12):
        kern = RBF.make(2, variance=1.0, lengthscales=0.6)
        m = GPRFITC.build(X, Y, kern, X.copy(), noise_variance=1e-6)
        _, var = m.predict_f(X)
        assert np.all(np.asarray(var) >= 0.0)
        post = precompute(m)
        _, var_c = post.predict_f(X)
        assert np.all(np.asarray(var_c) >= 0.0)
