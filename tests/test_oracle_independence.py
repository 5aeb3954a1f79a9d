"""Oracle-independence tests (round-1 VERDICT weak #5): the SVGP
conditional is validated through derivation routes that do NOT share the
production code's whitened-triangular-solve / SK-einsum structure:

1. SVGP with Z=X after one gamma=1 natural-gradient step (the
   analytically optimal q for a conjugate likelihood) must reproduce the
   exact GPR posterior *predictions* pointwise and the exact GPR
   marginal as its ELBO — extending the existing bound-identity test to
   the full prediction surface.
2. conditional_ND(full_cov=True) is checked against (a) brute-force
   Gaussian conditioning of the joint MVN over (u, f) computed with
   plain numpy solves and the additive-covariance marginalization
   cov = Cov[f|u] + C Sigma C^T, and (b) a Monte-Carlo estimate that
   samples u ~ q and f | u from the conditioned joint — three
   independent routes to the same moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import Gaussian, RBF, SVGPLayer
from doubly_stochastic_dgp_tpu.config import temp_config
from doubly_stochastic_dgp_tpu.models.mean_functions import Zero
from doubly_stochastic_dgp_tpu.models.single_layer import SVGP
from doubly_stochastic_dgp_tpu.training.natgrad import NaturalGradient

from oracles import np_gpr_marginal, np_gpr_predict, np_rbf


def test_natgrad_optimal_svgp_predictions_equal_exact_gpr():
    """Z=X + one gamma=1 natgrad step => q is the analytically optimal
    posterior, so every prediction equals exact GPR conditioning (the
    oracle is the plain-numpy GPR formula, not NpSVGP)."""
    np.random.seed(11)
    N, D_X, D_Y, Ns = 7, 2, 2, 5
    lik_var = 0.17
    X = np.random.uniform(size=(N, D_X))
    Y = np.random.randn(N, D_Y)
    Xs = np.random.uniform(size=(Ns, D_X))

    with temp_config(jitter=1e-12):
        kern = RBF.make(D_X, variance=1.2, lengthscales=0.4)
        m = SVGP.build(X, Y, kern, Gaussian.make(lik_var), Z=X.copy(),
                       white=True)

        ng = NaturalGradient(gamma=1.0, var_layers=(-1,))
        key = jax.random.PRNGKey(0)
        m = ng.step(m, lambda mm: -mm.elbo(key=key))

        kf = lambda A, B: np_rbf(A, B, 1.2, np.full(D_X, 0.4))

        # ELBO at the optimum == exact GPR log marginal (Z=X)
        L = float(m.elbo(key=key))
        L_exact = np_gpr_marginal(kf(X, X), Y, lik_var)
        assert_allclose(L, L_exact, rtol=1e-8, atol=1e-8)

        # pointwise predictive moments == exact GPR posterior
        mean, var = m.predict_f(jnp.asarray(Xs))
        mean_e, var_e = np_gpr_predict(kf, X, Y, Xs, lik_var)
        assert_allclose(np.asarray(mean)[0], mean_e, rtol=1e-7, atol=1e-8)
        for d in range(D_Y):
            assert_allclose(np.asarray(var)[0][:, d], var_e,
                            rtol=1e-7, atol=1e-8)

        # full covariance too
        meanf, varf = m.predict_f_full_cov(jnp.asarray(Xs))
        mean_ef, var_ef = np_gpr_predict(kf, X, Y, Xs, lik_var,
                                         full_cov=True)
        assert_allclose(np.asarray(meanf)[0], mean_ef, rtol=1e-7,
                        atol=1e-8)
        for d in range(D_Y):
            assert_allclose(np.asarray(varf)[0][:, :, d], var_ef,
                            rtol=1e-6, atol=1e-8)


def test_full_cov_conditional_vs_joint_mvn_conditioning_and_mc():
    """Non-whitened SVGP conditional on a 3-point problem vs (a) direct
    joint-MVN conditioning with numpy inv/solve and (b) Monte Carlo."""
    np.random.seed(12)
    M, B, D_in, D_out = 4, 3, 2, 2
    jitter = 1e-12
    Z = np.random.randn(M, D_in)
    Xs = np.random.randn(B, D_in)
    var, ls = 1.6, np.array([0.8, 1.3])
    q_mu = np.random.randn(M, D_out) * 0.7
    q_sqrt = np.tril(np.random.randn(D_out, M, M) * 0.3) \
        + np.eye(M)[None] * 0.8

    with temp_config(jitter=jitter):
        kern = RBF.make(D_in, variance=var, lengthscales=ls)
        layer = SVGPLayer.make(kern, Z, D_out, Zero(output_dim=D_out),
                               white=False)
        layer = layer.replace(q_mu=layer.q_mu.with_value(q_mu),
                              q_sqrt=layer.q_sqrt.with_value(q_sqrt))
        mean, cov = layer.conditional_ND(jnp.asarray(Xs), full_cov=True)
    mean = np.asarray(mean)                    # (B, D_out)
    cov = np.asarray(cov)                      # (B, B, D_out)

    # --- route (a): brute-force joint-MVN conditioning ------------------
    kf = lambda A, Bm: np_rbf(A, Bm, var, ls)
    Kuu = kf(Z, Z) + np.eye(M) * jitter
    Kus = kf(Z, Xs)
    Kss = kf(Xs, Xs)
    C = np.linalg.solve(Kuu, Kus).T            # (B, M): Ksu Kuu^{-1}
    cov_f_given_u = Kss - C @ Kus              # conditioning formula
    for d in range(D_out):
        Sigma = q_sqrt[d] @ q_sqrt[d].T
        mean_d = C @ q_mu[:, d]
        cov_d = cov_f_given_u + C @ Sigma @ C.T
        assert_allclose(mean[:, d], mean_d, rtol=1e-9, atol=1e-10)
        assert_allclose(cov[:, :, d], cov_d, rtol=1e-8, atol=1e-9)

    # --- route (b): Monte Carlo over u ~ q, f | u ~ conditioned joint ---
    rng = np.random.default_rng(0)
    S = 200_000
    Lc = np.linalg.cholesky(cov_f_given_u + np.eye(B) * 1e-12)
    d = 0
    u = q_mu[:, d][None] + rng.standard_normal((S, M)) @ q_sqrt[d].T
    f = u @ C.T + rng.standard_normal((S, B)) @ Lc.T
    se_mean = f.std(0, ddof=1) / np.sqrt(S)
    assert np.all(np.abs(mean[:, d] - f.mean(0)) < 5 * se_mean + 1e-6)
    # covariance entries: MC error ~ O(var/sqrt(S)); bound loosely
    mc_cov = np.cov(f.T)
    scale = np.sqrt(np.outer(np.diag(mc_cov), np.diag(mc_cov)))
    assert np.all(np.abs(cov[:, :, d] - mc_cov)
                  < 5 * np.sqrt(2.0 / S) * scale + 1e-6)
