"""NUTS sampler tests: analytic-Gaussian posterior recovery, the
U-turn criterion actually terminating trees, divergence accounting,
degenerate max_depth validity, and multi-chain diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.training.nuts import (nuts_sample,
                                                     nuts_sample_chains)
from doubly_stochastic_dgp_tpu.utils.modules import Module, Param


class _Quad(Module):
    v: Param = None


_A = np.array([[2.0, 0.6, 0.0], [0.6, 1.0, 0.3], [0.0, 0.3, 0.5]])
_SIGMA = _A @ _A.T
_PREC = np.linalg.inv(_SIGMA)
_C = np.array([1.0, -2.0, 0.5])


def _model():
    return _Quad(v=Param.create(np.zeros(3)))


def _logp(m):
    d = m.v.value - jnp.asarray(_C)
    return -0.5 * d @ jnp.asarray(_PREC) @ d


def test_nuts_correlated_gaussian_moments():
    """Posterior mean AND full covariance of a correlated 3-D Gaussian
    recovered; adaptation lands near the target acceptance; the U-turn
    criterion stops trees well short of max_depth."""
    samples, acc, rebuild, info = nuts_sample(
        _model(), _logp, jax.random.PRNGKey(0), num_samples=2000,
        num_burn=500, step_size=0.5, max_depth=8)
    assert 0.6 < acc <= 1.0
    assert 0.0 < info["step_size"] < 2.0
    # trees terminate by U-turn, not by the depth cap
    assert 1.0 < info["mean_tree_depth"] < 7.0
    s = np.asarray(samples)
    assert_allclose(s.mean(0), _C, atol=0.3)
    assert_allclose(np.cov(s.T), _SIGMA, atol=0.6)
    # rebuild maps a position back onto the model pytree
    m1 = rebuild(samples[-1])
    assert_allclose(np.asarray(m1.v.value), s[-1], rtol=1e-12)


def test_nuts_max_depth_one_is_still_valid_mcmc():
    """max_depth=1 degenerates to single-doubling trajectories; the
    sampler must remain a valid (if slow-mixing) MCMC kernel."""
    samples, acc, _, info = nuts_sample(
        _model(), _logp, jax.random.PRNGKey(1), num_samples=4000,
        num_burn=500, step_size=0.5, max_depth=1)
    assert info["mean_tree_depth"] <= 1.0
    s = np.asarray(samples)
    assert_allclose(s.mean(0), _C, atol=0.45)
    assert_allclose(np.diag(np.cov(s.T)), np.diag(_SIGMA), rtol=0.5)


def test_nuts_divergences_counted_and_samples_finite():
    """A huge fixed step size must register divergences without ever
    emitting a non-finite sample (divergent subtrees are discarded)."""
    samples, acc, _, info = nuts_sample(
        _model(), _logp, jax.random.PRNGKey(2), num_samples=200,
        num_burn=0, step_size=50.0, max_depth=6,
        adapt_step_size=False)
    assert info["divergences"] > 0
    assert np.isfinite(np.asarray(samples)).all()


def test_nuts_chains_diagnostics():
    """4 vmap'd chains mix over the same distribution: split R-hat near
    1, ESS a nontrivial fraction of the sample count, per-chain step
    sizes adapted."""
    samples, accs, rebuild, info = nuts_sample_chains(
        _model(), _logp, jax.random.PRNGKey(3), num_chains=4,
        num_samples=800, num_burn=300, step_size=0.5, max_depth=8)
    assert samples.shape == (4, 800, 3)
    assert np.all(info["rhat"] < 1.1)
    assert np.all(info["ess"] > 200.0)
    assert np.all((info["step_sizes"] > 0.0)
                  & (info["step_sizes"] < 3.0))
    pooled = np.asarray(samples).reshape(-1, 3)
    assert_allclose(pooled.mean(0), _C, atol=0.25)


def test_nuts_dense_gpmc_matches_analytic_posterior():
    """Model-level oracle: on a dense whitened GPMC model with a
    Gaussian likelihood the HMC/NUTS target over q_mu is EXACTLY
    Gaussian (y = Lu v + eps, v ~ N(0,I) => Lambda = I + Lu^T Lu /
    sigma2, mu = Lambda^{-1} Lu^T y / sigma2 — the same oracle as
    test_zoo.py::test_sgpmc_hmc_matches_dense_gpmc_at_Z_eq_X).  NUTS
    must recover its mean and marginal sds."""
    from doubly_stochastic_dgp_tpu import (DGPBase, Gaussian, GPMCLayer,
                                           RBF)
    from doubly_stochastic_dgp_tpu.config import temp_config
    from doubly_stochastic_dgp_tpu.models.mean_functions import Zero
    from doubly_stochastic_dgp_tpu.utils.modules import log_prior

    np.random.seed(7)
    N, D = 10, 1
    X = np.sort(np.random.uniform(-1, 1, (N, D)), axis=0)
    Y = np.sin(3 * X) + np.random.randn(N, D) * 0.1
    sigma2 = 0.5

    with temp_config(jitter=1e-8):
        layer = GPMCLayer.make(RBF.make(D, lengthscales=0.8), X.copy(),
                               D, mean_function=Zero(output_dim=D))
        m = DGPBase.make(X, Y, Gaussian.make(sigma2), [layer],
                         num_samples=1)
        Lu = np.asarray(layer.Lu)
        Lam = np.eye(N) + Lu.T @ Lu / sigma2
        Sig = np.linalg.inv(Lam)
        post_mu = Sig @ Lu.T @ Y[:, 0] / sigma2
        post_sd = np.sqrt(np.diag(Sig))

        elbo_key = jax.random.PRNGKey(42)

        def log_post(model):
            return model.elbo(key=elbo_key) + log_prior(model)

        def freeze(path, param):
            return "q_mu" not in path

        samples, acc, rebuild, info = nuts_sample(
            m, log_post, jax.random.PRNGKey(0), num_samples=1500,
            num_burn=400, step_size=0.3, max_depth=7, freeze=freeze,
            compute_ess=True)
        s = np.asarray(samples)
        assert 0.6 < acc <= 1.0
        assert info["divergences"] == 0
        assert_allclose(s.mean(0), post_mu, atol=4.5 * np.max(post_sd)
                        / np.sqrt(info["ess"].min()
                                  if isinstance(info.get("ess"),
                                                np.ndarray)
                                  else 100.0))
        assert np.max(np.abs(s.std(0) / post_sd - 1.0)) < 0.25
