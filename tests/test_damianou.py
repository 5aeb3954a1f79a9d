"""DGPDamianou (Damianou & Lawrence 2013) — the model the reference left
as a TODO stub (/root/reference/doubly_stochastic_dgp/model_zoo.py:91-104).

Oracles:
  - L=1 degeneracy: with no hidden layers the bound must equal the
    existing collapsed SGPR bound exactly (both reduce to Titsias).
  - Random-output correction: the hidden-layer term
    E_{Y~N(m, diag(s))}[g(Y)] is validated against a finite-difference
    expansion of the *actual* bound function g (g is quadratic in its
    targets, so E[g] = g(m) + (1/2) sum s * d^2g/dy^2 exactly).
  - Training: the bound increases under Adam and beats the init on RMSE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import doubly_stochastic_dgp_tpu as dsd
from doubly_stochastic_dgp_tpu.models.layers import SGPRLayer
from doubly_stochastic_dgp_tpu.models.mean_functions import Zero


def _toy(N=24, D=3, M=6, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(size=(N, D))
    Y = np.sin(3 * X[:, :1]) + 0.1 * np.cos(5 * X[:, 1:2]) \
        + 0.05 * rng.randn(N, 1)
    return X, Y, X[:M].copy()


def test_single_layer_equals_collapsed_sgpr():
    X, Y, Z = _toy()
    kern = dsd.RBF.make(X.shape[1], lengthscales=0.7)
    m1 = dsd.DGPDamianou.build(X, Y, Z, [kern], dsd.Gaussian.make(0.05))
    lay = SGPRLayer.make(m1.layers[0].kern, Z, 1, Zero(output_dim=1))
    mc = dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05), [lay])
    np.testing.assert_allclose(float(m1.elbo()), float(mc.elbo()),
                               rtol=1e-9)
    # predictive conditionals agree too (the single collapsed layer)
    Xs = np.random.RandomState(1).uniform(size=(7, X.shape[1]))
    la = m1._data_layers()[0]
    lb = mc._collapsed_last_layer()
    ma, va = la.conditional_ND(jnp.asarray(Xs))
    mb, vb = lb.conditional_ND(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), atol=1e-9)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-9)


def test_random_output_correction_matches_finite_differences():
    """The closed-form E_{Y~q}[bound(Y)] (what elbo() adds for hidden
    layers) vs a finite-difference quadratic expansion of the actual
    bound — an independent check of the G = LB^{-1} A / sigma map."""
    X, Y, Z = _toy(N=6, D=2, M=4)
    d_hid = 2
    kerns = [dsd.RBF.make(2, lengthscales=0.8), dsd.RBF.make(d_hid)]
    m = dsd.DGPDamianou.build(X, Y, Z, kerns, dsd.Gaussian.make(0.05),
                              h_var_init=0.07)
    layer = m.layers[0]
    mu_in, sv_in, m_out, var_l = m._layer_data(0)
    s = m.h_var[0].value

    def g(Yl):
        return layer.set_data(mu_in, sv_in, Yl, var_l).build_likelihood()

    # closed form, exactly as elbo() computes it (minus the entropy term)
    lay = layer.set_data(mu_in, sv_in, m_out, var_l)
    cm = lay._common()
    from doubly_stochastic_dgp_tpu.ops.linalg import tri_solve
    G = tri_solve(cm["LB"], cm["A"], lower=True,
                  mode=layer.solve_mode) / jnp.sqrt(var_l)
    diagGtG = jnp.sum(G ** 2, axis=0)
    closed = float(g(m_out) - 0.5 * jnp.sum(s) / var_l
                   + 0.5 * jnp.sum(diagGtG[:, None] * s))

    # finite differences: E[g] = g(m) + 1/2 sum_{nd} s_nd g''_nd
    g0 = float(g(m_out))
    h = 1e-4
    expect = g0
    m_np = np.asarray(m_out)
    for n in range(m_np.shape[0]):
        for d in range(m_np.shape[1]):
            e = np.zeros_like(m_np)
            e[n, d] = h
            hess = (float(g(jnp.asarray(m_np + e)))
                    + float(g(jnp.asarray(m_np - e))) - 2 * g0) / h ** 2
            expect += 0.5 * float(s[n, d]) * hess
    np.testing.assert_allclose(closed, expect, rtol=1e-5)


def test_bound_is_quadratic_in_targets():
    """Sanity for the FD oracle above: third differences of the bound in
    the targets vanish (the correction formula is exact, not a Taylor
    approximation)."""
    X, Y, Z = _toy(N=5, D=2, M=3)
    m = dsd.DGPDamianou.build(X, Y, Z,
                              [dsd.RBF.make(2), dsd.RBF.make(2)],
                              dsd.Gaussian.make(0.05))
    layer = m.layers[0]
    mu_in, sv_in, m_out, var_l = m._layer_data(0)

    def g(t):
        Yl = m_out + t * jnp.ones_like(m_out)
        return layer.set_data(mu_in, sv_in, Yl, var_l).build_likelihood()

    d3 = jax.grad(jax.grad(jax.grad(g)))(jnp.asarray(0.0))
    assert abs(float(d3)) < 1e-6


def test_training_improves_bound_and_fit():
    X, Y, Z = _toy(N=40, D=2, M=10, seed=3)
    kerns = [dsd.RBF.make(2, lengthscales=0.5), dsd.RBF.make(2)]
    model = dsd.DGPDamianou.build(X, Y, Z, kerns, dsd.Gaussian.make(0.1))
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer
    tx = masked_optimizer(optax.adam(0.02), model)
    state = tx.init(model)

    @jax.jit
    def step(model, state):
        loss, grads = jax.value_and_grad(lambda m: -m.elbo())(model)
        updates, state = tx.update(grads, state, model)
        return optax.apply_updates(model, updates), state, loss

    loss0 = None
    for i in range(150):
        model, state, loss = step(model, state)
        if loss0 is None:
            loss0 = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < loss0 - 1.0, (loss0, float(loss))

    mu, v = model.predict_y(jnp.asarray(X), S=20, key=jax.random.PRNGKey(0))
    rmse = float(jnp.sqrt(jnp.mean((jnp.mean(mu, 0) - Y) ** 2)))
    base = float(np.sqrt(np.mean((Y - Y.mean()) ** 2)))
    assert rmse < 0.7 * base, (rmse, base)
    assert np.all(np.asarray(v) > 0)


def test_full_cov_propagation_adds_inner_noise_on_diagonal():
    X, Y, Z = _toy(N=10, D=2, M=5)
    m = dsd.DGPDamianou.build(X, Y, Z,
                              [dsd.RBF.make(2), dsd.RBF.make(2)],
                              dsd.Gaussian.make(0.05))
    Xs = jnp.asarray(X[:4])
    _, _, Vs_diag = m.propagate(Xs, key=jax.random.PRNGKey(0), S=3)
    _, _, Vs_full = m.propagate(Xs, key=jax.random.PRNGKey(0), S=3,
                                full_cov=True)
    # inner layer: full-cov diagonal == diag path (both include sigma_l^2)
    diag_of_full = jnp.diagonal(Vs_full[0], axis1=1, axis2=2)  # (S, D, N)
    np.testing.assert_allclose(np.asarray(diag_of_full),
                               np.asarray(jnp.swapaxes(Vs_diag[0], 1, 2)),
                               atol=1e-8)
    inner_var = float(m.noise[0].value)
    assert np.all(np.asarray(Vs_diag[0]) >= inner_var - 1e-9)


def test_bound_is_below_true_log_marginal():
    """The Damianou bound must lower-bound log p(Y|X) of the generative
    model (layer-1 GP + noise -> layer-2 full GP + noise), estimated by
    Monte Carlo: log p(Y|X) ~= logsumexp_h [ exact-GPR-marginal(Y; H_h) ]
    - log n, H_h ~ p(H|X).  A sign error in the entropy or the
    random-output corrections would inflate the bound past it."""
    from scipy.linalg import cho_factor, cho_solve

    rng = np.random.RandomState(0)
    N, D = 8, 1
    X = np.sort(rng.uniform(size=(N, D)), axis=0)
    Y = np.sin(4 * X) + 0.1 * rng.randn(N, 1)

    k1 = dsd.RBF.make(D, variance=1.0, lengthscales=0.5)
    k2 = dsd.RBF.make(D, variance=1.0, lengthscales=0.8)
    model = dsd.DGPDamianou.build(X, Y, X.copy(), [k1, k2],
                                  dsd.Gaussian.make(0.05),
                                  inner_noise=1e-2)

    # modest optimization of q only (freeze hyperparams so the MC
    # estimate below uses the same generative model)
    import optax
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer
    from doubly_stochastic_dgp_tpu.utils.modules import Param

    def freeze_hypers(path, param):
        names = [str(getattr(p, "name", getattr(p, "idx", "")))
                 for p in path]
        return not any(h in names for h in ("h_mean", "h_var"))

    tx = masked_optimizer(optax.adam(0.02), model, freeze=freeze_hypers)
    state = tx.init(model)

    @jax.jit
    def step(model, state):
        loss, grads = jax.value_and_grad(lambda m: -m.elbo())(model)
        updates, state = tx.update(grads, state, model)
        return optax.apply_updates(model, updates), state, loss

    for _ in range(200):
        model, state, _ = step(model, state)
    bound = float(model.elbo())

    # MC estimate of the exact log marginal with the same hyperparams
    sigma1 = float(model.noise[0].value)
    sigma2 = float(model.likelihood.variance.value)
    K1 = np.asarray(model.layers[0].kern.K(jnp.asarray(X)))
    L1 = np.linalg.cholesky(K1 + (sigma1 + 1e-12) * np.eye(N))
    n_mc = 4000
    rng2 = np.random.RandomState(1)
    logws = np.zeros(n_mc)
    kern2 = model.layers[1].kern
    for i in range(n_mc):
        H = L1 @ rng2.randn(N, D)
        K2 = np.asarray(kern2.K(jnp.asarray(H))) + sigma2 * np.eye(N)
        c, low = cho_factor(K2, lower=True)
        alpha = cho_solve((c, low), Y)
        logdet = 2 * np.sum(np.log(np.diag(c)))
        logws[i] = (-0.5 * Y.T @ alpha - 0.5 * logdet
                    - 0.5 * N * np.log(2 * np.pi)).item()
    from scipy.special import logsumexp
    logp_hat = logsumexp(logws) - np.log(n_mc)
    # the MC estimator of log E[w] is downward-biased (Jensen), so the
    # margin is one-sided generous; an entropy sign error shifts the
    # bound by O(|H(q)|) ~ tens of nats and would blow straight past it
    assert bound <= logp_hat + 1.0, (bound, logp_hat)
    # and the bound is not absurdly loose either (sanity of the test)
    assert bound > logp_hat - 50.0, (bound, logp_hat)
