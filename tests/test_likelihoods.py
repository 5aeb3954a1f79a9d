"""Likelihood tests: every closed-form method is validated against
brute-force numerical integration (dense trapezoid over the latent), and
the broadcasting semantics of the reference's BroadcastingLikelihood
(/root/reference/doubly_stochastic_dgp/utils.py:54-121) are checked by
comparing (S, N, D) batched calls against per-sample loops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose
from scipy import stats

from doubly_stochastic_dgp_tpu.ops.likelihoods import (Bernoulli, Beta,
                                                       Exponential, Gamma,
                                                       Gaussian, MultiClass,
                                                       Ordinal, Poisson,
                                                       StudentT)

S, N, D = 3, 4, 2


def _numeric_varexp(lik, Fmu, Fvar, Y, ngrid=4001, width=10.0):
    """E[log p(y|f)] by dense quadrature, elementwise over (N, D)."""
    out = np.zeros_like(Fmu)
    for i in range(Fmu.shape[0]):
        for j in range(Fmu.shape[1]):
            mu, var = Fmu[i, j], Fvar[i, j]
            f = np.linspace(mu - width * var ** 0.5, mu + width * var ** 0.5,
                            ngrid)
            w = stats.norm.pdf(f, mu, var ** 0.5)
            lp = np.asarray(lik.logp(jnp.asarray(f)[:, None],
                                     jnp.full((ngrid, 1), Y[i, j])))[:, 0]
            out[i, j] = np.trapezoid(w * lp, f)
    return out


def _numeric_density(lik, Fmu, Fvar, Y, ngrid=4001, width=10.0):
    out = np.zeros_like(Fmu)
    for i in range(Fmu.shape[0]):
        for j in range(Fmu.shape[1]):
            mu, var = Fmu[i, j], Fvar[i, j]
            f = np.linspace(mu - width * var ** 0.5, mu + width * var ** 0.5,
                            ngrid)
            w = stats.norm.pdf(f, mu, var ** 0.5)
            p = np.exp(np.asarray(lik.logp(
                jnp.asarray(f)[:, None],
                jnp.full((ngrid, 1), Y[i, j])))[:, 0])
            out[i, j] = np.log(np.trapezoid(w * p, f))
    return out


def _setup():
    Fmu = np.random.randn(N, D) * 0.5
    Fvar = 0.1 + np.random.rand(N, D) * 0.3
    return Fmu, Fvar


LIKS_AND_Y = [
    (lambda: Gaussian.make(0.07), lambda: np.random.randn(N, D)),
    (lambda: Bernoulli.make(), lambda: np.random.choice([-1.0, 1.0], (N, D))),
    (lambda: Poisson.make(), lambda: np.random.poisson(2.0, (N, D)).astype(float)),
    (lambda: Exponential.make(), lambda: np.random.rand(N, D) + 0.1),
    (lambda: StudentT.make(scale=0.5, df=4.0), lambda: np.random.randn(N, D)),
    (lambda: Gamma.make(shape=1.5), lambda: np.random.rand(N, D) + 0.1),
    (lambda: Beta.make(scale=3.0), lambda: np.random.rand(N, D) * 0.8 + 0.1),
    (lambda: Ordinal.make(np.linspace(-2, 2, 4)),
     lambda: np.random.choice(range(5), (N, D)).astype(float)),
]


@pytest.mark.parametrize("mk_lik,mk_y", LIKS_AND_Y,
                         ids=[l()[0].__class__.__name__ if False else
                              type(l()).__name__
                              for l, _ in LIKS_AND_Y])
def test_variational_expectations_vs_numeric(mk_lik, mk_y):
    lik = mk_lik()
    Fmu, Fvar = _setup()
    Y = mk_y()
    got = np.asarray(lik.variational_expectations(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    expected = _numeric_varexp(lik, Fmu, Fvar, Y)
    assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mk_lik,mk_y", LIKS_AND_Y,
                         ids=[type(l()).__name__ for l, _ in LIKS_AND_Y])
def test_predict_density_vs_numeric(mk_lik, mk_y):
    lik = mk_lik()
    Fmu, Fvar = _setup()
    Y = mk_y()
    got = np.asarray(lik.predict_density(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    expected = _numeric_density(lik, Fmu, Fvar, Y)
    assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mk_lik,mk_y", LIKS_AND_Y,
                         ids=[type(l()).__name__ for l, _ in LIKS_AND_Y])
def test_broadcast_over_samples(mk_lik, mk_y):
    """(S, N, D) inputs with (N, D) targets == loop over S (the
    BroadcastingLikelihood contract)."""
    lik = mk_lik()
    Fmu = np.random.randn(S, N, D) * 0.5
    Fvar = 0.1 + np.random.rand(S, N, D) * 0.3
    Y = mk_y()
    batched = np.asarray(lik.variational_expectations(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    assert batched.shape == (S, N, D)
    for s in range(S):
        single = np.asarray(lik.variational_expectations(
            jnp.asarray(Fmu[s]), jnp.asarray(Fvar[s]), jnp.asarray(Y)))
        assert_allclose(batched[s], single, rtol=1e-10)

    m_b, v_b = lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar))
    m_0, v_0 = lik.predict_mean_and_var(jnp.asarray(Fmu[0]),
                                        jnp.asarray(Fvar[0]))
    assert_allclose(np.asarray(m_b)[0], np.asarray(m_0), rtol=1e-10)
    assert_allclose(np.asarray(v_b)[0], np.asarray(v_0), rtol=1e-10)


def test_gaussian_closed_forms():
    lik = Gaussian.make(0.25)
    Fmu, Fvar = _setup()
    Y = np.random.randn(N, D)
    ve = np.asarray(lik.variational_expectations(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    expected = (-0.5 * np.log(2 * np.pi * 0.25)
                - 0.5 * ((Y - Fmu) ** 2 + Fvar) / 0.25)
    assert_allclose(ve, expected, rtol=1e-10)
    m, v = lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar))
    assert_allclose(np.asarray(m), Fmu)
    assert_allclose(np.asarray(v), Fvar + 0.25)
    pd = np.asarray(lik.predict_density(jnp.asarray(Fmu), jnp.asarray(Fvar),
                                        jnp.asarray(Y)))
    assert_allclose(pd, stats.norm.logpdf(Y, Fmu, (Fvar + 0.25) ** 0.5),
                    rtol=1e-10)


class TestMultiClass:
    K = 3

    def _setup(self):
        Fmu = np.random.randn(N, self.K)
        Fvar = 0.2 + np.random.rand(N, self.K) * 0.5
        Y = np.random.choice(self.K, (N, 1)).astype(float)
        return Fmu, Fvar, Y

    def test_prob_is_largest_vs_mc(self):
        lik = MultiClass.make(self.K)
        Fmu, Fvar, Y = self._setup()
        p = np.asarray(lik._prob_is_largest(jnp.asarray(Y), jnp.asarray(Fmu),
                                            jnp.asarray(Fvar)))
        # Monte-Carlo oracle
        rng = np.random.RandomState(1)
        n_mc = 400_000
        f = Fmu[None] + rng.randn(n_mc, N, self.K) * Fvar[None] ** 0.5
        hits = (np.argmax(f, -1) == Y[:, 0].astype(int)[None]).mean(0)
        assert_allclose(p[:, 0], hits, atol=3e-3)

    def test_variational_expectations(self):
        lik = MultiClass.make(self.K, epsilon=1e-3)
        Fmu, Fvar, Y = self._setup()
        p = np.asarray(lik._prob_is_largest(jnp.asarray(Y), jnp.asarray(Fmu),
                                            jnp.asarray(Fvar)))
        ve = np.asarray(lik.variational_expectations(
            jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
        expected = p * np.log(1 - 1e-3) + (1 - p) * np.log(1e-3 / (self.K - 1))
        assert_allclose(ve, expected, rtol=1e-8)

    def test_predict_mean_sums_to_one(self):
        lik = MultiClass.make(self.K)
        Fmu, Fvar, _ = self._setup()
        m, v = lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar))
        assert_allclose(np.asarray(m).sum(-1), np.ones(N), atol=1e-3)
        assert np.all(np.asarray(v) >= 0)

    def test_batched_over_samples(self):
        lik = MultiClass.make(self.K)
        Fmu = np.random.randn(S, N, self.K)
        Fvar = 0.2 + np.random.rand(S, N, self.K)
        Y = np.random.choice(self.K, (N, 1)).astype(float)
        b = np.asarray(lik.variational_expectations(
            jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
        assert b.shape == (S, N, 1)
        one = np.asarray(lik.variational_expectations(
            jnp.asarray(Fmu[1]), jnp.asarray(Fvar[1]), jnp.asarray(Y)))
        assert_allclose(b[1], one, rtol=1e-10)

    def test_logp(self):
        lik = MultiClass.make(self.K, epsilon=1e-3)
        F = np.random.randn(N, self.K)
        Y = np.random.choice(self.K, (N, 1)).astype(float)
        lp = np.asarray(lik.logp(jnp.asarray(F), jnp.asarray(Y)))
        hits = np.argmax(F, -1) == Y[:, 0]
        expected = np.where(hits, np.log(1 - 1e-3),
                            np.log(1e-3 / (self.K - 1)))[:, None]
        assert_allclose(lp, expected, rtol=1e-10)


def test_zero_variance_gradients_finite():
    """Regression (round-2 MNIST TPU NaN): the layer's variance clamp
    can output exactly 0 in float32, and d sqrt(v)/dv is infinite at 0 —
    every GH-quadrature likelihood path must keep gradients finite
    there (the forward was always finite, which made this silent)."""
    import jax
    from doubly_stochastic_dgp_tpu import Bernoulli, MultiClass

    # MultiClass robust-max via _prob_is_largest
    mc = MultiClass.make(4)
    Y = jnp.asarray([[1], [2]])
    Fmu = jnp.asarray(np.random.RandomState(0).randn(2, 4))
    Fvar0 = jnp.zeros((2, 4))

    def loss_mc(v):
        return jnp.sum(mc.variational_expectations(Fmu, v, Y))

    assert np.isfinite(float(loss_mc(Fvar0)))
    g = jax.grad(loss_mc)(Fvar0)
    assert np.all(np.isfinite(np.asarray(g))), g

    # generic ndiagquad path (Bernoulli)
    be = Bernoulli.make()
    Yb = jnp.asarray([[1.0], [0.0]])
    Fmub = jnp.asarray([[0.3], [-0.2]])

    def loss_be(v):
        return jnp.sum(be.variational_expectations(Fmub, v, Yb))

    g2 = jax.grad(loss_be)(jnp.zeros((2, 1)))
    assert np.all(np.isfinite(np.asarray(g2))), g2
