"""DGP integration tests, mirroring the reference test strategy
(/root/reference/tests/test_dgp.py):

1. Degeneracy-to-single-layer: an L-layer DGP whose inner layers are
   ~deterministic identity must match an independent numpy single-layer
   SVGP oracle on ELBO and every prediction method (reference
   test_dgp.py:27-117 uses a GPflow SVGP as the oracle).
2. Quadrature-vs-MC: the quadrature ELBO is deterministic and the MC
   ELBO is unbiased for it (reference test_dgp.py:120-174).
3. Step-up smoke: a dim-increasing stack builds and evaluates
   (reference test_dgp.py:176-183).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import (DGP, Bernoulli, DGPBase, DGPQuad,
                                       Gaussian, Matern52, MultiClass, Param,
                                       RBF, init_layers_linear)
from doubly_stochastic_dgp_tpu.config import temp_config

from oracles import NpSVGP, np_matern52


def _degenerate_kernel(D, variance=1e-24, lengthscales=0.5):
    """Matern52 whose variance bypasses the positive transform's lower
    bound (the reference's NoTransformMatern52, test_dgp.py:81-87)."""
    k = Matern52.make(D, lengthscales=lengthscales)
    return k.replace(variance=Param.create(variance, trainable=False))


class TestVsSingleLayer:
    """Reference test_dgp.py:27-117 with a numpy oracle."""

    def setup_method(self, method):
        Ns, N, D_X, D_Y = 20, 19, 2, 3
        np.random.seed(0)
        self.X = np.random.uniform(size=(N, D_X))
        self.Xs = np.random.uniform(size=(Ns, D_X))
        self.q_mu = np.random.randn(N, D_Y)
        self.q_sqrt = (0.001 * np.eye(N)[None, :, :]
                       * np.ones((D_Y, 1, 1)))
        self.D_Y = D_Y

    def _compare(self, Y, Ys, lik, np_varexp, np_pred_density, L, white,
                 num_outputs=None):
        with temp_config(jitter=1e-18):
            D_out = num_outputs or self.D_Y
            kern = Matern52.make(self.X.shape[1], lengthscales=0.5)

            # numpy oracle: single-layer SVGP with the same variational
            # parameters
            kf = lambda A, B: np_matern52(
                A, B, float(np.asarray(kern.variance.value)), 0.5)
            oracle = NpSVGP(kf, self.X.copy(), self.q_mu, self.q_sqrt,
                            white=white, jitter=1e-18)
            L_oracle = oracle.elbo(self.X, Y, np_varexp)
            pred_m_o, pred_v_o = oracle.conditional(self.Xs)
            pred_mf_o, pred_vf_o = oracle.conditional(self.Xs, full_cov=True)

            # DGP with L-1 degenerate inner layers
            kerns = [_degenerate_kernel(self.X.shape[1])
                     for _ in range(L - 1)] + [kern]
            m = DGP.build(self.X, Y, self.X, kerns, lik, white=white,
                          num_samples=2, num_outputs=num_outputs)
            last = m.layers[-1]
            last = last.replace(q_mu=last.q_mu.with_value(self.q_mu),
                                q_sqrt=last.q_sqrt.with_value(self.q_sqrt))
            m = m.replace(layers=m.layers[:-1] + [last])

            key = jax.random.PRNGKey(42)
            L_dgp = float(m.elbo(key=key))

            pred_m, pred_v = m.predict_f(jnp.asarray(self.Xs), S=1, key=key)
            pred_mf, pred_vf = m.predict_f_full_cov(jnp.asarray(self.Xs),
                                                    S=1, key=key)
            test_lik = m.predict_density(jnp.asarray(self.Xs),
                                         jnp.asarray(Ys), S=1, key=key)
            test_lik_o = np_pred_density(pred_m_o, pred_v_o, Ys)

            atol = rtol = 1e-7 if L == 1 else 1e-6
            assert_allclose(L_dgp, L_oracle, rtol=rtol, atol=atol)
            assert_allclose(np.asarray(pred_m)[0], pred_m_o, rtol=rtol,
                            atol=atol)
            assert_allclose(np.asarray(pred_v)[0], pred_v_o, rtol=rtol,
                            atol=atol)
            assert_allclose(np.asarray(pred_mf)[0], pred_mf_o, rtol=rtol,
                            atol=atol)
            assert_allclose(np.asarray(pred_vf)[0], pred_vf_o, rtol=1e-5,
                            atol=1e-5)
            assert_allclose(np.asarray(test_lik), test_lik_o, rtol=1e-5,
                            atol=1e-5)

    def test_gaussian(self):
        lik_var = 0.01
        lik = Gaussian.make(lik_var)
        N, D_Y = self.X.shape[0], self.D_Y
        Y = np.random.randn(N, D_Y)
        Ys = np.random.randn(self.Xs.shape[0], D_Y)

        def np_varexp(Fmu, Fvar, Y):
            return (-0.5 * np.log(2 * np.pi * lik_var)
                    - 0.5 * ((Y - Fmu) ** 2 + Fvar) / lik_var)

        def np_pred_density(Fmu, Fvar, Y):
            from scipy import stats
            from scipy.special import logsumexp
            lp = stats.norm.logpdf(Y, Fmu, (Fvar + lik_var) ** 0.5)
            return lp  # S=1: the logsumexp-minus-logS is identity

        for L in [1, 2, 3]:
            for white in [True, False]:
                self._compare(Y, Ys, lik, np_varexp, np_pred_density, L,
                              white)

    def test_bernoulli(self):
        lik = Bernoulli.make()
        N, D_Y = self.X.shape[0], self.D_Y
        Y = np.random.choice([-1.0, 1.0], N * D_Y).reshape(N, D_Y)
        Ys = np.random.choice([-1.0, 1.0],
                              self.Xs.shape[0] * D_Y).reshape(-1, D_Y)

        def np_varexp(Fmu, Fvar, Y):
            return np.asarray(lik.variational_expectations(
                jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))

        def np_pred_density(Fmu, Fvar, Y):
            return np.asarray(lik.predict_density(
                jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))

        for L in [1, 2]:
            self._compare(Y, Ys, lik, np_varexp, np_pred_density, L, True)

    def test_multiclass(self):
        K = 3
        lik = MultiClass.make(K)
        N = self.X.shape[0]
        Y = np.random.choice([0.0, 1.0, 2.0], N).reshape(N, 1)
        Ys = np.random.choice([0.0, 1.0, 2.0],
                              self.Xs.shape[0]).reshape(-1, 1)

        def np_varexp(Fmu, Fvar, Y):
            return np.asarray(lik.variational_expectations(
                jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))

        def np_pred_density(Fmu, Fvar, Y):
            return np.asarray(lik.predict_density(
                jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))

        for L in [1, 2]:
            self._compare(Y, Ys, lik, np_varexp, np_pred_density, L, True,
                          num_outputs=K)


class TestQuad:
    """Quadrature ELBO is deterministic; MC ELBO is an unbiased estimate
    of it (reference test_dgp.py:120-174, scaled down)."""

    def test_quadrature_vs_mc(self):
        N = 2
        np.random.seed(0)
        X = np.random.uniform(size=(N, 1))
        Y = np.sin(20 * X) + np.random.randn(*X.shape) * 0.001

        def kernels():
            return [RBF.make(1, lengthscales=0.1),
                    RBF.make(1, lengthscales=0.1)]

        lik = Gaussian.make(0.01)
        layers_q = init_layers_linear(X, Y, X, kernels())
        layers_s = init_layers_linear(X, Y, X, kernels())

        # shared random variational parameters (moderate, not optimized —
        # unbiasedness holds at any parameter setting)
        rng = np.random.RandomState(3)
        for i in range(2):
            q_mu = rng.randn(N, 1) * 0.3
            q_sqrt = np.tril(rng.randn(1, N, N) * 0.2 + np.eye(N) * 0.5)
            for layers in (layers_q, layers_s):
                layers[i] = layers[i].replace(
                    q_mu=layers[i].q_mu.with_value(q_mu),
                    q_sqrt=layers[i].q_sqrt.with_value(q_sqrt))

        m_quad = DGPQuad.build(X, Y, lik, layers_q, H=120)
        m_mc = DGPBase.make(X, Y, lik, layers_s, num_samples=100)

        q1 = float(m_quad.elbo())
        q2 = float(m_quad.elbo())
        assert_allclose(q1, q2)  # deterministic

        elbo_fn = jax.jit(lambda m, k: m.elbo(key=k))
        keys = jax.random.split(jax.random.PRNGKey(0), 600)
        vals = np.array([float(elbo_fn(m_mc, k)) for k in keys])
        m_hat = vals.mean()
        stderr = vals.std() / np.sqrt(len(vals))
        assert abs(q1 - m_hat) < 3 * stderr + 1e-4, \
            f"quad {q1} vs mc {m_hat} +- {stderr}"


class TestStepUp:
    def test_dim_increase(self):
        """1 -> 2 step-up uses the [I|0] padding path
        (reference test_dgp.py:176-183)."""
        kern1 = RBF.make(1)
        kern2 = RBF.make(2)
        lik = Gaussian.make(1.0)
        X = np.zeros((1, 1))
        model = DGP.build(X, X, X, [kern1, kern2], lik)
        val = float(model.elbo(key=jax.random.PRNGKey(0)))
        assert np.isfinite(val)


class TestInputProp:
    def test_input_prop_stack(self):
        from doubly_stochastic_dgp_tpu import init_layers_input_prop
        np.random.seed(1)
        N, D, M = 8, 2, 4
        X = np.random.randn(N, D)
        Y = np.random.randn(N, 1)
        Z = np.random.randn(M, D)
        kerns = [RBF.make(D), RBF.make(D + 1), RBF.make(D + 1)]
        layers = init_layers_input_prop(X, Y, Z, kerns)
        m = DGPBase.make(X, Y, Gaussian.make(0.1), layers, num_samples=2)
        val = float(m.elbo(key=jax.random.PRNGKey(0)))
        assert np.isfinite(val)
        # prediction shapes: inner layers emit (S, N, d+D) with input prop
        Fs, Fms, Fvs = m.predict_all_layers(jnp.asarray(X), S=2)
        assert Fs[0].shape == (2, N, 1 + D)
        assert Fs[-1].shape == (2, N, 1)


def test_constructor_shape_validation_messages():
    """Dimension mismatches fail fast with actionable messages instead
    of an opaque broadcast error deep inside the first gram matrix."""
    import pytest
    from doubly_stochastic_dgp_tpu import DGP, Gaussian, RBF, SVGPLayer
    from doubly_stochastic_dgp_tpu.models.dgp import DGPBase

    X = np.random.randn(10, 3)
    Y = np.random.randn(10, 1)
    Z = np.random.randn(4, 3)

    with pytest.raises(ValueError, match="input_dim=5"):
        SVGPLayer.make(RBF.make(5), Z, 1)
    with pytest.raises(ValueError, match="same number of rows"):
        DGPBase.make(X, Y[:7], Gaussian.make(0.05), [])
    with pytest.raises(ValueError, match=r"Z must be \(M, D\)"):
        DGP.build(X, Y, np.random.randn(4, 2), [RBF.make(3)],
                  Gaussian.make(0.05))
    with pytest.raises(ValueError, match="input_dim"):
        DGP.build(X, Y, Z, [RBF.make(5), RBF.make(1)],
                  Gaussian.make(0.05))
