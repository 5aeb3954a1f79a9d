"""Collapsed-model tests, mirroring /root/reference/tests/test_collapsed.py
and test_zoo_models.py with numpy oracles:

1. Single-layer DGPCollapsed + SGPRLayer with Z=X equals the exact GPR
   marginal likelihood and full-cov predictions (reference
   test_collapsed.py:30-54).
2. The certain-input Titsias bound matches the numpy oracle.
3. One gamma=1 natural-gradient step on the final layer of a conjugate
   2-layer model makes the MC/quad bound equal the collapsed bound
   (reference test_collapsed.py:57-104) — the natgrad exactness oracle.
4. DGPHeinonen equals exact GPR when the first layer is the identity
   (reference test_zoo_models.py:43-80).
"""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import (DGP, DGPCollapsed, DGPHeinonen,
                                       DGPQuad, Gaussian, GPMCLayer,
                                       GPRLayer, Matern52, RBF, SGPRLayer,
                                       init_layers_linear)
from doubly_stochastic_dgp_tpu.config import temp_config
from doubly_stochastic_dgp_tpu.models.mean_functions import Identity, Zero
from doubly_stochastic_dgp_tpu.training.natgrad import NaturalGradient

from oracles import np_gpr_marginal, np_gpr_predict, np_rbf, np_matern52


def test_single_layer_collapsed_vs_exact_gpr():
    np.random.seed(100)
    N, D_X, D_Y, Ns = 4, 3, 2, 5
    lik_var = 0.1
    X = np.random.uniform(size=(N, D_X))
    Y = np.random.uniform(size=(N, D_Y))
    Xs = np.random.uniform(size=(Ns, D_X))

    with temp_config(jitter=1e-12):
        kern = RBF.make(D_X, lengthscales=0.1)
        var = float(np.asarray(kern.variance.value))
        ls = np.asarray(kern.lengthscales.value)

        layers = [SGPRLayer.make(kern, X.copy(), D_Y,
                                 Zero(output_dim=D_Y))]
        m = DGPCollapsed.make(X, Y, Gaussian.make(lik_var), layers)

        L_dgp = float(m.elbo())
        kf = lambda A, B: np_rbf(A, B, var, ls)
        L_exact = np_gpr_marginal(kf(X, X), Y, lik_var)
        assert_allclose(L_dgp, L_exact, atol=1e-5, rtol=1e-5)

        mean, varf = m.predict_f_full_cov(jnp.asarray(Xs), S=1)
        mean_e, var_e = np_gpr_predict(kf, X, Y, Xs, lik_var, full_cov=True)
        assert_allclose(np.asarray(mean)[0], mean_e, atol=1e-5, rtol=1e-5)
        assert_allclose(np.asarray(varf)[0][:, :, 0], var_e, atol=1e-5,
                        rtol=1e-5)


def test_sgpr_certain_bound_vs_numpy():
    """Directly exercise the X_var=None (Titsias) branch
    (reference layers.py:371-402)."""
    from oracles import np_sgpr_bound
    np.random.seed(7)
    N, M, D_X, D_Y = 9, 4, 2, 2
    lik_var = 0.23
    X = np.random.randn(N, D_X)
    Y = np.random.randn(N, D_Y)
    Z = np.random.randn(M, D_X)

    with temp_config(jitter=1e-12):
        kern = RBF.make(D_X, variance=1.4, lengthscales=0.9)
        layer = SGPRLayer.make(kern, Z, D_Y, Zero(output_dim=D_Y))
        layer = layer.set_data(jnp.asarray(X), None, jnp.asarray(Y),
                               jnp.asarray(lik_var))
        bound = float(layer.build_likelihood())

        kf = lambda A, B: np_rbf(A, B, 1.4, 0.9)
        kd = lambda A: np.diag(kf(A, A))
        expected = np_sgpr_bound(kf, kd, X, Y, Z, lik_var, jitter=1e-12)
        assert_allclose(bound, expected, rtol=1e-8)


def test_natgrad_one_step_equals_collapsed():
    """gamma=1 single natgrad step on the (conjugate) final layer ==
    analytically collapsed bound (reference test_collapsed.py:57-104)."""
    np.random.seed(100)
    N, M, D_X, D_Y = 1, 8, 1, 1
    lik_var = 0.1
    X = np.random.uniform(size=(N, D_X))
    Y = np.random.uniform(size=(N, D_Y))
    Z = np.random.uniform(size=(M, D_X))
    Z[:N] = X[:M]

    with temp_config(jitter=1e-12):
        def kerns():
            return [RBF.make(D_X, lengthscales=0.1),
                    RBF.make(D_X, lengthscales=0.5)]

        layers_col = init_layers_linear(X, Y, Z, kerns())
        layers_ng = init_layers_linear(X, Y, Z, kerns())

        # shared random inner variational parameters
        q_mu1 = np.random.randn(M, D_X)
        q_sqrt1 = np.tril(np.random.randn(M, M))[None, :, :]
        for layers in (layers_col, layers_ng):
            layers[0] = layers[0].replace(
                q_mu=layers[0].q_mu.with_value(q_mu1),
                q_sqrt=layers[0].q_sqrt.with_value(q_sqrt1))

        last = SGPRLayer.make(layers_col[-1].kern,
                              np.asarray(layers_col[-1].Z.value),
                              D_Y, layers_col[-1].mean_function)
        m_col = DGPCollapsed.make(X, Y, Gaussian.make(lik_var),
                                  layers_col[:-1] + [last])
        m_ng = DGPQuad.build(X, Y, Gaussian.make(lik_var), layers_ng,
                             H=200)

        ng = NaturalGradient(gamma=1.0, var_layers=(-1,))
        m_ng2 = ng.step(m_ng, lambda m: -m.elbo())

        L_col = float(m_col.elbo())
        L_ng = float(m_ng2.elbo())
        assert_allclose(L_col, L_ng, rtol=1e-7, atol=1e-7)


class TestHeinonen:
    def setup_method(self, method):
        np.random.seed(0)
        N, D_X, D_Y = 6, 3, 2
        self.X = np.random.uniform(size=(N, D_X))
        self.Xs = self.X
        self.D_Y = D_Y

    def test_vs_exact_gpr(self):
        """With an identity first layer (q_mu=0 -> f=X), the Heinonen
        model is exact GPR (reference test_zoo_models.py:43-80)."""
        lik_var = 0.01
        N, D_Y, D_X = self.X.shape[0], self.D_Y, self.X.shape[1]
        Y = np.random.randn(N, D_Y)
        Ys = np.random.randn(N, D_Y)

        with temp_config(jitter=1e-12):
            kern0 = Matern52.make(D_X, lengthscales=0.5, variance=1e-1)
            kern1 = Matern52.make(D_X, lengthscales=0.5)
            var1 = float(np.asarray(kern1.variance.value))
            layer0 = GPMCLayer.make(kern0, self.X.copy(), D_X, Identity())
            layer1 = GPRLayer.make(kern1, Zero(output_dim=D_Y), D_Y)
            m = DGPHeinonen.make(self.X, Y, Gaussian.make(lik_var),
                                 [layer0, layer1])

            kf = lambda A, B: np_matern52(A, B, var1, 0.5)
            mean_e, var_e = np_gpr_predict(kf, self.X, Y, self.Xs, lik_var)

            mean, var = m.predict_f(jnp.asarray(self.Xs), S=1)
            tol = 1e-4
            assert_allclose(np.asarray(mean)[0], mean_e, atol=tol, rtol=tol)
            assert_allclose(np.asarray(var)[0][:, 0],
                            var_e, atol=tol, rtol=tol)

            # predictive y moments
            my, vy = m.predict_y(jnp.asarray(self.Xs), S=1)
            assert_allclose(np.asarray(my)[0], mean_e, atol=tol, rtol=tol)
            assert_allclose(np.asarray(vy)[0][:, 0], var_e + lik_var,
                            atol=tol, rtol=tol)

            # log marginal equals exact GPR marginal
            L = float(m.elbo())
            L_exact = np_gpr_marginal(kf(self.X, self.X), Y, lik_var)
            assert_allclose(L, L_exact, atol=1e-6, rtol=1e-6)

    def test_log_posterior_includes_prior(self):
        lik_var = 0.1
        Y = np.random.randn(self.X.shape[0], self.D_Y)
        with temp_config(jitter=1e-12):
            kern0 = Matern52.make(self.X.shape[1], lengthscales=0.5)
            kern1 = Matern52.make(self.X.shape[1], lengthscales=0.5)
            layer0 = GPMCLayer.make(kern0, self.X.copy(), self.X.shape[1],
                                    Identity())
            layer1 = GPRLayer.make(kern1, Zero(output_dim=self.D_Y),
                                   self.D_Y)
            m = DGPHeinonen.make(self.X, Y, Gaussian.make(lik_var),
                                 [layer0, layer1])
            # with q_mu = 0, the N(0,1) prior contributes
            # -0.5 N D log(2 pi) exactly
            lp = float(m.log_posterior()) - float(m.elbo())
            expected = -0.5 * m.layers[0].q_mu.value.size * np.log(2 * np.pi)
            assert_allclose(lp, expected, rtol=1e-10)
