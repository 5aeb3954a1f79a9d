"""Kernel tests against independent numpy closed forms (the rebuild's
substitute for GPflow kernel oracles, SURVEY §4 rebuild plan)."""

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.ops.kernels import (RBF, Constant, Matern12,
                                                   Matern32, Matern52,
                                                   Product, Sum, White)
from doubly_stochastic_dgp_tpu.ops.kernels import Linear as LinearKernel


def _np_sqdist(X, Z, ls):
    d = (X[:, None, :] - Z[None, :, :]) / ls
    return np.sum(d ** 2, -1)


def test_rbf_ard():
    N, M, D = 7, 5, 3
    X = np.random.randn(N, D)
    Z = np.random.randn(M, D)
    ls = np.array([0.5, 1.2, 2.0])
    var = 1.7
    k = RBF.make(D, variance=var, lengthscales=ls)
    expected = var * np.exp(-0.5 * _np_sqdist(X, Z, ls))
    assert_allclose(np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z))),
                    expected, rtol=1e-9)
    expected_sym = var * np.exp(-0.5 * _np_sqdist(X, X, ls))
    assert_allclose(np.asarray(k.K(jnp.asarray(X))), expected_sym,
                    rtol=1e-8, atol=1e-10)
    assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))),
                    np.full(N, var), rtol=1e-12)


def test_materns():
    N, M, D = 6, 4, 2
    X = np.random.randn(N, D)
    Z = np.random.randn(M, D)
    ls, var = 0.8, 2.0
    r = np.sqrt(_np_sqdist(X, Z, ls))
    cases = {
        Matern12: var * np.exp(-r),
        Matern32: var * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r),
        Matern52: var * (1 + np.sqrt(5) * r + 5 / 3 * r ** 2)
        * np.exp(-np.sqrt(5) * r),
    }
    for cls, expected in cases.items():
        k = cls.make(D, variance=var, lengthscales=ls)
        assert_allclose(np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z))),
                        expected, rtol=1e-8, err_msg=cls.__name__)


def test_white():
    N, D = 5, 2
    X = np.random.randn(N, D)
    Z = np.random.randn(3, D)
    k = White.make(D, variance=2e-6)
    assert_allclose(np.asarray(k.K(jnp.asarray(X))), 2e-6 * np.eye(N))
    assert_allclose(np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z))),
                    np.zeros((N, 3)))
    assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), np.full(N, 2e-6))


def test_sum_product_algebra():
    N, D = 5, 2
    X = np.random.randn(N, D)
    k1 = RBF.make(D, variance=1.5)
    k2 = White.make(D, variance=0.1)
    ks = k1 + k2
    assert isinstance(ks, Sum)
    assert_allclose(np.asarray(ks.K(jnp.asarray(X))),
                    np.asarray(k1.K(jnp.asarray(X)))
                    + np.asarray(k2.K(jnp.asarray(X))), rtol=1e-12)
    kp = k1 * Constant.make(D, variance=2.0)
    assert isinstance(kp, Product)
    assert_allclose(np.asarray(kp.K(jnp.asarray(X))),
                    2.0 * np.asarray(k1.K(jnp.asarray(X))), rtol=1e-9)


def test_linear_kernel():
    N, M, D = 4, 3, 2
    X = np.random.randn(N, D)
    Z = np.random.randn(M, D)
    k = LinearKernel.make(D, variance=1.3)
    assert_allclose(np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z))),
                    1.3 * X @ Z.T, rtol=1e-9)
    assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))),
                    1.3 * np.sum(X ** 2, -1), rtol=1e-9)


def test_kernel_gradients_flow():
    import jax
    D = 2
    X = jnp.asarray(np.random.randn(4, D))

    def f(k):
        return jnp.sum(k.K(X))

    k = RBF.make(D, variance=1.0, lengthscales=0.7)
    g = jax.grad(f)(k)
    assert np.all(np.isfinite(np.asarray(g.variance.unconstrained)))
    assert np.all(np.isfinite(np.asarray(g.lengthscales.unconstrained)))
    # coincident points (r=0) must not produce NaN grads for Materns
    Xc = jnp.zeros((3, D))
    k52 = Matern52.make(D)
    g2 = jax.grad(lambda kk: jnp.sum(kk.K(Xc)))(k52)
    assert np.all(np.isfinite(np.asarray(g2.lengthscales.unconstrained)))


class TestExtendedKernels:
    """RationalQuadratic / Cosine / Periodic / ArcCosine vs independent
    numpy formulas (the GPflow-1.x tail of the inherited surface)."""

    def setup_method(self):
        rng = np.random.RandomState(3)
        self.X = rng.randn(7, 3)
        self.Z = rng.randn(5, 3)
        self.ls = rng.rand(3) + 0.5

    def test_rational_quadratic(self):
        from doubly_stochastic_dgp_tpu.ops.kernels import RationalQuadratic
        k = RationalQuadratic.make(3, variance=1.7, lengthscales=self.ls,
                                   alpha=0.8)
        d = (self.X[:, None, :] - self.Z[None, :, :]) / self.ls
        r2 = np.sum(d ** 2, -1)
        expect = 1.7 * (1 + r2 / (2 * 0.8)) ** (-0.8)
        assert_allclose(np.asarray(k.K(self.X, self.Z)), expect,
                        rtol=1e-10)
        assert_allclose(np.asarray(k.Kdiag(self.X)), np.full(7, 1.7))

    def test_cosine(self):
        from doubly_stochastic_dgp_tpu.ops.kernels import Cosine
        k = Cosine.make(3, variance=0.9, lengthscales=self.ls)
        d = (self.X[:, None, :] - self.Z[None, :, :]) / self.ls
        expect = 0.9 * np.cos(np.sqrt(np.sum(d ** 2, -1)))
        assert_allclose(np.asarray(k.K(self.X, self.Z)), expect,
                        rtol=1e-8)

    def test_periodic(self):
        from doubly_stochastic_dgp_tpu.ops.kernels import Periodic
        k = Periodic.make(3, variance=1.2, lengthscales=self.ls,
                          period=1.9)
        d = self.X[:, None, :] - self.Z[None, :, :]
        s = np.sin(np.pi * d / 1.9) / self.ls
        expect = 1.2 * np.exp(-0.5 * np.sum(s ** 2, -1))
        assert_allclose(np.asarray(k.K(self.X, self.Z)), expect,
                        rtol=1e-10)
        # symmetric gram is PSD
        K = np.asarray(k.K(self.X))
        assert np.min(np.linalg.eigvalsh(K)) > -1e-10

    def test_arccosine_orders(self):
        from doubly_stochastic_dgp_tpu.ops.kernels import ArcCosine
        w = np.random.RandomState(4).rand(3) + 0.3
        for order in (0, 1, 2):
            k = ArcCosine.make(3, order=order, variance=1.3,
                               weight_variances=w, bias_variance=0.7)

            def num_K(A, B):
                wp = 0.7 + (A * w) @ B.T
                dA = 0.7 + np.sum(A ** 2 * w, -1)
                dB = 0.7 + np.sum(B ** 2 * w, -1)
                den = np.sqrt(dA[:, None] * dB[None, :])
                th = np.arccos(np.clip(wp / den, -1, 1))
                if order == 0:
                    J = np.pi - th
                elif order == 1:
                    J = np.sin(th) + (np.pi - th) * np.cos(th)
                else:
                    J = 3 * np.sin(th) * np.cos(th) \
                        + (np.pi - th) * (1 + 2 * np.cos(th) ** 2)
                return 1.3 / np.pi * J * den ** order

            assert_allclose(np.asarray(k.K(self.X, self.Z)),
                            num_K(self.X, self.Z), rtol=1e-6)
            assert_allclose(np.asarray(k.Kdiag(self.X)),
                            np.diag(num_K(self.X, self.X)), rtol=1e-6)
            # PSD
            K = np.asarray(k.K(self.X))
            assert np.min(np.linalg.eigvalsh(K)) > -1e-8

    def test_composition_and_dgp_layer(self):
        """The new kernels compose through Sum/Product and drive an
        SVGP layer end-to-end."""
        import doubly_stochastic_dgp_tpu as dsd
        from doubly_stochastic_dgp_tpu.ops.kernels import (Periodic,
                                                           RationalQuadratic)
        import jax

        rng = np.random.RandomState(0)
        X = rng.rand(16, 2)
        Y = np.sin(6 * X[:, :1]) + 0.1 * rng.randn(16, 1)
        k = RationalQuadratic.make(2) + Periodic.make(2)
        m = dsd.DGP.build(X, Y, X[:6].copy(), [k], dsd.Gaussian.make(0.1),
                          num_samples=3)
        e = m.elbo(key=jax.random.PRNGKey(0))
        assert np.isfinite(float(e))
        g = jax.grad(lambda mm: mm.elbo(key=jax.random.PRNGKey(0)))(m)
        assert all(np.all(np.isfinite(l))
                   for l in jax.tree_util.tree_leaves(g))
