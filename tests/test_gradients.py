"""Gradient correctness: finite-difference validation of the full DGP
ELBO gradient (through bijectors, Cholesky, triangular solves, the KL
and the reparameterized propagation), plus KL-nonnegativity property
tests."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import DGP, Gaussian, RBF, SVGPLayer, White
from doubly_stochastic_dgp_tpu.config import temp_config
from doubly_stochastic_dgp_tpu.models.mean_functions import Zero
from doubly_stochastic_dgp_tpu.training.optim import partition_trainable


def _det_loss_fn(zs):
    def loss(m):
        _, Fm, Fv = m.propagate(m.X_data, zs=zs, S=2)
        ve = m.likelihood.variational_expectations(Fm[-1], Fv[-1],
                                                   m.Y_data)
        KL = sum((l.KL() for l in m.layers), jnp.zeros((), ve.dtype))
        return -(jnp.sum(jnp.mean(ve, 0)) - KL)
    return loss


def test_elbo_grad_matches_finite_differences():
    np.random.seed(0)
    N, D, M = 12, 2, 5
    X = np.random.rand(N, D)
    Y = np.random.randn(N, 1)
    Z = X[:M].copy()
    with temp_config(jitter=1e-8):
        kerns = [RBF.make(D, lengthscales=0.7) + White.make(D, variance=1e-4),
                 RBF.make(D, lengthscales=0.7)]
        m = DGP.build(X, Y, Z, kerns, Gaussian.make(0.1), num_samples=2)
        zs = [jnp.asarray(np.random.randn(2, N, l.num_outputs) * 0.3)
              for l in m.layers]
        loss = _det_loss_fn(zs)

        flat, rebuild = partition_trainable(m)
        f = jax.jit(lambda v: loss(rebuild(v)))
        g = np.asarray(jax.jit(jax.grad(lambda v: loss(rebuild(v))))(flat))

        rng = np.random.RandomState(1)
        idxs = rng.choice(flat.shape[0], size=25, replace=False)
        eps = 1e-5
        flat = np.asarray(flat)
        for i in idxs:
            e = np.zeros_like(flat)
            e[i] = eps
            fd = (float(f(jnp.asarray(flat + e)))
                  - float(f(jnp.asarray(flat - e)))) / (2 * eps)
            assert_allclose(g[i], fd, rtol=2e-4, atol=1e-6,
                            err_msg=f"param index {i}")


def test_kl_nonnegative_property():
    """KL(q || p) >= 0 for random valid variational parameters, white
    and non-white."""
    rng = np.random.RandomState(0)
    for trial in range(10):
        M, D = rng.randint(2, 8), rng.randint(1, 4)
        Z = rng.randn(M, 2)
        kern = RBF.make(2, variance=float(rng.rand() + 0.5),
                        lengthscales=float(rng.rand() + 0.3))
        for white in (True, False):
            layer = SVGPLayer.make(kern, Z, D, Zero(output_dim=D),
                                   white=white)
            q_mu = rng.randn(M, D)
            q_sqrt = np.tril(rng.randn(D, M, M) * 0.5) \
                + np.eye(M) * (rng.rand() + 0.1)
            layer = layer.replace(q_mu=layer.q_mu.with_value(q_mu),
                                  q_sqrt=layer.q_sqrt.with_value(q_sqrt))
            kl = float(layer.KL())
            assert kl >= -1e-8, (trial, white, kl)


def test_kl_zero_at_prior():
    """KL == 0 when q equals the prior (q_mu=0; q_sqrt=I white /
    q_sqrt=chol(Kuu) non-white — the default init)."""
    Z = np.random.RandomState(0).randn(6, 2)
    kern = RBF.make(2)
    with temp_config(jitter=1e-12):
        lw = SVGPLayer.make(kern, Z, 3, Zero(output_dim=3), white=True)
        assert abs(float(lw.KL())) < 1e-9
        ln = SVGPLayer.make(kern, Z, 3, Zero(output_dim=3), white=False)
        assert abs(float(ln.KL())) < 1e-7
