"""Pallas fused-gram kernel: parity vs the XLA path (interpret mode on
CPU) for values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.ops.pallas.gram import rbf_gram


def _ref(X, Z, ls, var):
    d = (X[:, None, :] - Z[None, :, :]) / ls
    return var * jnp.exp(-0.5 * jnp.sum(d * d, -1))


@pytest.mark.parametrize("N,M,D", [(64, 48, 8), (300, 130, 3)])
def test_forward_parity(N, M, D):
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(N, D), dtype=jnp.float32)
    Z = jnp.asarray(rng.randn(M, D), dtype=jnp.float32)
    ls = jnp.asarray(rng.rand(D) + 0.5, dtype=jnp.float32)
    var = jnp.float32(1.7)
    got = rbf_gram(X, Z, ls, var, True)  # interpret mode on CPU
    ref = _ref(X, Z, ls, var)
    assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_gradient_parity():
    rng = np.random.RandomState(1)
    N, M, D = 72, 40, 4
    X = jnp.asarray(rng.randn(N, D), dtype=jnp.float64)
    Z = jnp.asarray(rng.randn(M, D), dtype=jnp.float64)
    ls = jnp.asarray(rng.rand(D) + 0.5, dtype=jnp.float64)
    var = jnp.asarray(1.3, dtype=jnp.float64)
    G = jnp.asarray(rng.randn(N, M), dtype=jnp.float64)

    def f_pl(X, Z, ls, var):
        return jnp.sum(rbf_gram(X, Z, ls, var, True) * G)

    def f_ref(X, Z, ls, var):
        return jnp.sum(_ref(X, Z, ls, var) * G)

    g1 = jax.grad(f_pl, argnums=(0, 1, 2, 3))(X, Z, ls, var)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(X, Z, ls, var)
    for a, b, name in zip(g1, g2, ["dX", "dZ", "dls", "dvar"]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9,
                        err_msg=name)
