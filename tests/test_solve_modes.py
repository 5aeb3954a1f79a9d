"""solve-mode equivalence: the 'inverse' (precomputed alpha/W) fast path
must match the 'solve' (triangular, reference) formulation of the SVGP
conditional for white and non-white layers."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import RBF, SVGPLayer
from doubly_stochastic_dgp_tpu.config import temp_config
from doubly_stochastic_dgp_tpu.models.mean_functions import Zero


@pytest.mark.parametrize("white", [True, False])
def test_conditional_modes_agree(white):
    np.random.seed(0)
    M, B, Din, Dout = 9, 17, 3, 4
    Z = np.random.randn(M, Din)
    X = np.random.randn(B, Din)
    kern = RBF.make(Din, variance=1.3, lengthscales=0.8)
    layer = SVGPLayer.make(kern, Z, Dout, Zero(output_dim=Dout),
                           white=white)
    layer = layer.replace(
        q_mu=layer.q_mu.with_value(np.random.randn(M, Dout)),
        q_sqrt=layer.q_sqrt.with_value(
            np.tril(np.random.randn(Dout, M, M)) + np.eye(M)))

    with temp_config(solve_mode="solve"):
        m1, v1 = layer.conditional_ND(jnp.asarray(X))
    with temp_config(solve_mode="inverse"):
        m2, v2 = layer.conditional_ND(jnp.asarray(X))

    assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9, atol=1e-11)
    assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8, atol=1e-11)
