"""Fused sparse-conditional Pallas kernel: forward and custom-VJP parity
against the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.ops.pallas.conditional import (
    fused_conditional, fused_conditional_reference,
    fused_conditional_saved)

FUSED = {"recompute": fused_conditional, "saved": fused_conditional_saved}


def _setup(B=700, M=100, Dx=8, Do=4, dtype=jnp.float64, seed=0):
    rng = np.random.RandomState(seed)
    Xs = jnp.asarray(rng.randn(B, Dx), dtype=dtype)
    Zs = jnp.asarray(rng.randn(M, Dx), dtype=dtype)
    alpha = jnp.asarray(rng.randn(M, Do) * 0.3, dtype=dtype)
    Wh = rng.randn(Do, M, M) * 0.1
    W = jnp.asarray((Wh + np.swapaxes(Wh, 1, 2)) / 2, dtype=dtype)
    kvar = jnp.asarray(1.4, dtype=dtype)
    kdiag = jnp.asarray(1.4 + 2e-6, dtype=dtype)
    return Xs, Zs, alpha, W, kvar, kdiag


@pytest.mark.parametrize("variant", ["recompute", "saved"])
@pytest.mark.parametrize("B,M,Do", [(700, 100, 4), (512, 128, 1),
                                    (130, 37, 3)])
def test_forward_parity(B, M, Do, variant):
    args = _setup(B=B, M=M, Do=Do)
    m1, v1 = FUSED[variant](*args, True)
    m2, v2 = fused_conditional_reference(*args)
    assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9, atol=1e-11)
    assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("variant", ["recompute", "saved"])
def test_gradient_parity(variant):
    args = _setup(B=260, M=50, Dx=5, Do=3, seed=1)
    rng = np.random.RandomState(2)
    Gm = jnp.asarray(rng.randn(260, 3))
    Gv = jnp.asarray(rng.randn(260, 3))

    def f_pl(*a):
        m, v = FUSED[variant](*a, True)
        return jnp.sum(m * Gm) + jnp.sum(v * Gv)

    def f_ref(*a):
        m, v = fused_conditional_reference(*a)
        return jnp.sum(m * Gm) + jnp.sum(v * Gv)

    g1 = jax.grad(f_pl, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(f_ref, argnums=tuple(range(6)))(*args)
    names = ["dXs", "dZs", "dalpha", "dW", "dkvar", "dkdiag"]
    for a, b, n in zip(g1, g2, names):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
                        err_msg=n)


def test_gradient_parity_with_clamp_active():
    """Negative-variance clamp: the vjp must zero the masked entries the
    same way the reference max(., 0) does (checked on the save-gram
    variant, whose bwd consumes the forward-saved gram)."""
    args = list(_setup(B=200, M=30, Dx=4, Do=2, seed=3))
    # force some negative raw variances: large negative kdiag
    args[5] = jnp.asarray(-0.5, dtype=jnp.float64)
    rng = np.random.RandomState(4)
    Gv = jnp.asarray(rng.randn(200, 2))

    def f_pl(*a):
        _, v = fused_conditional_saved(*a, True)
        return jnp.sum(v * Gv)

    def f_ref(*a):
        _, v = fused_conditional_reference(*a)
        return jnp.sum(v * Gv)

    # confirm the clamp actually bites
    _, v_ref = fused_conditional_reference(*args)
    assert np.any(np.asarray(v_ref) == 0.0)

    g1 = jax.grad(f_pl, argnums=(0, 3, 5))(*args)
    g2 = jax.grad(f_ref, argnums=(0, 3, 5))(*args)
    for a, b, n in zip(g1, g2, ["dXs", "dW", "dkdiag"]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
                        err_msg=n)
