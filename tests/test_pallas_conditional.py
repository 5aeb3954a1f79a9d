"""Fused staged sparse-conditional Pallas kernel: forward and custom-VJP
parity against the jnp reference (interpret mode on CPU).

The kernel contract is the STAGED form (G = K LiT computed in-kernel;
see ops/pallas/conditional.py) — LiT = identity recovers the unstaged
math, and a generic dense LiT exercises the staging matmul and its
dLiT cotangent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.ops.pallas.conditional import (
    fused_conditional, fused_conditional_reference,
    fused_conditional_saved)

FUSED = {"recompute": fused_conditional, "saved": fused_conditional_saved}


def _setup(B=700, M=100, Dx=8, Do=4, dtype=jnp.float64, seed=0,
           identity_lit=False):
    rng = np.random.RandomState(seed)
    Xs = jnp.asarray(rng.randn(B, Dx), dtype=dtype)
    Zs = jnp.asarray(rng.randn(M, Dx), dtype=dtype)
    if identity_lit:
        LiT = jnp.eye(M, dtype=dtype)
    else:
        # well-conditioned dense staging factor (the kernel does not
        # assume triangularity)
        LiT = jnp.asarray(np.eye(M) + 0.1 * rng.randn(M, M), dtype=dtype)
    alpha = jnp.asarray(rng.randn(M, Do) * 0.3, dtype=dtype)
    Wh = rng.randn(Do, M, M) * 0.1
    W = jnp.asarray((Wh + np.swapaxes(Wh, 1, 2)) / 2, dtype=dtype)
    kvar = jnp.asarray(1.4, dtype=dtype)
    kdiag = jnp.asarray(1.4 + 2e-6, dtype=dtype)
    return Xs, Zs, LiT, alpha, W, kvar, kdiag


@pytest.mark.parametrize("variant", ["recompute", "saved"])
@pytest.mark.parametrize("B,M,Do", [(700, 100, 4), (512, 128, 1),
                                    (130, 37, 3)])
def test_forward_parity(B, M, Do, variant):
    args = _setup(B=B, M=M, Do=Do)
    m1, v1 = FUSED[variant](*args, True)
    m2, v2 = fused_conditional_reference(*args)
    assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9, atol=1e-11)
    assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-9, atol=1e-11)


def test_identity_lit_recovers_unstaged_math():
    """LiT = I: mean/var reduce to the raw k(x)-referenced form."""
    Xs, Zs, LiT, alpha, W, kvar, kdiag = _setup(B=130, M=37, Do=2,
                                                identity_lit=True)
    m1, v1 = fused_conditional(Xs, Zs, LiT, alpha, W, kvar, kdiag, True)
    d = (Xs[:, None, :] - Zs[None, :, :])
    K = kvar * jnp.exp(-0.5 * jnp.sum(d * d, -1))
    m2 = K @ alpha
    v2 = kdiag + jnp.einsum("bm,dmn,bn->bd", K, W, K)
    assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9, atol=1e-11)
    assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-9, atol=1e-11)


GRAD_ARGNUMS = tuple(range(7))
GRAD_NAMES = ["dXs", "dZs", "dLiT", "dalpha", "dW", "dkvar", "dkdiag"]


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

    g1 = jax.grad(f_pl, argnums=GRAD_ARGNUMS)(*args)
    g2 = jax.grad(f_ref, argnums=GRAD_ARGNUMS)(*args)
    for a, b, n in zip(g1, g2, GRAD_NAMES):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
                        err_msg=n)


@pytest.mark.parametrize("variant", ["recompute", "saved"])
def test_gradient_parity_multi_tile(variant):
    """B spanning several batch tiles (TB=512 fwd / 256 bwd): pins the
    cross-tile accumulation of dW/dZ/dalpha/dLiT in revisited output
    blocks — the round-1 grad tests only ever covered a single tile."""
    B, M, Do = 1100, 40, 2
    args = _setup(B=B, M=M, Dx=4, Do=Do, seed=5)
    rng = np.random.RandomState(6)
    Gm = jnp.asarray(rng.randn(B, Do))
    Gv = jnp.asarray(rng.randn(B, Do))

    def f_pl(*a):
        m, v = FUSED[variant](*a, True)
        return jnp.sum(m * Gm) + jnp.sum(v * Gv)

    def f_ref(*a):
        m, v = fused_conditional_reference(*a)
        return jnp.sum(m * Gm) + jnp.sum(v * Gv)

    g1 = jax.grad(f_pl, argnums=GRAD_ARGNUMS)(*args)
    g2 = jax.grad(f_ref, argnums=GRAD_ARGNUMS)(*args)
    for a, b, n in zip(g1, g2, GRAD_NAMES):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
                        err_msg=n)


def test_gradient_parity_with_clamp_active():
    """Negative-variance clamp: the vjp must zero the masked entries the
    same way the reference max(., 0) does (checked on the save-gram
    variant, whose bwd consumes the forward-saved gram)."""
    args = list(_setup(B=200, M=30, Dx=4, Do=2, seed=3))
    # force some negative raw variances: large negative kdiag
    args[6] = jnp.asarray(-0.5, dtype=jnp.float64)
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

    g1 = jax.grad(f_pl, argnums=(0, 2, 4, 6))(*args)
    g2 = jax.grad(f_ref, argnums=(0, 2, 4, 6))(*args)
    for a, b, n in zip(g1, g2, ["dXs", "dLiT", "dW", "dkdiag"]):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9,
                        err_msg=n)
