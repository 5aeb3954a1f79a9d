"""Numerics core tests: reparameterize (diag + full-cov) against the
closed-form numpy expressions from the reference's (commented-out) unit
tests (/root/reference/tests/test_utils.py:180-206), KL against scipy,
MVN logpdf against scipy."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose
from scipy import stats

from doubly_stochastic_dgp_tpu.config import temp_config
from doubly_stochastic_dgp_tpu.ops.linalg import (gauss_kl_nonwhite,
                                                  gauss_kl_white,
                                                  mvn_logpdf,
                                                  reparameterize,
                                                  tri_solve)


def test_reparameterize_diag():
    S, N, D = 4, 3, 2
    mean = np.random.randn(S, N, D)
    var = np.random.randn(S, N, D) ** 2
    z = np.random.randn(S, N, D)
    expected = mean + z * (var + 1e-6) ** 0.5
    with temp_config(jitter=1e-6):
        out = reparameterize(jnp.asarray(mean), jnp.asarray(var),
                             jnp.asarray(z))
    assert_allclose(np.asarray(out), expected, rtol=1e-12)


def test_reparameterize_full_cov():
    S, N, D = 4, 3, 2
    mean = np.random.randn(S, N, D)
    U = np.random.randn(S, N, N, D)
    var = np.einsum("SnNd,SmNd->Snmd", U, U) + np.eye(N)[None, :, :, None] * 1e-6

    var_flat = np.reshape(np.transpose(var, [0, 3, 1, 2]), [S * D, N, N])
    L_flat = np.linalg.cholesky(var_flat + np.eye(N)[None] * 1e-6)
    L = np.transpose(np.reshape(L_flat, [S, D, N, N]), [0, 2, 3, 1])
    z = np.random.randn(S, N, D)
    expected = mean + np.einsum("SnNd,SNd->Snd", L, z)

    with temp_config(jitter=1e-6):
        out = reparameterize(jnp.asarray(mean), jnp.asarray(var),
                             jnp.asarray(z), full_cov=True)
    assert_allclose(np.asarray(out), expected, rtol=1e-9, atol=1e-9)


def test_reparameterize_none_var():
    mean = jnp.ones((2, 3, 1))
    assert reparameterize(mean, None, None) is mean


def _scipy_kl(m, S, P):
    """KL(N(m, S) || N(0, P)) closed form via numpy."""
    M = len(m)
    Pinv = np.linalg.inv(P)
    return 0.5 * (np.trace(Pinv @ S) + m @ Pinv @ m - M
                  + np.log(np.linalg.det(P)) - np.log(np.linalg.det(S)))


def test_gauss_kl_white():
    M, D = 5, 3
    q_mu = np.random.randn(M, D)
    q_sqrt = np.tril(np.random.randn(D, M, M)) + np.eye(M) * 2.0
    expected = sum(
        _scipy_kl(q_mu[:, d], q_sqrt[d] @ q_sqrt[d].T, np.eye(M))
        for d in range(D))
    out = gauss_kl_white(jnp.asarray(q_mu), jnp.asarray(q_sqrt))
    assert_allclose(float(out), expected, rtol=1e-9)


def test_gauss_kl_nonwhite():
    M, D = 5, 3
    q_mu = np.random.randn(M, D)
    q_sqrt = np.tril(np.random.randn(D, M, M)) + np.eye(M) * 2.0
    A = np.random.randn(M, M)
    K = A @ A.T + np.eye(M) * 1e-3
    Lu = np.linalg.cholesky(K)
    expected = sum(
        _scipy_kl(q_mu[:, d], q_sqrt[d] @ q_sqrt[d].T, K) for d in range(D))
    out = gauss_kl_nonwhite(jnp.asarray(q_mu), jnp.asarray(q_sqrt),
                            jnp.asarray(Lu))
    assert_allclose(float(out), expected, rtol=1e-9)


def test_mvn_logpdf():
    N, D = 6, 2
    A = np.random.randn(N, N)
    K = A @ A.T + np.eye(N) * 1e-3
    L = np.linalg.cholesky(K)
    mu = np.random.randn(N, 1)
    Y = np.random.randn(N, D)
    expected = np.array([
        stats.multivariate_normal.logpdf(Y[:, d], mu[:, 0], K)
        for d in range(D)])
    out = mvn_logpdf(jnp.asarray(Y), jnp.asarray(np.tile(mu, (1, D))),
                     jnp.asarray(L))
    assert_allclose(np.asarray(out), expected, rtol=1e-7)


def test_tri_solve_inverse_mode_matches():
    M, B = 16, 7
    A = np.random.randn(M, M)
    L = np.linalg.cholesky(A @ A.T + np.eye(M))
    Rhs = np.random.randn(M, B)
    x1 = tri_solve(jnp.asarray(L), jnp.asarray(Rhs), lower=True,
                   mode="solve")
    x1t = tri_solve(jnp.asarray(L), jnp.asarray(Rhs), lower=True,
                    trans=True, mode="solve")
    x2 = tri_solve(jnp.asarray(L), jnp.asarray(Rhs), lower=True,
                   mode="inverse")
    x2t = tri_solve(jnp.asarray(L), jnp.asarray(Rhs), lower=True,
                    trans=True, mode="inverse")
    assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-8, atol=1e-8)
    assert_allclose(np.asarray(x1t), np.asarray(x2t), rtol=1e-8, atol=1e-8)


def _toplevel_primitive_count(closed, name):
    """Occurrences of a primitive on the unconditional path of a jaxpr:
    recurses through call-like sub-jaxprs (pjit, custom_vjp_call, ...)
    but NOT into cond branches — those only execute on escalation."""
    from jax.extend.core import Jaxpr

    def walk(jaxpr):
        n = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == name:
                n += 1
            if eqn.primitive.name == "cond":
                continue
            for v in eqn.params.values():
                for j in jax.tree_util.tree_leaves(
                        v, is_leaf=lambda x: isinstance(x, Jaxpr)
                        or hasattr(x, "jaxpr")):
                    if isinstance(j, Jaxpr):
                        n += walk(j)
                    elif hasattr(j, "jaxpr") and isinstance(j.jaxpr, Jaxpr):
                        n += walk(j.jaxpr)
        return n

    return walk(closed.jaxpr)


def test_safe_cholesky_one_factorization_on_healthy_path():
    """Round-3 perf contract (PERF.md M=512 profile): the live
    factorization runs once at the top level and the escalation rungs
    sit behind a lax.cond — the old always-on stop-gradient probe design
    cost 3 factorizations per call, ~1/3 of the whole large_M step."""
    from doubly_stochastic_dgp_tpu.ops.linalg import (safe_cholesky,
                                                      safe_cholesky_ladder)

    K = jnp.eye(8) * 2.0
    jaxpr = jax.make_jaxpr(lambda k: safe_cholesky(k, 1e-6))(K)
    assert _toplevel_primitive_count(jaxpr, "cholesky") == 1, jaxpr
    assert _toplevel_primitive_count(jaxpr, "cond") >= 1, jaxpr

    jaxpr_l = jax.make_jaxpr(safe_cholesky_ladder)(K)
    assert _toplevel_primitive_count(jaxpr_l, "cholesky") == 1, jaxpr_l
    assert _toplevel_primitive_count(jaxpr_l, "cond") >= 1, jaxpr_l

    # and the backward pass is the closed-form pullback: no extra
    # cholesky at the grad jaxpr's top level either
    jaxpr_g = jax.make_jaxpr(
        jax.grad(lambda k: jnp.sum(safe_cholesky(k, 1e-6))))(K)
    assert _toplevel_primitive_count(jaxpr_g, "cholesky") == 1, jaxpr_g


def test_safe_cholesky_grad_matches_native_cholesky():
    """The custom Cholesky pullback agrees with jax's native VJP to
    machine epsilon on symmetric inputs (the only inputs the framework
    ever factorizes), including through downstream uses of both L and
    L^T and for batched (D, M, M) operands."""
    rng = np.random.RandomState(0)
    from doubly_stochastic_dgp_tpu.ops.linalg import safe_cholesky

    for shape in ((9, 9), (3, 6, 6)):
        A = rng.randn(*shape)
        K = jnp.asarray(A @ np.swapaxes(A, -1, -2)
                        + shape[-1] * np.eye(shape[-1]))

        def f(K, chol):
            L = chol(K)
            return (jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
                    + jnp.sum((L @ jnp.swapaxes(L, -1, -2)) ** 2)
                    + jnp.sum(L[..., -1, :]))

        eye = jnp.eye(shape[-1])
        g_new = jax.grad(lambda k: f(k, lambda a: safe_cholesky(a, 1e-12)))(K)
        g_nat = jax.grad(
            lambda k: f(k, lambda a: jnp.linalg.cholesky(a + 1e-12 * eye)))(K)
        sym = lambda g: 0.5 * (g + jnp.swapaxes(g, -1, -2))
        assert_allclose(np.asarray(sym(g_new)), np.asarray(sym(g_nat)),
                        rtol=1e-12, atol=1e-12)


def test_safe_cholesky_ladder_zero_rung_is_exact():
    """When the plain factorization succeeds, the 0.0 first rung returns
    bitwise the same factor as jnp.linalg.cholesky."""
    from doubly_stochastic_dgp_tpu.ops.linalg import safe_cholesky_ladder

    rng = np.random.RandomState(0)
    A = rng.randn(6, 6)
    K = jnp.asarray(A @ A.T + 6 * np.eye(6))
    np.testing.assert_array_equal(np.asarray(safe_cholesky_ladder(K)),
                                  np.asarray(jnp.linalg.cholesky(K)))


def test_safe_cholesky_ladder_escalates_with_finite_grads():
    """A slightly indefinite matrix (numerical garbage on a
    PSD-by-construction input, the TPU bf16 failure class): the ladder
    picks a positive rung, the factor is finite, and gradients through
    a downstream scalar stay finite (grad-safe probe selection)."""
    from doubly_stochastic_dgp_tpu.ops.linalg import safe_cholesky_ladder

    rng = np.random.RandomState(1)
    A = rng.randn(5, 5)
    K0 = A @ A.T + 5 * np.eye(5)
    w, V = np.linalg.eigh(K0)
    w[0] = -1e-5                     # small negative eigenvalue
    K = jnp.asarray(V @ np.diag(w) @ V.T)
    assert np.any(np.isnan(np.asarray(jnp.linalg.cholesky(K))))

    def f(K):
        L = safe_cholesky_ladder(K, jitters=(0.0, 1e-4, 1e-2))
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L)

    v, g = jax.value_and_grad(f)(K)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


def test_safe_cholesky_inv_forward_bitwise_vs_unfused():
    """The fused (L, Li) region returns bitwise the unfused composition
    inv_lower(safe_cholesky(K)) — it is the same forward computation
    inside one custom_vjp boundary (round-4 perf lever, VERDICT r3 #5a)."""
    from doubly_stochastic_dgp_tpu.ops.linalg import (inv_lower,
                                                      safe_cholesky,
                                                      safe_cholesky_inv)

    rng = np.random.RandomState(3)
    A = rng.randn(12, 12)
    K = jnp.asarray(A @ A.T + 12 * np.eye(12))
    L, Li = safe_cholesky_inv(K, 1e-8)
    L0 = safe_cholesky(K, 1e-8)
    np.testing.assert_array_equal(np.asarray(L), np.asarray(L0))
    np.testing.assert_array_equal(np.asarray(Li), np.asarray(inv_lower(L0)))


def test_safe_cholesky_inv_grad_matches_unfused():
    """Gradients through BOTH outputs of the fused region agree with the
    unfused composition (native cholesky + inv_lower autodiff) to f64
    machine epsilon — the matmul-only backward is the same math through
    a solve-free evaluation."""
    from doubly_stochastic_dgp_tpu.ops.linalg import (inv_lower,
                                                      safe_cholesky_inv)

    rng = np.random.RandomState(4)
    for n in (5, 9):
        A = rng.randn(n, n)
        K = jnp.asarray(A @ A.T + n * np.eye(n))
        W1 = jnp.asarray(rng.randn(n, n))
        W2 = jnp.asarray(rng.randn(n, n))

        def loss(pair):
            L, Li = pair
            return (jnp.sum(W1 * L) + jnp.sum(W2 * Li)
                    + jnp.sum((Li @ L) ** 2)
                    + jnp.sum(jnp.log(jnp.diagonal(L))))

        eye = jnp.eye(n)
        g_fused = jax.grad(
            lambda k: loss(safe_cholesky_inv(k, 1e-12)))(K)
        g_unf = jax.grad(lambda k: (lambda L: loss((L, inv_lower(L))))(
            jnp.linalg.cholesky(k + 1e-12 * eye)))(K)
        sym = lambda g: 0.5 * (g + g.T)
        assert_allclose(np.asarray(sym(g_fused)), np.asarray(sym(g_unf)),
                        rtol=1e-11, atol=1e-11)


def test_safe_cholesky_inv_backward_is_solve_free():
    """The whole point of the fusion: the grad jaxpr contains ZERO
    triangular solves (the unfused composition's VJP carries the
    triangular_solve transpose rule + the Cholesky pullback's own
    inverse) and exactly one top-level factorization."""
    from doubly_stochastic_dgp_tpu.ops.linalg import safe_cholesky_inv

    K = jnp.eye(8) * 2.0

    def f(k):
        L, Li = safe_cholesky_inv(k, 1e-6)
        return jnp.sum(L) + jnp.sum(Li ** 2)

    jaxpr_g = jax.make_jaxpr(jax.grad(f))(K)
    assert _toplevel_primitive_count(jaxpr_g, "cholesky") == 1, jaxpr_g
    assert _toplevel_primitive_count(jaxpr_g, "triangular_solve") == 1, \
        jaxpr_g  # the single forward inv_lower; none added by the VJP


def test_safe_cholesky_ladder_inv_escalates_with_finite_grads():
    """Fused ladder variant: indefinite input picks a positive rung,
    both outputs are finite, gradients through both stay finite."""
    from doubly_stochastic_dgp_tpu.ops.linalg import safe_cholesky_ladder_inv

    rng = np.random.RandomState(5)
    A = rng.randn(5, 5)
    K0 = A @ A.T + 5 * np.eye(5)
    w, V = np.linalg.eigh(K0)
    w[0] = -1e-5
    K = jnp.asarray(V @ np.diag(w) @ V.T)

    def f(K):
        L, Li = safe_cholesky_ladder_inv(K, jitters=(0.0, 1e-4, 1e-2))
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(Li)

    v, g = jax.value_and_grad(f)(K)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


def test_tri_solve_precomputed_inverse():
    """tri_solve(Li=...) (inverse mode) matches the self-computed path
    bitwise and rejects lower=False."""
    import pytest

    M, B = 10, 4
    rng = np.random.RandomState(6)
    A = rng.randn(M, M)
    L = jnp.asarray(np.linalg.cholesky(A @ A.T + np.eye(M)))
    Rhs = jnp.asarray(rng.randn(M, B))
    from doubly_stochastic_dgp_tpu.ops.linalg import inv_lower
    Li = inv_lower(L)
    for trans in (False, True):
        x0 = tri_solve(L, Rhs, lower=True, trans=trans, mode="inverse")
        x1 = tri_solve(L, Rhs, lower=True, trans=trans, mode="inverse",
                       Li=Li)
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
    with pytest.raises(ValueError, match="lower=True"):
        tri_solve(L, Rhs, lower=False, mode="inverse", Li=Li)


def test_safe_cholesky_ladder_deep_rungs_cover_large_indefiniteness():
    """Round-4 net extension: garbage beyond the 1.0-relative rung (the
    measured f32 psi2-deficit amplification at damianou_large scale put
    eigenvalue ~ -5e3 into AAT) must still factor finite with finite
    grads — rungs 1e1/1e3 cover everything short of overflow."""
    from doubly_stochastic_dgp_tpu.ops.linalg import (
        safe_cholesky_ladder, safe_cholesky_ladder_inv)

    rng = np.random.RandomState(7)
    A = rng.randn(6, 6)
    K0 = A @ A.T + np.eye(6)
    w, V = np.linalg.eigh(K0)
    w[0] = -3.0 * np.mean(np.diag(K0))       # far beyond the 1.0 rung
    K = jnp.asarray(V @ np.diag(w) @ V.T)
    assert np.any(np.isnan(np.asarray(jnp.linalg.cholesky(K))))

    def f(K):
        L = safe_cholesky_ladder(K)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L)

    v, g = jax.value_and_grad(f)(K)
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))

    def fi(K):
        L, Li = safe_cholesky_ladder_inv(K)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(Li)

    v, g = jax.value_and_grad(fi)(K)
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
