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
