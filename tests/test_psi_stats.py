"""Psi-statistics tests: closed forms vs brute-force Gauss-Hermite
quadrature over the input distribution (the independent oracle for the
uncertain-input SGPR path, reference layers.py:405-450)."""

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.ops.kernels import RBF, Sum, White
from doubly_stochastic_dgp_tpu.ops.psi_stats import psi_statistics


def _np_rbf(x, Z, var, ls):
    d = (x[None, :] - Z) / ls
    return var * np.exp(-0.5 * np.sum(d ** 2, -1))


def _quad_psi_fn(kfn, mu, S, Z, H=40):
    """Brute-force psi statistics by GH quadrature over each x_n, for an
    arbitrary numpy kernel-row function kfn(x) -> (M,)."""
    from itertools import product
    gh_x, gh_w = np.polynomial.hermite.hermgauss(H)
    N, D = mu.shape
    M = Z.shape[0]
    psi1 = np.zeros((N, M))
    psi2 = np.zeros((M, M))
    # quadrature grid per dim (use product over D dims)
    for n in range(N):
        p1 = np.zeros(M)
        p2 = np.zeros((M, M))
        for idx in product(range(H), repeat=D):
            w = np.prod([gh_w[i] for i in idx]) / np.pi ** (D / 2)
            x = mu[n] + np.sqrt(2.0 * S[n]) * np.array(
                [gh_x[i] for i in idx])
            k = kfn(x)
            p1 += w * k
            p2 += w * np.outer(k, k)
        psi1[n] = p1
        psi2 += p2
    return psi1, psi2


def _quad_psi(var, ls, mu, S, Z, H=40):
    return _quad_psi_fn(lambda x: _np_rbf(x, Z, var, ls), mu, S, Z, H)


def test_rbf_psi_vs_quadrature():
    np.random.seed(0)
    N, D, M = 3, 2, 4
    mu = np.random.randn(N, D) * 0.5
    S = 0.05 + np.random.rand(N, D) * 0.3
    Z = np.random.randn(M, D)
    var, ls = 1.7, np.array([0.6, 1.1])

    k = RBF.make(D, variance=var, lengthscales=ls)
    psi0, psi1, psi2 = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                                      jnp.asarray(Z))
    q1, q2 = _quad_psi(var, ls, mu, S, Z)

    assert_allclose(np.asarray(psi0), np.full(N, var), rtol=1e-12)
    assert_allclose(np.asarray(psi1), q1, rtol=1e-6, atol=1e-8)
    assert_allclose(np.asarray(psi2), q2, rtol=1e-6, atol=1e-8)


def test_zero_variance_reduces_to_kernel():
    """S -> 0: psi1 -> K(mu, Z), psi2 -> sum_n Kzx Kxz."""
    np.random.seed(1)
    N, D, M = 4, 2, 3
    mu = np.random.randn(N, D)
    S = np.zeros((N, D))
    Z = np.random.randn(M, D)
    k = RBF.make(D, variance=2.0, lengthscales=0.8)
    psi0, psi1, psi2 = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                                      jnp.asarray(Z))
    K = np.asarray(k.K(jnp.asarray(mu), jnp.asarray(Z)))
    assert_allclose(np.asarray(psi1), K, rtol=1e-10)
    assert_allclose(np.asarray(psi2), K.T @ K, rtol=1e-10)


def test_sum_of_two_rbfs_cross_terms_vs_quadrature():
    """Sum of two RBF components with different ARD lengthscales: psi2
    includes the cross second moments E[k1(x,z)k2(x,z')] (reference gets
    these from gpflow.expectations at layers.py:417; VERDICT round-1
    missing #2)."""
    np.random.seed(3)
    N, D, M = 3, 2, 4
    mu = np.random.randn(N, D) * 0.4
    S = 0.05 + np.random.rand(N, D) * 0.2
    Z = np.random.randn(M, D)
    v1, ls1 = 1.3, np.array([0.6, 1.2])
    v2, ls2 = 0.7, np.array([1.5, 0.5])

    k = (RBF.make(D, variance=v1, lengthscales=ls1)
         + RBF.make(D, variance=v2, lengthscales=ls2))
    psi0, psi1, psi2 = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                                      jnp.asarray(Z))
    q1, q2 = _quad_psi_fn(
        lambda x: _np_rbf(x, Z, v1, ls1) + _np_rbf(x, Z, v2, ls2),
        mu, S, Z)

    assert_allclose(np.asarray(psi0), np.full(N, v1 + v2), rtol=1e-12)
    assert_allclose(np.asarray(psi1), q1, rtol=1e-6, atol=1e-8)
    assert_allclose(np.asarray(psi2), q2, rtol=1e-6, atol=1e-8)
    # psi2 stays symmetric with the cross terms included
    assert_allclose(np.asarray(psi2), np.asarray(psi2).T, rtol=1e-12)


def test_sum_with_white():
    np.random.seed(2)
    N, D, M = 3, 2, 3
    mu = np.random.randn(N, D)
    S = 0.1 + np.random.rand(N, D) * 0.1
    Z = np.random.randn(M, D)
    rbf = RBF.make(D, variance=1.5, lengthscales=0.7)
    k = rbf + White.make(D, variance=0.01)
    psi0, psi1, psi2 = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                                      jnp.asarray(Z))
    p0r, p1r, p2r = psi_statistics(rbf, jnp.asarray(mu), jnp.asarray(S),
                                   jnp.asarray(Z))
    assert_allclose(np.asarray(psi0), np.asarray(p0r) + 0.01, rtol=1e-12)
    assert_allclose(np.asarray(psi1), np.asarray(p1r), rtol=1e-12)
    assert_allclose(np.asarray(psi2), np.asarray(p2r), rtol=1e-12)


def test_psi2_blocked_equals_unblocked():
    """The lax.scan row-blocked psi2 accumulation must match the
    single-slab path exactly (block size forced below N)."""
    import doubly_stochastic_dgp_tpu.ops.psi_stats as ps

    rng = np.random.RandomState(7)
    N, D, M = 37, 3, 5
    mu = jnp.asarray(rng.randn(N, D))
    S = jnp.asarray(rng.rand(N, D) * 0.3 + 0.05)
    Z = jnp.asarray(rng.randn(M, D))
    kern = RBF.make(D, variance=1.3, lengthscales=rng.rand(D) + 0.5)
    p0a, p1a, p2a = ps.psi_statistics(kern, mu, S, Z)
    old = ps.PSI2_BLOCK_ROWS
    try:
        ps.PSI2_BLOCK_ROWS = 8            # forces 5 blocks + padding
        p0b, p1b, p2b = ps.psi_statistics(kern, mu, S, Z)
    finally:
        ps.PSI2_BLOCK_ROWS = old
    np.testing.assert_allclose(np.asarray(p2a), np.asarray(p2b),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p0a), np.asarray(p0b))
    np.testing.assert_allclose(np.asarray(p1a), np.asarray(p1b))


def test_psi2_block_rows_adaptive_in_m():
    """The psi2 block size shrinks with M so the (block, M, M)
    transient stays within PSI2_BLOCK_ELEMS (round-4: the compute-bound
    collapsed shapes at M=256-512 would otherwise transiently allocate
    2-8.6 GB); the M<=100 behavior is unchanged and an explicitly tiny
    PSI2_BLOCK_ROWS (test override) still wins."""
    import doubly_stochastic_dgp_tpu.ops.psi_stats as ps

    assert ps._psi2_block_rows(100) == ps.PSI2_BLOCK_ROWS
    for M in (256, 512):
        b = ps._psi2_block_rows(M)
        assert 128 <= b < ps.PSI2_BLOCK_ROWS
        assert b * M * M <= ps.PSI2_BLOCK_ELEMS
    old = ps.PSI2_BLOCK_ROWS
    try:
        ps.PSI2_BLOCK_ROWS = 8
        assert ps._psi2_block_rows(512) == 8
    finally:
        ps.PSI2_BLOCK_ROWS = old

    # equality at a shape where the element budget (not the row cap)
    # sets the block: N=300 rows at M forced so block < N
    rng = np.random.RandomState(3)
    N, D, M = 300, 2, 7
    mu = jnp.asarray(rng.randn(N, D))
    S = jnp.asarray(rng.rand(N, D) * 0.3 + 0.05)
    Z = jnp.asarray(rng.randn(M, D))
    kern = RBF.make(D, variance=0.8, lengthscales=1.1)
    p0a, p1a, p2a = ps.psi_statistics(kern, mu, S, Z)
    old_elems = ps.PSI2_BLOCK_ELEMS
    try:
        ps.PSI2_BLOCK_ELEMS = 128 * M * M     # block == 128 < N
        assert ps._psi2_block_rows(M) == 128
        p0b, p1b, p2b = ps.psi_statistics(kern, mu, S, Z)
    finally:
        ps.PSI2_BLOCK_ELEMS = old_elems
    np.testing.assert_allclose(np.asarray(p2a), np.asarray(p2b),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p1a), np.asarray(p1b))


def test_rank_separated_psi1_clamped_at_f32_cancellation():
    """The rank-separated psi1 quadratic (mu^2 - 2 mu z + z^2 form) is
    exact math <= 0; in float32 with mu == z at large coordinates the
    expansion cancels catastrophically and could go positive without
    the clamp, pushing psi1 above its analytic ceiling
    var * prod(1 + S/ls2)^(-1/2).  Pin psi1 <= ceiling (1 ulp slack)."""
    import jax

    with jax.enable_x64(False):
        N, D = 4, 3
        big = np.float32(3000.0)
        mu = np.full((N, D), big, dtype=np.float32)
        mu += np.arange(N, dtype=np.float32)[:, None] * 0.25
        Z = mu.copy()                       # z_m == mu_n rows exactly
        S = np.full((N, D), 1e-4, dtype=np.float32)
        ls = np.array([0.3, 0.7, 1.3], dtype=np.float32)
        var = 1.9
        k = RBF.make(D, variance=var, lengthscales=ls)
        psi0, psi1, psi2 = psi_statistics(
            k, jnp.asarray(mu, jnp.float32), jnp.asarray(S, jnp.float32),
            jnp.asarray(Z, jnp.float32))
        assert psi1.dtype == jnp.float32
        ceiling = var * np.prod(
            (1.0 + S / ls.astype(np.float64) ** 2) ** -0.5, axis=-1)
        assert np.all(np.asarray(psi1) <= ceiling[:, None] * (1 + 1e-6))
        # the diagonal (mu_n == z_n) actually sits AT the ceiling
        assert_allclose(np.asarray(psi1).diagonal(),
                        ceiling[: min(N, Z.shape[0])], rtol=1e-5)
        assert np.all(np.isfinite(np.asarray(psi2)))


def test_linear_psi_vs_quadrature():
    """Linear-kernel psi statistics vs the brute-force GH oracle."""
    from doubly_stochastic_dgp_tpu.ops.kernels import Linear

    np.random.seed(2)
    N, D, M = 3, 2, 4
    mu = np.random.randn(N, D) * 0.7
    S = 0.05 + np.random.rand(N, D) * 0.4
    Z = np.random.randn(M, D)
    v = np.array([0.8, 1.4])

    k = Linear.make(D, variance=v, ard=True)
    psi0, psi1, psi2 = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                                      jnp.asarray(Z))
    q1, q2 = _quad_psi_fn(lambda x: (x * v) @ Z.T, mu, S, Z, H=40)

    expect_psi0 = np.sum(v * (mu ** 2 + S), axis=-1)
    assert_allclose(np.asarray(psi0), expect_psi0, rtol=1e-10)
    assert_allclose(np.asarray(psi1), q1, rtol=1e-8, atol=1e-10)
    assert_allclose(np.asarray(psi2), q2, rtol=1e-7, atol=1e-8)


def test_sum_rbf_linear_white_cross_terms_vs_quadrature():
    """Sum(RBF, Linear, White): psi2 needs the RBF-Linear cross term
    (reference gets it from gpflow.expectations, layers.py:415-417).
    White adds to psi0 only; the GH oracle integrates the RBF+Linear
    part of the sum directly."""
    from doubly_stochastic_dgp_tpu.ops.kernels import Linear

    np.random.seed(3)
    N, D, M = 3, 2, 4
    mu = np.random.randn(N, D) * 0.6
    S = 0.05 + np.random.rand(N, D) * 0.3
    Z = np.random.randn(M, D)
    var_r, ls = 1.3, np.array([0.7, 1.2])
    v_lin = np.array([0.9, 0.5])
    white_var = 0.17

    k = (RBF.make(D, variance=var_r, lengthscales=ls)
         + Linear.make(D, variance=v_lin, ard=True)
         + White.make(D, variance=white_var))
    psi0, psi1, psi2 = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                                      jnp.asarray(Z))

    def krow(x):
        return _np_rbf(x, Z, var_r, ls) + (x * v_lin) @ Z.T

    q1, q2 = _quad_psi_fn(krow, mu, S, Z, H=40)
    expect_psi0 = (np.full(N, var_r) + np.sum(v_lin * (mu ** 2 + S), -1)
                   + white_var)
    assert_allclose(np.asarray(psi0), expect_psi0, rtol=1e-10)
    assert_allclose(np.asarray(psi1), q1, rtol=1e-6, atol=1e-8)
    assert_allclose(np.asarray(psi2), q2, rtol=1e-6, atol=1e-8)


def test_sum_of_two_linears_cross_terms_vs_quadrature():
    from doubly_stochastic_dgp_tpu.ops.kernels import Linear

    np.random.seed(4)
    N, D, M = 3, 2, 4
    mu = np.random.randn(N, D) * 0.6
    S = 0.05 + np.random.rand(N, D) * 0.3
    Z = np.random.randn(M, D)
    va = np.array([0.8, 1.4])
    vb = np.array([0.3, 0.9])

    k = (Linear.make(D, variance=va, ard=True)
         + Linear.make(D, variance=vb, ard=True))
    psi0, psi1, psi2 = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                                      jnp.asarray(Z))
    q1, q2 = _quad_psi_fn(lambda x: (x * va) @ Z.T + (x * vb) @ Z.T,
                          mu, S, Z, H=40)
    assert_allclose(np.asarray(psi1), q1, rtol=1e-8, atol=1e-10)
    assert_allclose(np.asarray(psi2), q2, rtol=1e-7, atol=1e-8)


def test_random_sum_compositions_vs_quadrature():
    """Property-style: random Sum compositions of RBF/Linear/White with
    random hyperparameters must match the brute-force GH oracle (all
    pairwise psi2 cross terms, any component order/multiplicity)."""
    from doubly_stochastic_dgp_tpu.ops.kernels import Linear

    rng = np.random.RandomState(7)
    N, D, M = 3, 2, 4
    for trial in range(4):
        mu = rng.randn(N, D) * 0.5
        S = 0.05 + rng.rand(N, D) * 0.3
        Z = rng.randn(M, D)
        parts, np_rows = [], []
        n_parts = rng.randint(2, 5)
        for _ in range(n_parts):
            kind = rng.choice(["rbf", "lin", "white"])
            if kind == "rbf":
                v = 0.3 + rng.rand() * 1.5
                ls = 0.4 + rng.rand(D) * 1.5
                parts.append(RBF.make(D, variance=v, lengthscales=ls))
                np_rows.append(
                    lambda x, v=v, ls=ls: _np_rbf(x, Z, v, ls))
            elif kind == "lin":
                w = 0.2 + rng.rand(D)
                parts.append(Linear.make(D, variance=w, ard=True))
                np_rows.append(lambda x, w=w: (x * w) @ Z.T)
            else:
                parts.append(White.make(D, variance=0.1 + rng.rand()))
                np_rows.append(lambda x: np.zeros(M))
        kern = parts[0]
        for k in parts[1:]:
            kern = kern + k

        psi0, psi1, psi2 = psi_statistics(
            kern, jnp.asarray(mu), jnp.asarray(S), jnp.asarray(Z))
        q1, q2 = _quad_psi_fn(
            lambda x: sum(f(x) for f in np_rows), mu, S, Z, H=35)
        assert_allclose(np.asarray(psi1), q1, rtol=1e-6, atol=1e-8,
                        err_msg=f"trial {trial}")
        assert_allclose(np.asarray(psi2), q2, rtol=1e-6, atol=1e-7,
                        err_msg=f"trial {trial}")
        assert_allclose(np.asarray(psi2), np.asarray(psi2).T,
                        rtol=1e-12)


def test_psi_statistics_grads_match_finite_differences():
    """FD pin for the round-3 rank-separated + centered forms: the
    stop-gradient on the inducing-cloud center is analytically exact
    ONLY because the expansion is shift invariant — a broken centering
    would leak into every gradient.  Differentiates the full
    Sum(RBF + Linear) path (all psi2 cross terms) wrt mu, S, Z and the
    kernel parameters against central finite differences (float64)."""
    import jax
    from jax.flatten_util import ravel_pytree

    from doubly_stochastic_dgp_tpu.ops.kernels import Linear

    rng = np.random.RandomState(11)
    N, D, M = 3, 2, 4
    mu = jnp.asarray(rng.randn(N, D) * 2.0)
    S = jnp.asarray(0.05 + rng.rand(N, D) * 0.4)
    Z = jnp.asarray(rng.randn(M, D))
    kern = (RBF.make(D, variance=1.4,
                     lengthscales=rng.rand(D) + 0.5)
            + Linear.make(D, variance=0.7))
    W2 = jnp.asarray(rng.randn(M, M))
    W1 = jnp.asarray(rng.randn(N, M))
    flat, unravel = ravel_pytree((kern, mu, S, Z))

    def f(v):
        k, m_, s_, z_ = unravel(v)
        p0, p1, p2 = psi_statistics(k, m_, s_, z_)
        return jnp.sum(p0) + jnp.sum(W1 * p1) + jnp.sum(W2 * p2)

    g = np.asarray(jax.grad(f)(flat))
    eps = 1e-6
    for i in range(flat.size):
        e = jnp.zeros_like(flat).at[i].set(eps)
        fd = float((f(flat + e) - f(flat - e)) / (2 * eps))
        assert abs(g[i] - fd) <= 1e-5 * max(1.0, abs(fd)), (i, g[i], fd)


def test_psi_statistics_shift_invariance_rbf():
    """The centered expansions' design invariant (round-3): translating
    mu and Z together leaves every RBF psi statistic unchanged.  The
    center (stop-gradient mean(Z)) tracks the translation, so the
    separated quadratics see identical relative coordinates up to
    rounding of the shift itself."""
    rng = np.random.RandomState(5)
    N, D, M = 4, 3, 5
    mu = rng.randn(N, D)
    S = 0.05 + rng.rand(N, D) * 0.3
    Z = rng.randn(M, D)
    k = RBF.make(D, variance=1.6, lengthscales=rng.rand(D) + 0.4)
    base = psi_statistics(k, jnp.asarray(mu), jnp.asarray(S),
                          jnp.asarray(Z))
    c = np.full((1, D), 4096.0)            # exact in binary -> bitwise adds
    shifted = psi_statistics(k, jnp.asarray(mu + c), jnp.asarray(S),
                             jnp.asarray(Z + c))
    for a, b in zip(base, shifted):
        assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9,
                        atol=1e-12)
