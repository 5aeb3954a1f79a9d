"""Numerics core: jittered Cholesky, triangular solves, Gaussian KL, MVN
log-density and the reparameterization trick.

Rebuilds the math the reference gets from TF ops + hand-rolled code:
  - ``reparameterize`` (/root/reference/doubly_stochastic_dgp/utils.py:22-51)
  - white/non-white Gaussian KL (layers.py:221-246)
  - MVN logpdf via ``gpflow.logdensities.multivariate_normal`` (layers.py:342)

TPU-first choices: all batched small-matrix ops are expressed with
``vmap``/``einsum`` so XLA tiles them onto the MXU; the hot triangular
solve can be swapped for a once-per-step triangular inverse + matmul
(``solve_mode='inverse'`` in config) which is much faster on TPU where
sequential back-substitution underutilizes the systolic array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..config import default_jitter

__all__ = [
    "add_jitter",
    "safe_cholesky",
    "safe_cholesky_inv",
    "safe_cholesky_ladder",
    "safe_cholesky_ladder_inv",
    "tri_solve",
    "inv_lower",
    "reparameterize",
    "gauss_kl_white",
    "gauss_kl_nonwhite",
    "mvn_logpdf",
]


def add_jitter(K, jitter=None):
    """K + jitter * I on the last two dims."""
    jitter = default_jitter() if jitter is None else jitter
    M = K.shape[-1]
    return K + jitter * jnp.eye(M, dtype=K.dtype)


def _phi(X):
    """Lower triangle with the diagonal halved — the projection operator
    in the Cholesky reverse-mode rule (Murray 2016, eq. 8)."""
    d = jnp.diagonal(X, axis1=-2, axis2=-1)
    I = jnp.eye(X.shape[-1], dtype=X.dtype)
    return jnp.tril(X, -1) + 0.5 * d[..., :, None] * I


def _chol_pullback(L, gL):
    """Reverse-mode rule for L = cholesky(A), A symmetric (Murray 2016):

        gA = 0.5 (Li^T phi(L^T gL) Li + transpose)

    Returned symmetrized: for any K produced by a symmetric expression
    (kernel grams, S = q_sqrt q_sqrt^T) the downstream cotangents agree
    exactly with the native XLA Cholesky VJP (which puts all mass in the
    lower triangle) because <g, dK> matches for every symmetric dK.
    Runs at HIGHEST matmul precision: these are three M x M matmuls on
    the hyperparameter gradient path (cancellation-sensitive, trivial
    flops next to the N-batch work)."""
    HI = jax.lax.Precision.HIGHEST
    gL = jnp.tril(gL)          # the strictly-upper output is constant 0
    mid = _phi(jnp.einsum("...ki,...kj->...ij", L, gL, precision=HI))
    Li = inv_lower(L)
    t = jnp.einsum("...ki,...kj->...ij", Li, mid, precision=HI)
    gA = jnp.einsum("...ik,...kj->...ij", t, Li, precision=HI)
    return 0.5 * (gA + jnp.swapaxes(gA, -1, -2))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _cholesky_rungs(K, jitters, relative):
    """Shared rung-escalation Cholesky behind both public entry points.

    ONE live factorization at the first rung; every later rung sits
    behind a ``lax.cond`` that fires only when the first factor is
    non-finite, with per-batch-element rung selection inside the
    branch.  ``relative=True`` scales the rung jitters by the mean
    diagonal of K (the ladder's garbage-scales-with-the-matrix policy);
    ``relative=False`` uses them as absolute jitters.  A first rung of
    exactly 0.0 is a no-add so the healthy path is bitwise
    ``jnp.linalg.cholesky(K)``.  The backward pass is the closed-form
    Cholesky pullback on the *selected* factor — no NaN factor ever
    sits on the autodiff path (see the callers' docstrings)."""
    return _cholesky_rungs_fwd(K, jitters, relative)[0]


def _rungs_select(K, jitters, relative):
    """The shared forward rung selection: one live factorization, a
    ``lax.cond``-gated escalation ladder (see ``_cholesky_rungs``)."""
    M = K.shape[-1]
    I = jnp.eye(M, dtype=K.dtype)
    if relative:
        scale = jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1),
                         axis=-1)[..., None, None]              # (..., 1, 1)
    else:
        scale = jnp.ones((), dtype=K.dtype)
    K0 = K if jitters[0] == 0.0 else K + (jitters[0] * scale) * I
    L0 = jnp.linalg.cholesky(K0)
    all_ok = jnp.logical_not(jnp.any(jnp.isnan(L0)))

    def no_escalation(_):
        return L0

    def escalate(_):
        def ok(L):
            return jnp.logical_not(
                jnp.any(jnp.isnan(L), axis=(-2, -1)))[..., None, None]
        Ls = [L0] + [jnp.linalg.cholesky(K + (j * scale) * I)
                     for j in jitters[1:]]
        sel = Ls[-1]
        for L_ in reversed(Ls[:-1]):
            sel = jnp.where(ok(L_), L_, sel)
        return sel

    return jax.lax.cond(all_ok, no_escalation, escalate, None)


def _cholesky_rungs_fwd(K, jitters, relative):
    L = _rungs_select(K, jitters, relative)
    return L, L


def _cholesky_rungs_bwd(jitters, relative, L, gL):
    return (_chol_pullback(L, gL),)


_cholesky_rungs.defvjp(_cholesky_rungs_fwd, _cholesky_rungs_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _cholesky_rungs_inv(K, jitters, relative):
    """Fused rung-escalation Cholesky + triangular inverse: one
    custom_vjp region producing ``(L, Li = L^{-1})``.

    Round-4 perf lever (round-3 VERDICT next #5a): the staged-inverse
    paths always consume ``inv_lower(safe_cholesky(K))`` as a unit, and
    differentiating the unfused composition puts TWO more sequential
    triangular solves on the backward pass (the ``triangular_solve``
    transpose rule, plus the Cholesky pullback's own ``inv_lower``).
    Fusing makes ``Li`` a saved residual, so the whole backward is
    closed-form MXU matmuls:

        d(Li) = -Li dL Li          =>  gL += tril(-Li^T gLi Li^T)
        gK    = 0.5 (Li^T phi(L^T gL) Li + transpose)   (Murray 2016)

    — zero triangular solves on the autodiff path.  Forward values are
    bitwise identical to the unfused composition; gradients are the
    same math through a different (solve-free) evaluation.  All
    pullback matmuls run at HIGHEST precision (hyperparameter-gradient
    path; trivial flops next to the batch work)."""
    return _cholesky_rungs_inv_fwd(K, jitters, relative)[0]


def _cholesky_rungs_inv_fwd(K, jitters, relative):
    L = _rungs_select(K, jitters, relative)
    Li = inv_lower(L)
    return (L, Li), (L, Li)


def _cholesky_rungs_inv_bwd(jitters, relative, res, g):
    L, Li = res
    gL, gLi = g
    HI = jax.lax.Precision.HIGHEST
    gL = jnp.tril(gL)
    # inverse pullback: <gLi, -Li dL Li> = <tril(-Li^T gLi Li^T), dL>
    t = jnp.einsum("...ki,...kj->...ij", Li, jnp.tril(gLi), precision=HI)
    gL = gL - jnp.tril(
        jnp.einsum("...ik,...jk->...ij", t, Li, precision=HI))
    # Cholesky pullback on the saved factor, reusing the saved inverse
    mid = _phi(jnp.einsum("...ki,...kj->...ij", L, gL, precision=HI))
    t2 = jnp.einsum("...ki,...kj->...ij", Li, mid, precision=HI)
    gA = jnp.einsum("...ik,...kj->...ij", t2, Li, precision=HI)
    return (0.5 * (gA + jnp.swapaxes(gA, -1, -2)),)


_cholesky_rungs_inv.defvjp(_cholesky_rungs_inv_fwd, _cholesky_rungs_inv_bwd)


def safe_cholesky(K, jitter=None):
    """Cholesky of K + jitter*I with jitter escalation on failure.

    In float32 the M x M kernel gram can be ill-conditioned enough
    (long lengthscales -> near-all-ones K) that the base jitter fails;
    instead of NaN-ing the whole training step, escalate to 100x and
    10000x jitter.

    ONE factorization on the healthy path (round-3 perf fix): the live
    ``cholesky(K + jitter*I)`` runs unconditionally and escalation sits
    behind a ``lax.cond`` that fires only when the factor is non-finite
    — the M=512 scan profile measured the previous always-on
    stop-gradient probe design at 0.30 ms/app vs 0.08 ms for a raw
    Cholesky, ~1/3 of the whole large_M training step (PERF.md round-3).
    Worst case (escalation firing) is 3 factorizations, exactly the old
    cost; per-batch-element rung selection is preserved inside the
    escalation branch.

    Grad-safety: the whole selection is wrapped in a ``custom_vjp``
    whose backward pass is the closed-form Cholesky pullback evaluated
    on the *selected* (finite) factor — no NaN factor ever sits on the
    autodiff path, so the where-NaN trap the old probe design defended
    against cannot occur by construction.  Batched over leading dims.
    """
    j0 = float(default_jitter() if jitter is None else jitter)
    return _cholesky_rungs(K, (j0, 1e2 * j0, 1e4 * j0), False)


def safe_cholesky_ladder(K, jitters=(0.0, 1e-7, 1e-5, 1e-3, 1e-1, 1.0,
                                     1e1, 1e3)):
    """Grad-safe Cholesky with a *relative* jitter ladder.

    For matrices that are PSD *by construction* (e.g. the Titsias
    B = I + AA^T) where any failure is pure floating-point garbage: the
    first rung is 0.0, so whenever the plain factorization succeeds the
    result is bitwise identical to ``jnp.linalg.cholesky(K)`` — no bias
    in the float64 parity paths.  Nonzero rungs are scaled by the mean
    diagonal of K, because the garbage scales with the matrix (measured
    on TPU: B entries grow like 1/sigma^2 as the likelihood variance is
    learned small, and f32 rounding garbage grows with them — an
    absolute ladder tops out).  Rung selection uses stop-gradient probe
    factorizations and the live K is factorized exactly once (same
    grad-safety argument as :func:`safe_cholesky`).

    The deep top rungs (1e-1 .. 1e3) are the NaN net for the collapsed
    bound's B = AAT + I: jitter on B only grows log|B| (and shrinks
    ||c||^2), which *lowers* the bound — the conservative, valid side —
    so a large rung beats a NaN whenever f32 garbage in AAT exceeds the
    polite jitters (measured: an indefinite psi2 at bf16-class matmul
    precision reached eigenvalue -1e4 in B; see psi_statistics).
    Round-4 extension to 1e1/1e3: at the compute-bound damianou_large
    config (N~7400, M=256, sigma^2=0.05, hidden width 2) the f32 psi2
    rounding deficit (~3e-6 relative) amplified by ||Kuu^{-1}||/sigma^2
    puts eigenvalue content ~ -5e3 in AAT — past the 1.0-relative rung
    — and whether chol(B + mean-diag I) squeaked through became a coin
    flip on psi2's last ulp (measured: the XLA and hybrid psi2 routes,
    identical to 3e-6, landed on opposite sides).  The deeper rungs
    make the net cover everything short of overflow; they cost nothing
    until the lax.cond escalation branch actually fires.

    Like :func:`safe_cholesky` (round-3 perf fix), the healthy path is
    ONE factorization: the first rung runs live and the rest of the
    ladder sits behind a ``lax.cond`` that fires only on a non-finite
    factor; grad-safety comes from the shared ``custom_vjp`` Cholesky
    pullback on the selected factor rather than stop-gradient probes."""
    return _cholesky_rungs(K, tuple(float(j) for j in jitters), True)


def safe_cholesky_inv(K, jitter=None):
    """``(safe_cholesky(K), inv_lower(L))`` as ONE custom_vjp region.

    Same rung policy as :func:`safe_cholesky`; forward bitwise
    identical to the unfused composition.  Use wherever the factor and
    its inverse are consumed together on a gradient path (the staged-
    inverse conditionals): the fused backward is matmul-only — no
    sequential triangular solves — see ``_cholesky_rungs_inv``."""
    j0 = float(default_jitter() if jitter is None else jitter)
    return _cholesky_rungs_inv(K, (j0, 1e2 * j0, 1e4 * j0), False)


def safe_cholesky_ladder_inv(K, jitters=(0.0, 1e-7, 1e-5, 1e-3, 1e-1,
                                         1.0, 1e1, 1e3)):
    """``(safe_cholesky_ladder(K), inv_lower(L))`` as one custom_vjp
    region — the fused variant of :func:`safe_cholesky_ladder` for the
    collapsed bound's B factorization in inverse solve mode (same
    relative rung policy; matmul-only backward)."""
    return _cholesky_rungs_inv(K, tuple(float(j) for j in jitters), True)


def inv_lower(L):
    """Inverse of a lower-triangular matrix (batched over leading dims)."""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    if L.ndim == 2:
        return solve_triangular(L, eye, lower=True)
    return jax.vmap(lambda l: solve_triangular(l, eye, lower=True))(L)


def tri_solve(L, B, lower=True, trans=False, mode="solve", Li=None):
    """Solve op(L) X = B for triangular L with an explicit strategy.

    ``mode='solve'`` is the reference triangular back-substitution.
    In ``mode='inverse'`` the triangular inverse is formed once (cheap
    M x M work) and applied as a matmul — on TPU this keeps the large
    (M, S*N) operand on the MXU instead of in a sequential
    back-substitution loop.  The mode is an explicit argument (layers
    pass their static ``solve_mode`` field) so jitted callers never read
    mutable global config at trace time.

    ``Li`` (inverse mode only, requires ``lower=True``): a precomputed
    lower-triangular inverse of L — pass the second output of
    :func:`safe_cholesky_inv` so repeated solves against one factor
    share the fused factor+inverse region (matmul-only backward).
    """
    if mode == "inverse":
        if Li is None:
            Li = inv_lower(L) if lower else inv_lower(L.T).T
        elif not lower:
            raise ValueError("tri_solve(Li=...) requires lower=True")
        op = Li.T if trans else Li
        return op @ B
    return solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


def reparameterize(mean, var, z, full_cov=False, jitter=None):
    """Gaussian reparameterization trick (matches reference utils.py:22-51).

    mean: (S, N, D); var: (S, N, D) or (S, N, N, D) when full_cov;
    z: (S, N, D) unit normals.  var=None returns mean (deterministic).
    ``jitter=None`` reads the global config at trace time (convenience);
    layers pass their static jitter field explicitly.
    """
    if var is None:
        return mean
    jitter = default_jitter() if jitter is None else jitter
    if not full_cov:
        # clamp: float32 cancellation in Kff - Qff can leave var a hair
        # negative; the reference relies on float64 + jitter alone
        return mean + z * jnp.sqrt(jnp.maximum(var, 0.0) + jitter)
    # full covariance: var is (S, N, N, D); batch the N x N Cholesky over
    # (S, D) — D-major layout so XLA sees a clean batched decomposition.
    mean_sdn = jnp.swapaxes(mean, 1, 2)              # (S, D, N)
    var_sdnn = jnp.transpose(var, (0, 3, 1, 2))      # (S, D, N, N)
    N = mean.shape[1]
    I = jitter * jnp.eye(N, dtype=mean.dtype)
    chol = jnp.linalg.cholesky(var_sdnn + I)         # (S, D, N, N)
    z_sdn = jnp.swapaxes(z, 1, 2)                    # (S, D, N)
    f = mean_sdn + jnp.einsum("sdnm,sdm->sdn", chol, z_sdn)
    return jnp.swapaxes(f, 1, 2)                     # (S, N, D)


def gauss_kl_white(q_mu, q_sqrt):
    """KL( N(q_mu, L L^T) || N(0, I) ), summed over output dims.

    q_mu: (M, D); q_sqrt: (D, M, M) lower-triangular.
    Matches reference layers.py:221-246 (white branch).
    """
    M, D = q_mu.shape
    diag = jnp.diagonal(q_sqrt, axis1=-2, axis2=-1)
    kl = -0.5 * D * M
    kl -= 0.5 * jnp.sum(jnp.log(diag ** 2))
    kl += 0.5 * jnp.sum(q_sqrt ** 2)
    kl += 0.5 * jnp.sum(q_mu ** 2)
    return kl


def gauss_kl_nonwhite(q_mu, q_sqrt, Lu):
    """KL( N(q_mu, L L^T) || N(0, Ku) ) with Ku = Lu Lu^T.

    q_mu: (M, D); q_sqrt: (D, M, M); Lu: (M, M) lower Cholesky of the
    prior.  Matches reference layers.py:237-241.
    """
    M, D = q_mu.shape
    diag = jnp.diagonal(q_sqrt, axis1=-2, axis2=-1)
    kl = -0.5 * D * M
    kl -= 0.5 * jnp.sum(jnp.log(diag ** 2))
    kl += D * jnp.sum(jnp.log(jnp.diagonal(Lu)))
    # trace term: || Lu^{-1} q_sqrt ||_F^2, batched over D
    LiQ = jax.vmap(lambda q: solve_triangular(Lu, q, lower=True))(q_sqrt)
    kl += 0.5 * jnp.sum(LiQ ** 2)
    # Mahalanobis term: q_mu^T Ku^{-1} q_mu
    Li_m = solve_triangular(Lu, q_mu, lower=True)
    kl += 0.5 * jnp.sum(Li_m ** 2)
    return kl


def mvn_logpdf(Y, mu, L):
    """Columnwise multivariate-normal log-density.

    Y, mu: (N, D) — each column of Y is an independent draw from
    N(mu[:, d], L L^T).  Returns (D,) log densities, matching
    gpflow.logdensities.multivariate_normal used at reference
    layers.py:342.
    """
    N = Y.shape[0]
    d = Y - mu
    alpha = solve_triangular(L, d, lower=True)            # (N, D)
    num_dims = jnp.asarray(N, dtype=Y.dtype)
    p = -0.5 * jnp.sum(alpha ** 2, axis=0)
    p -= 0.5 * num_dims * jnp.log(2 * jnp.pi)
    p -= jnp.sum(jnp.log(jnp.diagonal(L)))
    return p
