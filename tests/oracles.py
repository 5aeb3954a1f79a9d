"""Independent numpy oracles for the GP math, used the way the reference
tests use GPflow models as oracles (SURVEY §4): plain-numpy single-layer
SVGP conditionals/ELBO, exact GPR, and the Titsias collapsed bound."""

import numpy as np
from scipy.linalg import cho_solve, solve_triangular


def np_rbf(X, Z, variance, lengthscales):
    d = (X[:, None, :] - Z[None, :, :]) / lengthscales
    return variance * np.exp(-0.5 * np.sum(d ** 2, -1))


def np_matern52(X, Z, variance, lengthscales):
    d = (X[:, None, :] - Z[None, :, :]) / lengthscales
    r2 = np.sum(d ** 2, -1)
    r = np.sqrt(np.maximum(r2, 1e-36))
    s5 = np.sqrt(5.0)
    return variance * (1 + s5 * r + 5 / 3 * r2) * np.exp(-s5 * r)


class NpSVGP:
    """Single-layer sparse variational GP, numpy implementation.

    Matches the math of reference layers.py:178-246 (and GPflow SVGP).
    """

    def __init__(self, kern_fn, Z, q_mu, q_sqrt, white, jitter=1e-18,
                 mean_fn=None):
        self.kern_fn = kern_fn
        self.Z = Z
        self.q_mu = q_mu          # (M, D)
        self.q_sqrt = q_sqrt      # (D, M, M) lower
        self.white = white
        self.jitter = jitter
        self.mean_fn = mean_fn or (lambda X: 0.0)
        M = Z.shape[0]
        self.Kuu = kern_fn(Z, Z) + np.eye(M) * jitter
        self.Lu = np.linalg.cholesky(self.Kuu)

    def conditional(self, X, full_cov=False):
        M, D = self.q_mu.shape
        Kuf = self.kern_fn(self.Z, X)
        A = solve_triangular(self.Lu, Kuf, lower=True)
        if not self.white:
            A = solve_triangular(self.Lu.T, A, lower=False)
        mean = A.T @ self.q_mu + self.mean_fn(X)
        SK = -np.eye(M)[None] if self.white else -self.Kuu[None]
        SK = SK + np.einsum("dij,dkj->dik", self.q_sqrt, self.q_sqrt)
        B = np.einsum("dij,jb->dib", SK, A)
        if full_cov:
            delta = np.einsum("ib,dic->dbc", A, B)
            Kff = self.kern_fn(X, X)
            var = np.transpose(Kff[None] + delta, (1, 2, 0))
        else:
            delta = np.einsum("ib,dib->db", A, B)
            Kff = np.diag(self.kern_fn(X, X))
            var = (Kff[None] + delta).T
        return mean, var

    def kl(self):
        M, D = self.q_mu.shape
        kl = -0.5 * D * M
        kl -= 0.5 * np.sum(np.log(np.diagonal(self.q_sqrt,
                                              axis1=-2, axis2=-1) ** 2))
        if self.white:
            kl += 0.5 * np.sum(self.q_sqrt ** 2)
            kl += 0.5 * np.sum(self.q_mu ** 2)
        else:
            kl += D * np.sum(np.log(np.diag(self.Lu)))
            for d in range(D):
                LiQ = solve_triangular(self.Lu, self.q_sqrt[d], lower=True)
                kl += 0.5 * np.sum(LiQ ** 2)
            Kinv_m = cho_solve((self.Lu, True), self.q_mu)
            kl += 0.5 * np.sum(self.q_mu * Kinv_m)
        return kl

    def elbo(self, X, Y, varexp_fn):
        """varexp_fn(Fmu, Fvar, Y) -> (N, D) elementwise expectations."""
        mean, var = self.conditional(X)
        return np.sum(varexp_fn(mean, var, Y)) - self.kl()


def np_gpr_marginal(K, Y, lik_var):
    """Exact GP log marginal likelihood, summed over output columns."""
    N = K.shape[0]
    Ky = K + np.eye(N) * lik_var
    L = np.linalg.cholesky(Ky)
    alpha = solve_triangular(L, Y, lower=True)
    out = -0.5 * np.sum(alpha ** 2)
    out -= Y.shape[1] * np.sum(np.log(np.diag(L)))
    out -= 0.5 * Y.size * np.log(2 * np.pi)
    return out


def np_gpr_predict(kern_fn, X, Y, Xs, lik_var, full_cov=False):
    K = kern_fn(X, X) + np.eye(X.shape[0]) * lik_var
    L = np.linalg.cholesky(K)
    Kx = kern_fn(X, Xs)
    A = solve_triangular(L, Kx, lower=True)
    V = solve_triangular(L, Y, lower=True)
    mean = A.T @ V
    if full_cov:
        var = kern_fn(Xs, Xs) - A.T @ A
    else:
        var = np.diag(kern_fn(Xs, Xs)) - np.sum(A ** 2, axis=0)
    return mean, var


def np_sgpr_bound(kern_fn, kdiag_fn, X, Y, Z, lik_var, jitter=1e-12):
    """Titsias collapsed bound (reference layers.py:371-402)."""
    M = Z.shape[0]
    N, D = Y.shape
    Kuf = kern_fn(Z, X)
    Kuu = kern_fn(Z, Z) + np.eye(M) * jitter
    L = np.linalg.cholesky(Kuu)
    sigma = np.sqrt(lik_var)
    A = solve_triangular(L, Kuf, lower=True) / sigma
    AAT = A @ A.T
    B = AAT + np.eye(M)
    LB = np.linalg.cholesky(B)
    Aerr = A @ Y
    c = solve_triangular(LB, Aerr, lower=True) / sigma
    bound = -0.5 * N * D * np.log(2 * np.pi)
    bound -= D * np.sum(np.log(np.diag(LB)))
    bound -= 0.5 * N * D * np.log(lik_var)
    bound += -0.5 * np.sum(Y ** 2) / lik_var
    bound += 0.5 * np.sum(c ** 2)
    bound += -0.5 * D * np.sum(kdiag_fn(X)) / lik_var
    bound += 0.5 * D * np.trace(AAT)
    return bound
