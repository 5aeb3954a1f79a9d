"""Closed-form kernel expectations (psi statistics) for RBF kernels under
diagonal-Gaussian inputs.

Rebuilds the ``gpflow.expectations.expectation(DiagonalGaussian, ...)``
calls the reference's uncertain-input SGPR path consumes
(/root/reference/doubly_stochastic_dgp/layers.py:405-450,483-525):

  psi0[n]      = E_{x_n}[ k(x_n, x_n) ]
  psi1[n, m]   = E_{x_n}[ k(x_n, z_m) ]
  psi2[m, m']  = sum_n E_{x_n}[ k(x_n, z_m) k(x_n, z_m') ]

with x_n ~ N(mu_n, diag(S_n)).  Derivations are the standard Bayesian-GPLVM
results (Titsias & Lawrence 2010).  Everything is expressed as
broadcasted elementwise ops + one einsum so XLA maps the m,m' products
onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from .kernels import RBF, Sum, White

__all__ = ["psi_statistics"]


def _rbf_psi(kern: RBF, mu, S, Z):
    """psi0 (N,), psi1 (N, M), psi2 summed over n (M, M)."""
    var = kern.variance.value
    ls2 = kern.lengthscales.value ** 2                          # (D,)
    N, D = mu.shape

    psi0 = jnp.full((N,), 1.0, dtype=mu.dtype) * var

    # psi1: prod_d (1 + S/ls2)^(-1/2) exp(-0.5 (mu - z)^2 / (ls2 + S))
    denom1 = ls2 + S                                            # (N, D)
    logdet1 = -0.5 * jnp.sum(jnp.log1p(S / ls2), axis=-1)       # (N,)
    d1 = mu[:, None, :] - Z[None, :, :]                         # (N, M, D)
    quad1 = -0.5 * jnp.sum(d1 ** 2 / denom1[:, None, :], axis=-1)
    psi1 = var * jnp.exp(logdet1[:, None] + quad1)              # (N, M)

    # psi2[n,m,m'] = var^2 prod_d (1 + 2S/ls2)^(-1/2)
    #   * exp(-0.25 (z_m - z_m')^2 / ls2 - (mu - zbar)^2 / (ls2 + 2S))
    denom2 = ls2 + 2.0 * S                                      # (N, D)
    logdet2 = -0.5 * jnp.sum(jnp.log1p(2.0 * S / ls2), axis=-1)  # (N,)
    zz = Z[:, None, :] - Z[None, :, :]                          # (M, M, D)
    log_zz = -0.25 * jnp.sum(zz ** 2 / ls2, axis=-1)            # (M, M)
    zbar = 0.5 * (Z[:, None, :] + Z[None, :, :])                # (M, M, D)
    # exp term per (n, m, m'): expand via sum over d of
    # -(mu_nd - zbar_mm'd)^2 / denom2_nd.  To keep memory at
    # O(N*M*M) rather than materializing (N, M, M, D), expand the square:
    # (mu - zbar)^2 = mu^2 - 2 mu zbar + zbar^2, contracting d with einsum.
    inv2 = 1.0 / denom2                                         # (N, D)
    t_mu2 = jnp.sum(mu ** 2 * inv2, axis=-1)                    # (N,)
    t_cross = jnp.einsum("nd,abd->nab", mu * inv2, zbar)        # (N, M, M)
    t_zbar2 = jnp.einsum("nd,abd->nab", inv2, zbar ** 2)        # (N, M, M)
    # mathematically <= 0; clamp float32 cancellation noise so exp can't
    # overflow
    quad2 = jnp.minimum(
        -(t_mu2[:, None, None] - 2.0 * t_cross + t_zbar2), 0.0)  # (N, M, M)
    psi2_n = var ** 2 * jnp.exp(
        logdet2[:, None, None] + log_zz[None, :, :] + quad2)
    psi2 = jnp.sum(psi2_n, axis=0)                              # (M, M)
    return psi0, psi1, psi2


def psi_statistics(kern, mu, S, Z):
    """Dispatch on kernel type. Supports RBF and Sum(RBF, White, ...) —
    the combinations the reference demos/tests exercise.

    White contributes its variance to psi0 only (its cross-covariance is
    zero, so psi1/psi2 cross terms vanish in expectation).
    """
    if isinstance(kern, RBF):
        return _rbf_psi(kern, mu, S, Z)
    if isinstance(kern, Sum):
        N = mu.shape[0]
        M = Z.shape[0]
        psi0 = jnp.zeros((N,), dtype=mu.dtype)
        psi1 = jnp.zeros((N, M), dtype=mu.dtype)
        psi2 = jnp.zeros((M, M), dtype=mu.dtype)
        rbf_parts = []
        for k in kern.kernels:
            if isinstance(k, White):
                psi0 = psi0 + k.variance.value
            elif isinstance(k, RBF):
                p0, p1, p2 = _rbf_psi(k, mu, S, Z)
                psi0 = psi0 + p0
                psi1 = psi1 + p1
                psi2 = psi2 + p2
                rbf_parts.append(k)
            else:
                raise NotImplementedError(
                    f"psi statistics for {type(k).__name__} in a Sum")
        if len(rbf_parts) > 1:
            raise NotImplementedError(
                "psi2 cross terms for multiple RBF components")
        return psi0, psi1, psi2
    raise NotImplementedError(
        f"psi statistics not implemented for {type(kern).__name__}")
