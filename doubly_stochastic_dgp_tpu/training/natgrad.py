"""Natural-gradient optimizer for Gaussian variational parameters.

Rebuilds the capability of gpflow.training.NatGradOptimizer as used by
the reference (SURVEY §2.3, §3.5; oracle pinned by
/root/reference/tests/test_collapsed.py:57-104: one gamma=1 step on the
final layer of a conjugate model lands exactly on the analytically
collapsed optimum — also asserted by our tests/test_natgrad.py).

Math (Salimbeni, Eleftheriadis & Hensman, AISTATS 2018): for
q(u) = N(m, S), S = L L^T per output dim, with
  xi    = (m, L)                       (the stored parameters)
  eta   = (m, S + m m^T)               (expectation parameters)
  theta = (S^{-1} m, -1/2 S^{-1})      (natural parameters)
the natural-gradient step on a loss ℒ is
  theta <- theta - gamma * dℒ/deta,
where dℒ/deta is obtained from dℒ/dxi by a VJP through the map
eta -> xi.  All matrix work is (D, M, M)-batched via vmap — MXU-friendly
Cholesky factorizations and solves.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..ops.linalg import safe_cholesky
from ..utils.modules import tree_replace

__all__ = ["NaturalGradient", "natgrad_update"]


def _sym(A):
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def _chol_inv(S_chol):
    """Inverse from a Cholesky factor."""
    M = S_chol.shape[-1]
    eye = jnp.eye(M, dtype=S_chol.dtype)
    Li = solve_triangular(S_chol, eye, lower=True)
    return Li.T @ Li


def natgrad_update(q_mu, q_sqrt, dq_mu, dq_sqrt, gamma, jitter=1e-12):
    """One natural-gradient step (minimization) on (q_mu, q_sqrt).

    q_mu: (M, D); q_sqrt: (D, M, M) lower; dq_mu/dq_sqrt: dℒ/dxi with the
    same shapes (dq_sqrt lower-triangular-supported).
    Returns updated (q_mu, q_sqrt).

    f32/TPU robustness: every Cholesky here runs through the grad-safe
    jitter-escalating ``safe_cholesky`` (S and the stepped precision can
    graze indefiniteness in float32), and the matmuls run at "highest"
    precision — on TPU the default f32 matmul is bf16-class, which is
    not enough for the S = L L^T / precision round-trips at M=100 (the
    round-1 TPU natgrad runs NaN'd exactly here).  Pass the layer's
    static ``jitter``; the f64 oracle tests use ~1e-12 so the gamma=1
    exactness identity is preserved.
    """

    def _xi_from_eta(eta1, eta2):
        """eta -> xi for one output dim: m = eta1,
        L = chol(eta2 - m m^T)."""
        m = eta1
        S = _sym(eta2) - jnp.outer(m, m)
        L = safe_cholesky(_sym(S), jitter)
        return m, L

    def one(m, L, dm, dL):
        S = L @ L.T
        eta1 = m
        eta2 = S + jnp.outer(m, m)
        # dℒ/deta via VJP through eta -> xi
        _, vjp = jax.vjp(_xi_from_eta, eta1, eta2)
        deta1, deta2 = vjp((dm, dL))
        # current natural parameters
        Sinv = _chol_inv(L)
        theta1 = Sinv @ m
        theta2 = -0.5 * Sinv
        # step
        theta1_new = theta1 - gamma * deta1
        theta2_new = theta2 - gamma * _sym(deta2)
        # back to xi: S = (-2 theta2)^{-1}, m = S theta1
        P = -2.0 * theta2_new                    # precision, must stay PD
        Lp = safe_cholesky(_sym(P), jitter)
        S_new = _chol_inv(Lp)
        m_new = S_new @ theta1_new
        L_new = safe_cholesky(_sym(S_new), jitter)
        # reject-step net: a too-aggressive gamma (or f32 gradient noise)
        # can push the stepped precision indefinite beyond what jitter
        # escalation can absorb; keeping the previous (m, L) for that
        # output dim turns a would-be NaN'd run into a skipped step.
        ok = jnp.logical_and(jnp.all(jnp.isfinite(m_new)),
                             jnp.all(jnp.isfinite(L_new)))
        return jnp.where(ok, m_new, m), jnp.where(ok, L_new, L)

    with jax.default_matmul_precision("highest"):
        m_new, L_new = jax.vmap(one, in_axes=(1, 0, 1, 0), out_axes=(1, 0))(
            q_mu, q_sqrt, dq_mu, dq_sqrt)
    return m_new, L_new


class NaturalGradient:
    """Alternating-loop-friendly natural-gradient optimizer.

    ``var_layers`` selects which layers' (q_mu, q_sqrt) receive natural
    steps (the reference's ``var_list`` of [[q_mu, q_sqrt]] pairs).
    ``step`` recomputes dℒ/dxi with jax.grad and applies
    :func:`natgrad_update` functionally.
    """

    def __init__(self, gamma: float, var_layers: Sequence[int] = (-1,)):
        self.gamma = gamma
        self.var_layers = tuple(var_layers)

    def step(self, model, loss_fn: Callable):
        """loss_fn(model) -> scalar loss (e.g. negative ELBO with a fixed
        key).  Returns the updated model."""
        with jax.default_matmul_precision("highest"):
            grads = jax.grad(loss_fn)(model)
        for idx in self.var_layers:
            layer = model.layers[idx]
            glayer = grads.layers[idx]
            q_mu = layer.q_mu.value
            q_sqrt = layer.q_sqrt.value
            # identity bijector: unconstrained grad == value grad;
            # triangular bijector: grad is tril-masked == dℒ/dL.
            dq_mu = glayer.q_mu.unconstrained
            dq_sqrt = jnp.tril(glayer.q_sqrt.unconstrained)
            m_new, L_new = natgrad_update(q_mu, q_sqrt, dq_mu, dq_sqrt,
                                          self.gamma,
                                          jitter=getattr(layer, "jitter",
                                                         1e-12))
            new_layer = layer.replace(
                q_mu=layer.q_mu.with_value(m_new),
                q_sqrt=layer.q_sqrt.with_value(L_new))
            li = idx % len(model.layers)
            model = tree_replace(model, ("layers", li), new_layer)
        return model
