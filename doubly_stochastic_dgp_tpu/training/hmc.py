"""Hamiltonian Monte Carlo over model parameters.

The reference's MCMC layers (SGPMC_Layer/GPMC_Layer,
/root/reference/doubly_stochastic_dgp/layers.py:249-293) put N(0,1)
priors on q_mu and rely on GPflow's HMC to sample the posterior.  This
module provides the TPU-native equivalent: a jitted leapfrog HMC kernel
over the trainable unconstrained leaves of the model, targeting
``log_posterior(model) = marginal/bound + log_prior`` (e.g.
DGPHeinonen.log_posterior).  The whole chain runs as one lax.scan — no
per-step host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .optim import partition_trainable

__all__ = ["hmc_sample", "HMCState"]


class HMCState(NamedTuple):
    position: jnp.ndarray     # raveled trainable leaves
    log_prob: jnp.ndarray
    accept_rate: jnp.ndarray


def hmc_sample(model, log_prob_fn: Callable, key,
               num_samples: int = 100, num_burn: int = 100,
               step_size: float = 0.01, num_leapfrog: int = 10,
               freeze=None):
    """Run HMC; returns (samples, accept_rate, rebuild).

    ``samples`` is (num_samples, P) raveled positions; ``rebuild(vec)``
    maps a position back to a model.  log_prob_fn(model) -> scalar
    log target (un-normalized posterior).
    """
    flat0, rebuild = partition_trainable(model, freeze=freeze)

    def logp(v):
        return log_prob_fn(rebuild(v))

    logp_grad = jax.value_and_grad(logp)

    def leapfrog(q, p, eps):
        lp, g = logp_grad(q)
        p = p + 0.5 * eps * g

        def body(_, carry):
            q, p = carry
            q = q + eps * p
            _, g = logp_grad(q)
            p = p + eps * g
            return q, p

        q, p = jax.lax.fori_loop(0, num_leapfrog - 1, body, (q, p))
        q = q + eps * p
        lp_new, g = logp_grad(q)
        p = p + 0.5 * eps * g
        return q, p, lp_new

    def kernel(carry, key):
        q, lp, acc = carry
        kp, ku = jax.random.split(key)
        p0 = jax.random.normal(kp, q.shape, dtype=q.dtype)
        q_new, p_new, lp_new = leapfrog(q, p0, step_size)
        log_alpha = (lp_new - lp
                     - 0.5 * jnp.sum(p_new ** 2)
                     + 0.5 * jnp.sum(p0 ** 2))
        accept = jnp.log(jax.random.uniform(ku, dtype=q.dtype)) < log_alpha
        q = jnp.where(accept, q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        acc = acc + accept.astype(q.dtype)
        return (q, lp, acc), q

    lp0 = logp(flat0)
    keys = jax.random.split(key, num_burn + num_samples)

    @jax.jit
    def run(flat0, lp0, keys):
        carry = (flat0, lp0, jnp.zeros((), dtype=flat0.dtype))
        carry, qs = jax.lax.scan(kernel, carry, keys)
        return carry, qs

    (qf, lpf, acc), qs = run(flat0, lp0, keys)
    samples = qs[num_burn:]
    accept_rate = float(acc) / (num_burn + num_samples)
    return samples, accept_rate, rebuild
