"""Hamiltonian Monte Carlo over model parameters.

The reference's MCMC layers (SGPMC_Layer/GPMC_Layer,
/root/reference/doubly_stochastic_dgp/layers.py:249-293) put N(0,1)
priors on q_mu and rely on GPflow's HMC to sample the posterior.  This
module provides the TPU-native equivalent: a jitted leapfrog HMC kernel
over the trainable unconstrained leaves of the model, targeting
``log_posterior(model) = marginal/bound + log_prior`` (e.g.
DGPHeinonen.log_posterior).  The whole chain — including dual-averaging
step-size adaptation during burn-in (Hoffman & Gelman 2014, Alg. 5) —
runs as one lax.scan: no per-step host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .optim import partition_trainable

__all__ = ["hmc_sample", "hmc_sample_chains", "potential_scale_reduction",
           "effective_sample_size", "HMCInfo"]


class HMCInfo(NamedTuple):
    accept_rate: float        # over the whole chain (burn + sampling)
    step_size: float          # final (adapted) step size
    final_log_prob: float


def _make_chain_runner(logp_grad, dtype, num_samples, num_burn,
                       step_size, num_leapfrog, adapt_step_size,
                       target_accept):
    """Build the jittable single-chain scan ``run(flat0, lp0, keys) ->
    (final_carry, positions)``; `hmc_sample_chains` vmaps it so C
    chains advance in lockstep as one batched (MXU-friendly) program."""
    # dual-averaging constants (Hoffman & Gelman 2014)
    da_mu = jnp.asarray(jnp.log(10.0 * step_size), dtype=dtype)
    da_t0, da_gamma, da_kappa = 10.0, 0.05, 0.75

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

    def kernel(carry, inp):
        key, it = inp
        q, lp, acc, log_eps, log_eps_bar, Hbar = carry
        kp, ku = jax.random.split(key)
        in_burn = it < num_burn
        if adapt_step_size:
            eps = jnp.exp(jnp.where(in_burn, log_eps, log_eps_bar))
        else:
            eps = jnp.asarray(step_size, dtype=dtype)
        p0 = jax.random.normal(kp, q.shape, dtype=dtype)
        q_new, p_new, lp_new = leapfrog(q, p0, eps)
        log_alpha = (lp_new - lp
                     - 0.5 * jnp.sum(p_new ** 2)
                     + 0.5 * jnp.sum(p0 ** 2))
        # divergences (NaN energy) count as acceptance probability 0
        alpha = jnp.where(jnp.isnan(log_alpha), 0.0,
                          jnp.minimum(1.0, jnp.exp(log_alpha)))
        accept = (jnp.log(jax.random.uniform(ku, dtype=dtype))
                  < jnp.where(jnp.isnan(log_alpha), -jnp.inf, log_alpha))
        q = jnp.where(accept, q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        acc = acc + accept.astype(dtype)

        if adapt_step_size:
            m = (it + 1).astype(dtype)
            Hbar_n = ((1.0 - 1.0 / (m + da_t0)) * Hbar
                      + (target_accept - alpha) / (m + da_t0))
            log_eps_n = da_mu - jnp.sqrt(m) / da_gamma * Hbar_n
            eta = m ** (-da_kappa)
            log_eps_bar_n = eta * log_eps_n + (1.0 - eta) * log_eps_bar
            Hbar = jnp.where(in_burn, Hbar_n, Hbar)
            log_eps = jnp.where(in_burn, log_eps_n, log_eps)
            log_eps_bar = jnp.where(in_burn, log_eps_bar_n, log_eps_bar)
        return (q, lp, acc, log_eps, log_eps_bar, Hbar), q

    total = num_burn + num_samples
    its = jnp.arange(total)

    def run(flat0, lp0, keys):
        zero = jnp.zeros((), dtype=dtype)
        carry = (flat0, lp0, zero,
                 jnp.asarray(jnp.log(step_size), dtype=dtype),
                 jnp.asarray(jnp.log(step_size), dtype=dtype), zero)
        carry, qs = jax.lax.scan(kernel, carry, (keys, its))
        return carry, qs

    return run


def hmc_sample(model, log_prob_fn: Callable, key,
               num_samples: int = 100, num_burn: int = 100,
               step_size: float = 0.01, num_leapfrog: int = 10,
               freeze=None, adapt_step_size: bool = False,
               target_accept: float = 0.8):
    """Run HMC; returns (samples, accept_rate, rebuild, info).

    ``samples`` is (num_samples, P) raveled positions; ``rebuild(vec)``
    maps a position back to a model.  log_prob_fn(model) -> scalar
    log target (un-normalized posterior).

    ``adapt_step_size=True`` tunes the leapfrog step size by dual
    averaging toward ``target_accept`` during the ``num_burn``
    iterations, then freezes it at the averaged value for sampling —
    ``step_size`` becomes the initial guess.
    """
    flat0, rebuild = partition_trainable(model, freeze=freeze)

    def logp(v):
        return log_prob_fn(rebuild(v))

    logp_grad = jax.value_and_grad(logp)
    dtype = flat0.dtype
    run = jax.jit(_make_chain_runner(
        logp_grad, dtype, num_samples, num_burn, step_size,
        num_leapfrog, adapt_step_size, target_accept))

    total = num_burn + num_samples
    keys = jax.random.split(key, total)
    (qf, lpf, acc, log_eps, log_eps_bar, _), qs = run(flat0, logp(flat0),
                                                     keys)
    samples = qs[num_burn:]
    accept_rate = float(acc) / total
    final_eps = float(jnp.exp(log_eps_bar)) if adapt_step_size \
        else float(step_size)
    info = HMCInfo(accept_rate=accept_rate, step_size=final_eps,
                   final_log_prob=float(lpf))
    return samples, accept_rate, rebuild, info


def potential_scale_reduction(samples):
    """Split-R-hat (Gelman et al., BDA3 / Vehtari et al. 2021) per
    parameter from ``samples`` (C, S, P).  Each chain is split in half
    (2C half-chains), and R-hat = sqrt(((n-1)/n W + B/n) / W); values
    near 1 indicate the chains mix over the same distribution."""
    C, S, P = samples.shape
    n = S // 2
    halves = jnp.reshape(samples[:, : 2 * n, :], (2 * C, n, P))
    means = jnp.mean(halves, axis=1)                       # (2C, P)
    variances = jnp.var(halves, axis=1, ddof=1)            # (2C, P)
    W = jnp.mean(variances, axis=0)                        # (P,)
    B = n * jnp.var(means, axis=0, ddof=1)                 # (P,)
    var_plus = (n - 1) / n * W + B / n
    return jnp.sqrt(var_plus / jnp.maximum(W, 1e-300))


def effective_sample_size(samples):
    """Combined-chain effective sample size per parameter (Vehtari et
    al. 2021) from ``samples`` (C, S, P) — host-side numpy (a
    diagnostic, not hot-path).  Per-chain autocovariances via FFT, the
    combined autocorrelation ``rho_t = 1 - (W - mean_c acov_{c,t}) /
    var_plus``, and Geyer's initial monotone positive sequence
    truncation.  iid samples give ESS ~ C*S; sticky chains much less."""
    x = np.asarray(samples, dtype=np.float64)
    C, S, P = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    # FFT autocovariance per chain/param: (C, S, P), biased (1/S) norm
    nfft = 1 << (2 * S - 1).bit_length()
    f = np.fft.rfft(xc, n=nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=1)[:, :S, :] / S
    W = np.mean(acov[:, 0, :] * S / (S - 1), axis=0)        # (P,)
    mean_acov = np.mean(acov, axis=0)                       # (S, P)
    B_over_n = np.var(x.mean(axis=1), axis=0, ddof=1) if C > 1 \
        else np.zeros(P)
    var_plus = (S - 1) / S * W + B_over_n                   # (P,)
    ok = var_plus > 0
    vp = np.where(ok, var_plus, 1.0)
    rho = 1.0 - (W[None, :] - mean_acov) / vp[None, :]      # (S, P)
    # Geyer, vectorized over P: pair sums P_k = rho_{2k} + rho_{2k+1}
    # starting at (rho_0 + rho_1); keep while positive (cumulative
    # mask on the raw pairs), enforce monotone nonincreasing
    # (cumulative min); tau = -1 + 2 * sum_k P_k
    if S % 2 == 1:
        rho = np.concatenate([rho, np.zeros((1, P))], axis=0)
    pairs = rho[0::2, :] + rho[1::2, :]                     # (K, P)
    keep = np.cumprod(pairs >= 0, axis=0).astype(bool)
    pairs_mono = np.minimum.accumulate(pairs, axis=0)
    acc = np.sum(np.where(keep, pairs_mono, 0.0), axis=0)   # (P,)
    tau = np.maximum(-1.0 + 2.0 * acc, 1e-12)
    return np.where(ok, C * S / tau, float(C * S))


def hmc_sample_chains(model, log_prob_fn: Callable, key,
                      num_chains: int = 4, num_samples: int = 100,
                      num_burn: int = 100, step_size: float = 0.01,
                      num_leapfrog: int = 10, freeze=None,
                      adapt_step_size: bool = True,
                      target_accept: float = 0.8,
                      init_jitter: float = 0.1,
                      mesh=None, chain_axis: str = None):
    """Multi-chain HMC: C chains advance in lockstep inside ONE jitted
    vmap'd scan — the TPU-native way to run MCMC (the per-chain
    gradient evaluations batch into (C, ...) tensor ops on the MXU
    instead of C sequential chains; the reference's GPflow/TF1 HMC is
    strictly single-chain).  Each chain adapts its own step size by
    dual averaging during burn-in; initial positions are the model's
    values perturbed by ``init_jitter``-scaled Gaussian noise
    (overdispersed starts, as split-R-hat assumes).

    ``mesh`` shards the chain axis over a ``jax.sharding.Mesh``
    (chains are independent — embarrassingly chain-parallel; each
    device integrates its own chains with no per-step collectives).
    ``num_chains`` must divide by the mesh axis size.

    Returns (samples (C, num_samples, P), accept_rates (C,), rebuild,
    info dict with per-chain step sizes and per-parameter split R-hat).
    """
    flat0, rebuild = partition_trainable(model, freeze=freeze)

    def logp(v):
        return log_prob_fn(rebuild(v))

    logp_grad = jax.value_and_grad(logp)
    dtype = flat0.dtype
    run = _make_chain_runner(logp_grad, dtype, num_samples, num_burn,
                             step_size, num_leapfrog, adapt_step_size,
                             target_accept)

    total = num_burn + num_samples
    k_init, k_run = jax.random.split(key)
    q0 = (flat0[None, :]
          + init_jitter * jax.random.normal(
              k_init, (num_chains, flat0.shape[0]), dtype=dtype))
    chain_keys = jax.vmap(lambda k: jax.random.split(k, total))(
        jax.random.split(k_run, num_chains))
    lp0 = jax.vmap(logp)(q0)
    if mesh is not None:
        from ..parallel.mesh import shard_chains
        q0, lp0, chain_keys = shard_chains(
            mesh, chain_axis, num_chains, q0, lp0, chain_keys)

    carry, qs = jax.jit(jax.vmap(run))(q0, lp0, chain_keys)
    _, lpf, acc, _, log_eps_bar, _ = carry
    samples = qs[:, num_burn:, :]                          # (C, S, P)
    accept_rates = np.asarray(acc) / total
    step_sizes = (np.exp(np.asarray(log_eps_bar)) if adapt_step_size
                  else np.full(num_chains, step_size))
    info = {
        "accept_rates": accept_rates,
        "step_sizes": step_sizes,
        "final_log_probs": np.asarray(lpf),
        "rhat": np.asarray(potential_scale_reduction(samples)),
        "ess": effective_sample_size(samples),
    }
    return samples, accept_rates, rebuild, info
