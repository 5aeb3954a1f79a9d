"""No-U-Turn Sampler (NUTS) over model parameters.

Completes the MCMC story beyond the reference: the reference's MCMC
layers (/root/reference/doubly_stochastic_dgp/layers.py:249-293) rely
on GPflow's plain fixed-length HMC; this module provides the adaptive
trajectory-length sampler (Hoffman & Gelman 2014) in its modern
multinomial form (Betancourt 2017), implemented the TPU-native way:

- the whole chain is ONE jitted ``lax.scan`` (no per-step host round
  trips), with the tree built by ``lax.while_loop`` doublings and a
  ``fori_loop`` over leapfrog leaves — all fixed-shape state, so XLA
  compiles a single program regardless of how deep any tree grows;
- the in-subtree U-turn checks use the iterative checkpoint scheme
  (Phan & Pradhan, "Iterative NUTS"): momenta and running momentum
  sums are checkpointed at power-of-two leaf boundaries in
  ``(max_depth, P)`` buffers, so every complete binary subtree is
  tested exactly as in the recursive formulation without recursion;
- multiple chains advance in lockstep under ``vmap`` (batched
  gradient evaluations on the MXU), sharing the split-R-hat / ESS
  diagnostics with :mod:`.hmc`.

Algorithm notes (pinned by tests/test_nuts.py):
- leapfrog with a *signed* step retraces the same (z, r) states, so
  backward expansion integrates with ``-eps`` directly and all momenta
  stay in forward-time convention — the generalized U-turn criterion
  ``dot(p_sum, r_left) <= 0 or dot(p_sum, r_right) <= 0`` applies
  verbatim to every span;
- progressive sampling is multinomial within a subtree and biased
  (Stan-style, favoring the new subtree) across doublings;
- a leaf with energy error above ``DIVERGENCE_THRESHOLD`` (or NaN)
  marks the trajectory divergent: the subtree is discarded and the
  proposal so far stands, exactly as in the recursive sampler;
- step-size adaptation is the same dual-averaging schedule as
  :mod:`.hmc`, driven by the mean leaf acceptance statistic.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .hmc import effective_sample_size, potential_scale_reduction
from .optim import partition_trainable

__all__ = ["nuts_sample", "nuts_sample_chains"]

DIVERGENCE_THRESHOLD = 1000.0


def _uturn(span, r_a, r_b):
    """Generalized U-turn criterion for a trajectory span: the span's
    momentum sum no longer points along either end's momentum."""
    return (jnp.dot(span, r_a) <= 0.0) | (jnp.dot(span, r_b) <= 0.0)


def _make_nuts_runner(logp_grad, dtype, num_samples, num_burn,
                      step_size, max_depth, adapt_step_size,
                      target_accept):
    """Build the jittable single-chain scan ``run(flat0, keys) ->
    (final_carry, positions)``; `nuts_sample_chains` vmaps it."""
    da_mu = jnp.asarray(jnp.log(10.0 * step_size), dtype=dtype)
    da_t0, da_gamma, da_kappa = 10.0, 0.05, 0.75
    levels = jnp.arange(max_depth + 1)                 # checkpoint ks
    pow2 = jnp.left_shift(1, levels)                   # 2^k

    def leapfrog(z, r, g, eps):
        r_half = r + 0.5 * eps * g
        z_new = z + eps * r_half
        lp_new, g_new = logp_grad(z_new)
        r_new = r_half + 0.5 * eps * g_new
        return z_new, r_new, g_new, lp_new

    def build_subtree(key, edge, n_leaf, eps, lw_ref):
        """Integrate ``n_leaf`` leaves from ``edge = (z, r, g, lp)``,
        maintaining the multinomial proposal, momentum sum, checkpoint
        U-turn checks, and divergence flags.  Once the subtree turns or
        diverges the remaining iterations are frozen no-ops (their
        states could be NaN)."""
        z, r, g, lp = edge
        P = z.shape[0]
        zeros_ck = jnp.zeros((max_depth + 1, P), dtype=dtype)
        init = (z, r, g, lp,
                z, lp, g,                              # proposal (+ its
                jnp.asarray(-jnp.inf, dtype),          # lp/grad), lw_sub
                jnp.zeros_like(z),                     # cum momentum sum
                zeros_ck, zeros_ck,                    # r_ckpt, psum_before
                jnp.asarray(False), jnp.asarray(False),
                jnp.zeros((), dtype),                  # sum_alpha
                jnp.zeros((), dtype),                  # n_eval leaves
                key)

        def body(i, carry):
            (z, r, g, lp, z_prop, lp_prop, g_prop, lw_sub, cum, r_ck,
             ps_ck, turning, diverging, sum_alpha, n_eval, key) = carry

            def live(_):
                zn, rn, gn, lpn = leapfrog(z, r, g, eps)
                lw_leaf = (lpn - 0.5 * jnp.dot(rn, rn)) - lw_ref
                bad = jnp.isnan(lw_leaf) | (
                    lw_leaf < -DIVERGENCE_THRESHOLD)
                lw_leaf = jnp.where(bad, -jnp.inf, lw_leaf)
                alpha = jnp.minimum(1.0, jnp.exp(lw_leaf))
                # checkpoint the leaf that STARTS each 2^k-aligned span
                set_mask = (i % pow2) == 0                 # (K,)
                r_ck_n = jnp.where(set_mask[:, None], rn[None, :], r_ck)
                ps_ck_n = jnp.where(set_mask[:, None], cum[None, :],
                                    ps_ck)
                cum_n = cum + rn
                # every complete 2^k span (k >= 1) ending at this leaf
                chk = ((i + 1) % pow2 == 0) & (levels >= 1)
                span = cum_n[None, :] - ps_ck_n            # (K, P)
                turn_k = ((jnp.einsum("kp,kp->k", span, r_ck_n) <= 0.0)
                          | (span @ rn <= 0.0))
                turning_n = jnp.any(chk & turn_k)
                # multinomial proposal update
                lw_n = jnp.logaddexp(lw_sub, lw_leaf)
                ku, key_n = jax.random.split(key)
                take = (jnp.log(jax.random.uniform(ku, dtype=dtype))
                        < lw_leaf - lw_n)
                z_prop_n = jnp.where(take, zn, z_prop)
                lp_prop_n = jnp.where(take, lpn, lp_prop)
                g_prop_n = jnp.where(take, gn, g_prop)
                return (zn, rn, gn, lpn, z_prop_n, lp_prop_n, g_prop_n,
                        lw_n, cum_n, r_ck_n, ps_ck_n, turning_n,
                        diverging | bad, sum_alpha + alpha,
                        n_eval + 1.0, key_n)

            return jax.lax.cond(turning | diverging, lambda _: carry,
                                live, None)

        (z, r, g, lp, z_prop, lp_prop, g_prop, lw_sub, cum, _, _,
         turning, diverging, sum_alpha, n_eval, _) = \
            jax.lax.fori_loop(0, n_leaf, body, init)
        return ((z, r, g, lp), (z_prop, lp_prop, g_prop), lw_sub, cum,
                turning, diverging, sum_alpha, n_eval)

    def trajectory(q, lp0, g0, key, eps):
        """One NUTS transition from (q, lp0 = logp(q), g0 = grad(q));
        returns (q_new, lp_new, g_new, mean_alpha, depth, diverged).
        Carrying (lp, grad) with the position saves re-evaluating the
        model gradient at the start of every transition — the proposal
        is always a leapfrog leaf whose (lp, grad) were already
        computed (round-3 review finding: one wasted gradient eval per
        transition, ~20% of all evals at the measured mean depth)."""
        kr, key = jax.random.split(key)
        r0 = jax.random.normal(kr, q.shape, dtype=dtype)
        lw_ref = lp0 - 0.5 * jnp.dot(r0, r0)

        state = dict(
            left=(q, r0, g0, lp0), right=(q, r0, g0, lp0),
            z_prop=(q, lp0, g0),
            lw_tot=jnp.zeros((), dtype), p_sum=r0,
            depth=jnp.zeros((), jnp.int32),
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            sum_alpha=jnp.zeros((), dtype),
            n_alpha=jnp.zeros((), dtype), key=key)

        def cond(s):
            return ((s["depth"] < max_depth) & ~s["turning"]
                    & ~s["diverging"])

        def doubling(s):
            kd, kb, ka, key = jax.random.split(s["key"], 4)
            go_right = jax.random.bernoulli(kd)
            edge = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, a, b),
                s["right"], s["left"])
            eps_signed = jnp.where(go_right, eps, -eps)
            n_leaf = jnp.left_shift(1, s["depth"])
            (edge_n, z_sub, lw_sub, p_sub, turn_sub, div_sub,
             sum_a, n_eval) = build_subtree(kb, edge, n_leaf, eps_signed,
                                            lw_ref)
            ok = ~turn_sub & ~div_sub
            # biased progressive sampling across the doubling
            take = (jnp.log(jax.random.uniform(ka, dtype=dtype))
                    < lw_sub - s["lw_tot"]) & ok
            z_prop = jax.tree_util.tree_map(
                lambda n, o: jnp.where(take, n, o), z_sub, s["z_prop"])
            lw_tot = jnp.where(ok, jnp.logaddexp(s["lw_tot"], lw_sub),
                               s["lw_tot"])
            p_sum = jnp.where(ok, s["p_sum"] + p_sub, s["p_sum"])
            pick = ok & go_right
            right = jax.tree_util.tree_map(
                lambda n, o: jnp.where(pick, n, o), edge_n, s["right"])
            pick_l = ok & ~go_right
            left = jax.tree_util.tree_map(
                lambda n, o: jnp.where(pick_l, n, o), edge_n, s["left"])
            turning = (turn_sub
                       | _uturn(p_sum, left[1], right[1]))
            return dict(
                left=left, right=right, z_prop=z_prop, lw_tot=lw_tot,
                p_sum=p_sum, depth=s["depth"] + 1, turning=turning,
                diverging=s["diverging"] | div_sub,
                # acceptance statistic over EVALUATED leaves only: a
                # subtree frozen by an early U-turn/divergence must not
                # count its never-integrated leaves as zero acceptance
                # (that would bias dual averaging below target_accept)
                sum_alpha=s["sum_alpha"] + sum_a,
                n_alpha=s["n_alpha"] + n_eval, key=key)

        s = jax.lax.while_loop(cond, doubling, state)
        mean_alpha = s["sum_alpha"] / jnp.maximum(s["n_alpha"], 1.0)
        q_n, lp_n, g_n = s["z_prop"]
        return q_n, lp_n, g_n, mean_alpha, s["depth"], s["diverging"]

    def kernel(carry, inp):
        key, it = inp
        q, lp, g, log_eps, log_eps_bar, Hbar, n_div, sum_depth = carry
        in_burn = it < num_burn
        if adapt_step_size:
            eps = jnp.exp(jnp.where(in_burn, log_eps, log_eps_bar))
        else:
            eps = jnp.asarray(step_size, dtype=dtype)
        q, lp, g, alpha, depth, diverged = trajectory(q, lp, g, key, eps)
        # Stan convention: only post-warmup divergences are diagnostic
        # (dual averaging intentionally explores unstable step sizes
        # early in burn-in, where divergences are expected and benign)
        n_div = n_div + (diverged & ~in_burn).astype(jnp.int32)
        # mean_tree_depth follows the same post-warmup convention
        # (burn-in explores small step sizes whose deep trees would
        # bias the diagnostic a user compares against Stan/numpyro)
        sum_depth = sum_depth + jnp.where(in_burn, 0, depth)

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
        return (q, lp, g, log_eps, log_eps_bar, Hbar, n_div,
                sum_depth), (q, alpha)

    total = num_burn + num_samples
    its = jnp.arange(total)

    def run(flat0, keys):
        lp0, g0 = logp_grad(flat0)      # once per chain, not per step
        carry = (flat0, lp0, g0,
                 jnp.asarray(jnp.log(step_size), dtype=dtype),
                 jnp.asarray(jnp.log(step_size), dtype=dtype),
                 jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
                 jnp.zeros((), jnp.int32))
        carry, (qs, alphas) = jax.lax.scan(kernel, carry, (keys, its))
        return carry, qs, alphas

    return run


def nuts_sample(model, log_prob_fn: Callable, key,
                num_samples: int = 100, num_burn: int = 100,
                step_size: float = 0.01, max_depth: int = 8,
                freeze=None, adapt_step_size: bool = True,
                target_accept: float = 0.8,
                compute_ess: bool = False):
    """Run NUTS; returns (samples, accept_stat, rebuild, info).

    Mirrors :func:`.hmc.hmc_sample`: ``samples`` is (num_samples, P)
    raveled trainable positions, ``rebuild(vec)`` maps one back to a
    model, ``log_prob_fn(model) -> scalar`` is the un-normalized log
    posterior.  ``max_depth`` caps the doubling count (trajectories
    stop early at a U-turn — the point of NUTS); ``step_size`` is the
    initial guess when ``adapt_step_size`` (dual averaging toward
    ``target_accept`` during burn-in, frozen after).
    """
    flat0, rebuild = partition_trainable(model, freeze=freeze)

    def logp(v):
        return log_prob_fn(rebuild(v))

    logp_grad = jax.value_and_grad(logp)
    dtype = flat0.dtype
    run = jax.jit(_make_nuts_runner(
        logp_grad, dtype, num_samples, num_burn, step_size, max_depth,
        adapt_step_size, target_accept))
    total = num_burn + num_samples
    keys = jax.random.split(key, total)
    (qf, _, _, log_eps, log_eps_bar, _, n_div, sum_depth), qs, alphas = \
        run(flat0, keys)
    samples = qs[num_burn:]
    accept_stat = float(jnp.mean(alphas[num_burn:]))
    final_eps = float(jnp.exp(log_eps_bar)) if adapt_step_size \
        else float(step_size)
    info = {
        "accept_stat": accept_stat,
        "step_size": final_eps,
        "divergences": int(n_div),
        "mean_tree_depth": float(sum_depth) / max(num_samples, 1),
    }
    if compute_ess and num_samples >= 2:
        info["ess"] = effective_sample_size(np.asarray(samples)[None])
    return samples, accept_stat, rebuild, info


def nuts_sample_chains(model, log_prob_fn: Callable, key,
                       num_chains: int = 4, num_samples: int = 100,
                       num_burn: int = 100, step_size: float = 0.01,
                       max_depth: int = 8, freeze=None,
                       adapt_step_size: bool = True,
                       target_accept: float = 0.8,
                       init_jitter: float = 0.1,
                       mesh=None, chain_axis: str = None):
    """Multi-chain NUTS: C chains advance in lockstep inside ONE jitted
    vmap'd scan (the same TPU-native batching as
    :func:`.hmc.hmc_sample_chains`); each chain adapts its own step
    size and grows its own trees (frozen chains wait inside the
    while_loop's fixed-shape state).  Returns (samples (C, S, P),
    accept_stats (C,), rebuild, info with per-chain step sizes /
    divergence counts, split R-hat, and ESS).

    ``mesh`` shards the chain axis over a ``jax.sharding.Mesh``
    (chains are independent, so MCMC is embarrassingly
    chain-parallel): each device integrates its own chains; the only
    collective is the while_loop's batched continue-predicate
    reduction.  ``num_chains`` must divide by the mesh axis size."""
    flat0, rebuild = partition_trainable(model, freeze=freeze)

    def logp(v):
        return log_prob_fn(rebuild(v))

    logp_grad = jax.value_and_grad(logp)
    dtype = flat0.dtype
    run = _make_nuts_runner(logp_grad, dtype, num_samples, num_burn,
                            step_size, max_depth, adapt_step_size,
                            target_accept)
    total = num_burn + num_samples
    k_init, k_run = jax.random.split(key)
    q0 = (flat0[None, :]
          + init_jitter * jax.random.normal(
              k_init, (num_chains, flat0.shape[0]), dtype=dtype))
    chain_keys = jax.vmap(lambda k: jax.random.split(k, total))(
        jax.random.split(k_run, num_chains))
    if mesh is not None:
        from ..parallel.mesh import shard_chains
        q0, chain_keys = shard_chains(mesh, chain_axis, num_chains,
                                      q0, chain_keys)

    carry, qs, alphas = jax.jit(jax.vmap(run))(q0, chain_keys)
    _, _, _, _, log_eps_bar, _, n_div, sum_depth = carry
    samples = qs[:, num_burn:, :]                          # (C, S, P)
    accept_stats = np.asarray(jnp.mean(alphas[:, num_burn:], axis=1))
    step_sizes = (np.exp(np.asarray(log_eps_bar)) if adapt_step_size
                  else np.full(num_chains, step_size))
    info = {
        "accept_stats": accept_stats,
        "step_sizes": step_sizes,
        "divergences": np.asarray(n_div),
        "mean_tree_depths": np.asarray(sum_depth) / max(num_samples, 1),
        "rhat": np.asarray(potential_scale_reduction(samples)),
        "ess": effective_sample_size(samples),
    }
    return samples, accept_stats, rebuild, info
