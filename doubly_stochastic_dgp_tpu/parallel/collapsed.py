"""Data-parallel training for the fully-collapsed Damianou-Lawrence DGP.

The Damianou bound (models/damianou.py) looks "full batch" — every row
owns variational parameters q(H_l)[n] — but it decomposes exactly into
per-row sums: the psi statistics (psi0, psi1^T targets, psi2), the
certain-branch feature sums (Kdiag, Kuf Kuf^T, Kuf err), the quadratic
target sums, and the per-row correction/entropy terms are all data sums.
So the N axis shards over the mesh — *including the per-row h_mean /
h_var variational state, which lives and updates entirely on its own
device* — and the only cross-device traffic is a psum of (M, M)/(M, D)
moment blocks per layer (a few hundred KB over ICI), after which every
device assembles the identical small collapsed algebra.

Three stages inside one shard_map (differentiated through — the psum
transposes are exact, so gradients equal the single-device ones):
  1. per-shard moment sums over local rows,
  2. psum -> replicated L/R/LB/c assembly (Gram-form AAT, as in
     SGPRLayer._common),
  3. per-shard correction/entropy sums -> scalar psum.

This gives the reference model family something it never had: the
collapsed models (the SGPR-collapsed DGP is the L=1 special case)
training data-parallel across chips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.linalg import safe_cholesky, safe_cholesky_ladder, tri_solve

__all__ = ["damianou_shard", "dp_damianou_elbo",
           "make_dp_damianou_train_step",
           "collapsed_shard", "dp_collapsed_elbo",
           "make_dp_collapsed_train_step"]

_ROW_LEAVES = ("h_mean", "h_var", "X_data", "Y_data")


def _path_names(path):
    out = []
    for p in path:
        n = getattr(p, "name", None)
        if n is None:
            n = getattr(p, "idx", getattr(p, "key", None))
        out.append(str(n))
    return out


def damianou_specs(model, axis: str = "data"):
    """PartitionSpec pytree: row-indexed leaves (training rows and their
    q(H) variational state) shard over ``axis``; everything else
    (kernels, Z, noise, likelihood) is replicated."""

    def spec_for(path, leaf):
        names = _path_names(path)
        if any(r in names for r in _ROW_LEAVES) and jnp.ndim(leaf) >= 1:
            return P(axis, *([None] * (jnp.ndim(leaf) - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, model)


def damianou_shard(model, mesh: Mesh, axis: str = "data"):
    """Place the model: rows + q(H) state sharded, the rest replicated."""
    specs = damianou_specs(model, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        model, specs)


def _layer_moments(layer, mu, sv, T):
    """Stage 1: local data sums for one layer.

    Returns (phi (M, n_l) features, P2 (M, M), P1T (M, D_out),
    sum_t2 (), sum_phi0 ()) where phi is Kuf (certain inputs) or psi1^T
    (uncertain), P2 = sum_n phi_n phi_n^T (the psi2 sum when uncertain)
    and T already has the mean function subtracted when certain."""
    from ..ops.psi_stats import psi_statistics

    Z = layer.Z.value
    if sv is None:
        err = T - layer.mean_function(mu)
        phi = layer.kern.K(Z, mu)                              # (M, n)
        P2 = phi @ phi.T
        P1T = phi @ err
        sum_t2 = jnp.sum(err ** 2)
        sum_phi0 = jnp.sum(layer.kern.Kdiag(mu))
        return phi, P2, P1T, sum_t2, sum_phi0
    psi0, psi1, psi2s = psi_statistics(layer.kern, mu, sv, Z)
    return psi1.T, psi2s, psi1.T @ T, jnp.sum(T ** 2), jnp.sum(psi0)


def _assemble(layer, P2, P1T, sigma2):
    """Stage 2 (replicated): the small collapsed algebra.  Returns
    (L, LB, c, tr_AAT).  AAT uses the same symmetrized two-solve form
    as SGPRLayer._common (NOT a chol(P2) Gram: P2 can be singular, and
    jitter on P2 leaks ~eps*tr(Kuu^{-1})/sigma^2 into the trace term,
    invalidly *raising* the bound; jitter on B below only lowers it —
    the safe side)."""
    L = safe_cholesky(layer.kern.K(layer.Z.value), layer.jitter)
    tmp = tri_solve(L, P2, lower=True, mode=layer.solve_mode)
    AAT = tri_solve(L, tmp.T, lower=True, mode=layer.solve_mode) / sigma2
    AAT = 0.5 * (AAT + AAT.T)
    M = P2.shape[0]
    B = AAT + jnp.eye(M, dtype=P2.dtype)
    LB = safe_cholesky_ladder(B)
    half = tri_solve(L, P1T, lower=True, mode=layer.solve_mode)
    c = tri_solve(LB, half, lower=True, mode=layer.solve_mode) / sigma2
    return L, LB, c, jnp.trace(AAT)


def _layer_bound(N, Do, sigma2, LB, c, sum_t2, sum_phi0, tr_AAT, dtype):
    """The unified certain/uncertain collapsed bound (matches
    SGPRLayer.build_likelihood term by term for both branches)."""
    N = jnp.asarray(N, dtype=dtype)
    Do = jnp.asarray(Do, dtype=dtype)
    bound = -0.5 * N * Do * jnp.log(2 * jnp.pi * sigma2)
    bound -= Do * jnp.sum(jnp.log(jnp.diagonal(LB)))
    bound += -0.5 * sum_t2 / sigma2
    bound += 0.5 * jnp.sum(c ** 2)
    bound += -0.5 * Do * (sum_phi0 / sigma2 - tr_AAT)
    return bound


def dp_damianou_elbo(model, mesh: Mesh, axis: str = "data"):
    """The Damianou bound over the mesh — exactly equal (up to float
    reassociation of the psums) to ``model.elbo()`` on one device."""
    n_dev = mesh.shape[axis]
    assert model.X_data.shape[0] % n_dev == 0, (
        f"N={model.X_data.shape[0]} must divide the {n_dev}-device mesh")
    specs = damianou_specs(model, axis)

    @partial(shard_map, mesh=mesh, in_specs=(specs,), out_specs=P())
    def _run(m):
        total = jnp.zeros((), dtype=m.X_data.dtype)
        L_layers = len(m.layers)
        for l, layer in enumerate(m.layers):
            mu, sv, T, var_l = m._layer_data(l)
            lay = layer.set_data(mu, sv, T, var_l)
            sigma2 = lay._bound_variance()
            # highest precision for the small-matrix algebra (same
            # policy as SGPRLayer._common)
            with jax.default_matmul_precision("highest"):
                phi, P2, P1T, sum_t2, sum_phi0 = _layer_moments(
                    layer, mu, sv, T)
                # one psum per layer: (M, M) + (M, Do) + 2 scalars
                P2, P1T, sum_t2, sum_phi0 = jax.lax.psum(
                    (P2, P1T, sum_t2, sum_phi0), axis)
                Lc, LB, c, tr_AAT = _assemble(layer, P2, P1T, sigma2)
                N = mu.shape[0] * n_dev
                Do = T.shape[1]
                g = _layer_bound(N, Do, sigma2, LB, c, sum_t2, sum_phi0,
                                 tr_AAT, mu.dtype)
                if l < L_layers - 1:
                    # stage 3: per-row corrections G_n = V phi_n, V =
                    # LB^{-1} L^{-1} / sigma2 — local rows only, then a
                    # scalar psum
                    s = m.h_var[l].value
                    Vh = tri_solve(Lc, jnp.eye(P2.shape[0],
                                               dtype=P2.dtype),
                                   lower=True, mode=layer.solve_mode)
                    V = tri_solve(LB, Vh, lower=True,
                                  mode=layer.solve_mode) / sigma2
                    G = V @ phi                                # (M, n_l)
                    diagGtG = jnp.sum(G ** 2, axis=0)          # (n_l,)
                    corr = (-0.5 * jnp.sum(s) / sigma2
                            + 0.5 * jnp.sum(diagGtG[:, None] * s))
                    ent = 0.5 * jnp.sum(
                        jnp.log(2.0 * jnp.pi * jnp.e * s))
                    g = g + jax.lax.psum(corr + ent, axis)
            total = total + g
        return total

    return _run(model)


def collapsed_specs(model, axis: str = "data"):
    """PartitionSpec pytree for a generic ``DGPCollapsed``: the stored
    training rows shard over ``axis``; every parameter (inner SVGP
    layers, collapsed final layer, likelihood) stays replicated.

    Same row-leaf convention as :func:`damianou_specs` (a generic
    DGPCollapsed simply has no ``h_mean``/``h_var`` leaves), so this is
    the same function — kept as a named alias for the public API.
    """
    return damianou_specs(model, axis)


def collapsed_shard(model, mesh: Mesh, axis: str = "data"):
    """Place a generic DGPCollapsed: rows sharded, parameters replicated."""
    return damianou_shard(model, mesh, axis)


def dp_collapsed_elbo(model, mesh: Mesh, key=None, axis: str = "data",
                      zs=None):
    """The generic ``DGPCollapsed`` bound (reference model_zoo.py:46-57)
    over the mesh — round-2 VERDICT next-step #2.

    Each device MC-propagates its OWN training rows through the inner
    (SVGP) layers with S=1 under a decorrelated per-device key (or the
    row-sharded explicit ``zs``, which makes the value exactly equal —
    up to psum reassociation — to the single-device bound with the same
    zs), then:

    - **SGPR final layer**: local psi-statistic moment blocks over the
      local rows, ONE psum of ((M, M), (M, D), scalar, scalar), and the
      replicated small collapsed algebra — the same stages 1-3 as the
      Damianou path (the per-request cost center, psi stats over all N
      rows, is what shards).  The propagated inner variance always
      feeds the psi (uncertain-input) branch, exactly like the live
      ``DGPCollapsed.elbo``.
    - **GPR final layer**: the exact marginal needs the dense N x N
      gram, which has no moment decomposition — the propagated means
      are all_gathered (N x D_last, small) and the bound computed
      replicated.  The O(N^3) Cholesky replicates; only the inner
      propagation shards.

    The inner KLs are replicated-parameter quantities, counted once.
    With ``key=None`` and ``zs=None`` the inner draw uses PRNGKey(0)
    folded per device.
    """
    from ..models.layers import GPRLayer, SGPRLayer
    from ..models.zoo import DGPHeinonen

    if isinstance(model, DGPHeinonen):
        # Heinonen's "inner propagation" is its whitened GPMC latents,
        # which are full-N and REPLICATED (not row-sharded) — feeding
        # them through the row-sharded stages below would all_gather
        # n_dev copies against N targets. Its bound is dense-N x N
        # exact-GPR algebra with no moment decomposition to shard.
        raise NotImplementedError(
            "dp_collapsed_elbo does not support DGPHeinonen: its GPMC "
            "latents are replicated, not row-sharded; compute its "
            "log_posterior on one device (the bound is dense N x N).")
    n_dev = mesh.shape[axis]
    N = int(model.X_data.shape[0])
    assert N % n_dev == 0, (
        f"N={N} must divide the {n_dev}-device '{axis}' mesh axis")
    last = model.layers[-1]
    assert isinstance(last, (GPRLayer, SGPRLayer)), type(last)
    specs = collapsed_specs(model, axis)
    zs_specs = (None if zs is None
                else [P(None, axis, None) for _ in zs])
    key = key if key is not None else jax.random.PRNGKey(0)

    @partial(shard_map, mesh=mesh, in_specs=(specs, P(), zs_specs),
             out_specs=P())
    def _run(m, key, zs_l):
        dev = jax.lax.axis_index(axis)
        _, ms, vs = m.inner_layers_propagate(
            m.X_data, key=jax.random.fold_in(key, dev), full_cov=False,
            zs=zs_l)
        mu, sv = ms[-1][0], vs[-1][0]
        lay = m.layers[-1]
        sigma2_raw = m.likelihood.variance.value
        KL = sum((l.KL() for l in m.layers[:-1]),
                 jnp.zeros((), dtype=mu.dtype))
        if isinstance(lay, GPRLayer):
            # no moment decomposition: gather the (small) propagated
            # means + targets, replicate the exact-GPR algebra
            mu_full = jax.lax.all_gather(mu, axis, axis=0, tiled=True)
            Y_full = jax.lax.all_gather(m.Y_data, axis, axis=0,
                                        tiled=True)
            bound = lay.set_data(mu_full, None, Y_full,
                                 sigma2_raw).build_likelihood()
            return jax.lax.pmean(bound, axis) - KL
        lay = lay.set_data(mu, sv, m.Y_data, sigma2_raw)
        sigma2 = lay._bound_variance()
        # highest precision for the collapsed algebra (the same policy
        # as SGPRLayer._common; see that docstring)
        with jax.default_matmul_precision("highest"):
            _, P2, P1T, sum_t2, sum_phi0 = _layer_moments(
                lay, mu, sv, m.Y_data)
            P2, P1T, sum_t2, sum_phi0 = jax.lax.psum(
                (P2, P1T, sum_t2, sum_phi0), axis)
            _, LB, c, tr_AAT = _assemble(lay, P2, P1T, sigma2)
            bound = _layer_bound(mu.shape[0] * n_dev, m.Y_data.shape[1],
                                 sigma2, LB, c, sum_t2, sum_phi0,
                                 tr_AAT, mu.dtype)
        return bound - KL

    return _run(model, key, zs)


def make_dp_collapsed_train_step(tx: optax.GradientTransformation,
                                 mesh: Mesh, axis: str = "data"):
    """Jitted dp train step for a generic DGPCollapsed: grads flow
    through the shard_map (the moment psums transpose exactly), inner
    variational/kernel parameters see the psum'd gradient, and a fresh
    inner-propagation key is folded in per call."""

    def loss_fn(model, key):
        from ..utils.modules import log_prior
        return -(dp_collapsed_elbo(model, mesh, key=key, axis=axis)
                 + log_prior(model))

    @jax.jit
    def step(model, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(model, key)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step


def make_dp_damianou_train_step(tx: optax.GradientTransformation,
                                mesh: Mesh, axis: str = "data"):
    """Jitted dp train step for DGPDamianou: grads flow through the
    shard_map (psum transposes are exact), sharded q(H) leaves update in
    place on their own devices, replicated hyperparameters see the
    psum'd gradient."""

    def loss_fn(model):
        # MAP objective: + log_prior, like the single-device losses
        from ..utils.modules import log_prior
        return -(dp_damianou_elbo(model, mesh, axis=axis)
                 + log_prior(model))

    @jax.jit
    def step(model, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = tx.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    return step
