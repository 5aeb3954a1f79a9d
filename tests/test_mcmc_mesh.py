"""Chain-parallel MCMC over the device mesh.

Chains are independent, so sharding the vmap'd chain axis must not
change the math.  Near-exact equality is asserted over a SHORT
horizon (SPMD partitioning reschedules ops by ulps, which the
leapfrog amplifies to ~1e-8 within tens of iterations); any ulp
eventually flips a Metropolis accept/reject (chaotic divergence), so
the long horizon is validated statistically (target moments +
diagnostics) instead."""

import jax
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.parallel.mesh import make_mesh
from doubly_stochastic_dgp_tpu.training.hmc import hmc_sample_chains
from doubly_stochastic_dgp_tpu.training.nuts import nuts_sample_chains
from doubly_stochastic_dgp_tpu.utils.modules import Module, Param


class _Quad(Module):
    v: Param = None


_C = np.array([1.0, -2.0, 0.5])


def _model():
    return _Quad(v=Param.create(np.zeros(3)))


def _logp(m):
    return -0.5 * ((m.v.value - _C) ** 2).sum()


def test_nuts_chains_sharded_short_horizon_exact():
    mesh = make_mesh(8, axis="chains")
    kw = dict(num_chains=8, num_samples=40, num_burn=15,
              step_size=0.4, max_depth=5)
    s0, a0, _, _ = nuts_sample_chains(
        _model(), _logp, jax.random.PRNGKey(0), **kw)
    s1, a1, _, _ = nuts_sample_chains(
        _model(), _logp, jax.random.PRNGKey(0), mesh=mesh, **kw)
    assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)
    assert_allclose(a1, a0, rtol=1e-9)


def test_hmc_chains_sharded_short_horizon_exact():
    mesh = make_mesh(4, axis="chains")
    kw = dict(num_chains=8, num_samples=50, num_burn=20,
              step_size=0.3, num_leapfrog=6)
    s0, a0, _, _ = hmc_sample_chains(
        _model(), _logp, jax.random.PRNGKey(1), **kw)
    s1, a1, _, _ = hmc_sample_chains(
        _model(), _logp, jax.random.PRNGKey(1), mesh=mesh, **kw)
    assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)
    assert_allclose(a1, a0, rtol=1e-9)


def test_nuts_chains_sharded_long_horizon_statistics():
    mesh = make_mesh(8, axis="chains")
    samples, accs, _, info = nuts_sample_chains(
        _model(), _logp, jax.random.PRNGKey(2), num_chains=8,
        num_samples=600, num_burn=300, step_size=0.4, max_depth=7,
        mesh=mesh)
    assert samples.shape == (8, 600, 3)
    assert np.all(info["rhat"] < 1.1)
    pooled = np.asarray(samples).reshape(-1, 3)
    assert_allclose(pooled.mean(0), _C, atol=0.15)
    assert_allclose(pooled.std(0), np.ones(3), atol=0.2)


def test_chain_count_must_divide_mesh():
    mesh = make_mesh(8, axis="chains")
    try:
        nuts_sample_chains(_model(), _logp, jax.random.PRNGKey(0),
                           num_chains=6, num_samples=10, num_burn=5,
                           mesh=mesh)
        raised = False
    except ValueError:
        raised = True
    assert raised
