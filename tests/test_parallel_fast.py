"""Fast-tier parallel smoke (round-1 VERDICT next-step #9): the full
mesh suite (grad-of-shard_map on 8 devices) lives in test_parallel.py /
test_outdim.py behind the ``slow`` marker; this keeps ONE cheap
forward-only shard_map oracle in ``-m "not slow"`` — a tiny model on a
2-device submesh, dp_elbo == the single-device ELBO exactly."""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu import DGP, Gaussian, RBF
from doubly_stochastic_dgp_tpu.parallel.dp import dp_elbo
from doubly_stochastic_dgp_tpu.parallel.mesh import make_mesh


def test_dp_elbo_two_device_forward_equals_local():
    np.random.seed(0)
    N, D, M = 8, 2, 4
    X = np.random.randn(N, D)
    Y = np.sin(X[:, :1])
    m = DGP.build(X, Y, X[:M].copy(), [RBF.make(D)], Gaussian.make(0.1),
                  num_samples=1)
    mesh = make_mesh(num_devices=2)
    key = jax.random.PRNGKey(0)

    got = float(dp_elbo(m, m.X_data, m.Y_data, key, mesh))

    # emulation: per-device halves with the device-folded keys
    total = 0.0
    for di in range(2):
        kd = jax.random.fold_in(key, di)
        Xl, Yl = m.X_data[di * 4:(di + 1) * 4], m.Y_data[di * 4:(di + 1) * 4]
        ve = m.E_log_p_Y(Xl, Yl, kd)
        total += float(jnp.sum(ve))
    KL = float(sum(l.KL() for l in m.layers))
    assert_allclose(got, total - KL, rtol=1e-10)
