"""Worker for the 2-process jax.distributed smoke test (not collected by
pytest — underscore prefix).  Run as:

    python tests/_multihost_worker.py <process_id> <num_processes> \
        <coordinator_addr> [single]

With ``single`` the process skips distributed init and runs the same
program on its local (4-device) mesh — the ground-truth path.  Each
variant prints one JSON line with the dp_elbo value and the fit_dp
final loss so the parent test can compare them.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_model():
    import doubly_stochastic_dgp_tpu as dsd

    rng = np.random.default_rng(0)
    N, D = 32, 2
    X = rng.standard_normal((N, D))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    Z = X[:8].copy()
    kernels = [dsd.RBF.make(D), dsd.RBF.make(D)]
    model = dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.1),
                          num_samples=2)
    return model, X, Y


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    single = len(sys.argv) > 4 and sys.argv[4] == "single"

    import jax

    jax.config.update("jax_enable_x64", True)

    from doubly_stochastic_dgp_tpu.parallel.mesh import (
        initialize_distributed, make_mesh, replicate)

    if single:
        assert not initialize_distributed()     # no-op path
    else:
        assert initialize_distributed(coord, num_processes=nproc,
                                      process_id=pid)
        assert jax.process_count() == nproc
    n_global = jax.device_count()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from doubly_stochastic_dgp_tpu.parallel.dp import dp_elbo
    from doubly_stochastic_dgp_tpu.training.loop import fit_dp

    model, X, Y = build_model()
    mesh = make_mesh()
    model = replicate(model, mesh)
    sharding = NamedSharding(mesh, P("data"))
    # each process contributes its local rows of the globally-sharded
    # batch; jax slices host-global numpy automatically on device_put
    Xg = jax.device_put(jnp.asarray(X, jnp.float64), sharding)
    Yg = jax.device_put(jnp.asarray(Y, jnp.float64), sharding)

    key = jax.random.PRNGKey(0)
    elbo = dp_elbo(model, Xg, Yg, key, mesh)
    elbo = float(jax.jit(lambda x: x)(elbo))

    m2, hist = fit_dp(model, mesh, iterations=6, learning_rate=0.01,
                      batch_size=16, seed=0, scan_steps=3, log_every=3)
    out = {"devices": n_global, "elbo": elbo,
           "final_loss": float(hist[-1]["loss"])}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
