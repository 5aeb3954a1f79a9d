"""Device mesh construction and sharding helpers.

The reference has zero distributed components (single-process TF1,
SURVEY §2.4); here data parallelism is a first-class TPU-native
capability: a 1-D (or N-D) ``jax.sharding.Mesh``, parameters replicated,
the minibatch N axis (and the MC sample S axis for prediction) sharded,
with XLA collectives (psum) riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_along", "shard_chains",
           "pad_to_multiple", "initialize_distributed"]


def make_mesh(num_devices: Optional[int] = None, axis: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_along(x, mesh: Mesh, axis: str = "data", dim: int = 0):
    """Shard array ``x`` along logical mesh axis ``axis`` at dim ``dim``."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_chains(mesh: Mesh, chain_axis: Optional[str], num_chains: int,
                 *arrays):
    """Place each array's leading (chain) dim sharded over ``mesh``.

    For embarrassingly chain-parallel MCMC (``training.hmc`` /
    ``training.nuts``): chains are independent, so the chain axis
    shards with no per-step collectives.  ``num_chains`` must divide
    the mesh axis size."""
    ax = chain_axis or mesh.axis_names[0]
    if num_chains % mesh.shape[ax] != 0:
        raise ValueError(
            f"num_chains={num_chains} must divide by mesh axis "
            f"'{ax}' size {mesh.shape[ax]}")
    return tuple(
        jax.device_put(a, NamedSharding(
            mesh, P(*([ax] + [None] * (a.ndim - 1)))))
        for a in arrays)


def pad_to_multiple(X, m: int, axis: int = 0):
    """Pad X along ``axis`` (repeating the last row) so its size is a
    multiple of m.  Returns (padded, original_size)."""
    n = X.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return X, n
    pad_idx = [slice(None)] * X.ndim
    pad_idx[axis] = slice(n - 1, n)
    import jax.numpy as jnp
    pad = jnp.repeat(X[tuple(pad_idx)], rem, axis=axis)
    return jnp.concatenate([X, pad], axis=axis), n


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host runtime init (JAX distributed).  No-op if single
    process args are absent — ICI collectives inside one slice need no
    setup."""
    if coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
