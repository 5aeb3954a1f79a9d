"""TPU probe: compile + run the fused conditional fwd/bwd kernels with
bench-like shapes.  Usage: python scripts/probe_fused.py"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from doubly_stochastic_dgp_tpu.ops.pallas.conditional import (
    _fused_backward, _fused_forward)

rng = np.random.RandomState(0)
B, M, Dx, Do = 1024, 100, 8, 8
Xs = jnp.asarray(rng.randn(B, Dx), jnp.float32)
Zs = jnp.asarray(rng.randn(M, Dx), jnp.float32)
alpha = jnp.asarray(rng.randn(M, Do), jnp.float32)
W = jnp.asarray(rng.randn(Do, M, M), jnp.float32)
kvar = jnp.float32(1.0)
kdiag = jnp.float32(1.0)

t0 = time.time()
m, v = jax.jit(lambda *a: _fused_forward(*a))(Xs, Zs, alpha, W, kvar, kdiag)
m.block_until_ready()
print("fwd ok", round(time.time() - t0, 1), float(m.sum()), flush=True)

gm = jnp.ones((B, Do), jnp.float32)
gv = jnp.ones((B, Do), jnp.float32)
t0 = time.time()
outs = jax.jit(lambda *a: _fused_backward(*a))(Xs, Zs, alpha, W, kvar, gm,
                                               gv)
outs[0].block_until_ready()
print("bwd ok", round(time.time() - t0, 1), flush=True)
