#!/usr/bin/env python
"""DGP prior-sample demo (reference demos/priors.ipynb): draw correlated
full-covariance samples from an untrained deep GP by passing fixed
whitened z through propagate (the reference's DGP_with_z subclass,
priors.ipynb cell 5, is just the ``zs`` argument here), including the
great-circle interpolation trick for smooth animations."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def great_circle(z0, z1, t):
    """Spherically interpolate two standard-normal draws — every point
    on the path is marginally N(0,1)."""
    return z0 * np.cos(t) + z1 * np.sin(t)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import doubly_stochastic_dgp_tpu as dsd

    # full-covariance sampling over a dense grid needs a healthier jitter
    # in float32
    dsd.set_default_jitter(1e-4)

    N = 101
    X = np.linspace(-1, 1, N)[:, None]
    Z = np.linspace(-1, 1, 20)[:, None]
    kernels = [dsd.RBF.make(1, lengthscales=0.3)
               for _ in range(args.layers)]
    model = dsd.DGP.build(X, X, Z, kernels, dsd.Gaussian.make(0.01),
                          num_samples=1)

    rng = np.random.RandomState(0)
    S = 1
    z0 = [rng.randn(S, N, l.num_outputs) for l in model.layers]
    z1 = [rng.randn(S, N, l.num_outputs) for l in model.layers]

    frames = []
    for i in range(args.frames):
        t = 2 * np.pi * i / args.frames
        zs = [jnp.asarray(great_circle(a, b, t),
                          dtype=jnp.asarray(model.X_data).dtype)
              for a, b in zip(z0, z1)]
        Fs, _, _ = model.propagate(jnp.asarray(
            X, dtype=jnp.asarray(model.X_data).dtype),
            zs=zs, S=S, full_cov=True)
        frames.append(np.asarray(Fs[-1])[0, :, 0])

    frames = np.stack(frames)
    print(json.dumps({
        "frames": args.frames,
        "sample_range": [float(frames.min()), float(frames.max())],
        "frame_to_frame_rms": float(
            np.sqrt(np.mean(np.diff(frames, axis=0) ** 2))),
    }, indent=2))


if __name__ == "__main__":
    main()
