#!/usr/bin/env python
"""Natural-gradients demo (reference demos/using_natural_gradients.ipynb):
on a 1D toy problem, compare Adam-only against the alternating
NatGrad(final layer) + Adam loop — natgrad converges the variational
distribution dramatically faster (reference UCI nb cell 17 showed ~50x
fewer iterations to the same bound)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=300)
    p.add_argument("--gamma", type=float, default=1.0)
    args = p.parse_args()

    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.training.loop import fit

    rng = np.random.RandomState(0)
    N = 60
    X = rng.rand(N, 1) * 2 - 1
    Y = np.sin(3 * X) + rng.randn(N, 1) * 0.1
    Z = np.linspace(-1, 1, 20)[:, None]

    def build():
        kernels = [dsd.RBF.make(1, lengthscales=0.3),
                   dsd.RBF.make(1, lengthscales=0.3)]
        return dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.05),
                             num_samples=5)

    m_adam, h_adam = fit(build(), args.iterations, learning_rate=0.01,
                         log_every=50)
    m_ng, h_ng = fit(build(), args.iterations, learning_rate=0.01,
                     natgrad_gamma=args.gamma, log_every=50)

    print(json.dumps({
        "adam_only_loss": h_adam[-1]["loss"],
        "natgrad_adam_loss": h_ng[-1]["loss"],
        "natgrad_better_by": h_adam[-1]["loss"] - h_ng[-1]["loss"],
    }, indent=2))


if __name__ == "__main__":
    main()
