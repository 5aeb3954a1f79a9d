#!/usr/bin/env python
"""Collapsed-DGP demo (BASELINE config #5; reference model_zoo.py +
tests/test_collapsed.py workflow): on a small regression problem, train a
2-layer DGP whose final layer is analytically collapsed (SGPR, Titsias /
uncertain-input bound), and show the natural-gradient identity: one
gamma=1 natgrad step on the equivalent quadrature model's final layer
reproduces the collapsed bound exactly."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import doubly_stochastic_dgp_tpu as dsd

    # collapsed/dense bounds are small-N exact computations: use f64
    # where the backend supports it (falls back to f32 on TPU)
    dsd.set_default_float("float64")
    dsd.set_default_jitter(1e-10)
    from doubly_stochastic_dgp_tpu.models.layers import SGPRLayer
    from doubly_stochastic_dgp_tpu.models.mean_functions import Zero
    from doubly_stochastic_dgp_tpu.training.natgrad import NaturalGradient
    from doubly_stochastic_dgp_tpu.training.optim import (lbfgs_minimize,
                                                          masked_optimizer)

    rng = np.random.RandomState(0)
    N, M, D = 40, 12, 1
    X = rng.rand(N, D) * 2 - 1
    Y = np.sin(3 * X) + rng.randn(N, D) * 0.1
    Z = np.linspace(-1, 1, M)[:, None]

    def kerns():
        return [dsd.RBF.make(D, lengthscales=0.4),
                dsd.RBF.make(D, lengthscales=0.4)]

    layers = dsd.init_layers_linear(X, Y, Z, kerns())
    last = SGPRLayer.make(layers[-1].kern, np.asarray(layers[-1].Z.value),
                          1, layers[-1].mean_function)
    m_col = dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05),
                                  layers[:-1] + [last])

    # train the collapsed model: only the inner layer + hyperparams have
    # free variational/kernel parameters (the final layer is integrated
    # out analytically)
    key = jax.random.PRNGKey(0)

    def loss(m):
        return -m.elbo(key=key)

    l0 = float(loss(m_col))
    m_col, l1 = lbfgs_minimize(loss, m_col, max_iters=args.iterations)

    # the natgrad identity on the quadrature twin
    layers_ng = dsd.init_layers_linear(X, Y, Z, kerns())
    m_ng = dsd.DGPQuad.build(X, Y, dsd.Gaussian.make(0.05), layers_ng,
                             H=300)
    # copy the collapsed model's inner layer + final-layer kernel/Z +
    # likelihood (the identity requires identical hyperparameters)
    l1_ng = m_ng.layers[1].replace(kern=m_col.layers[1].kern,
                                   Z=m_col.layers[1].Z)
    m_ng = m_ng.replace(layers=[m_col.layers[0], l1_ng],
                        likelihood=m_col.likelihood)
    m_ng2 = NaturalGradient(gamma=1.0, var_layers=(-1,)).step(
        m_ng, lambda m: -m.elbo())

    out = {
        "collapsed_bound_init": -l0,
        "collapsed_bound_trained": -l1,
        "quad_bound_after_one_natgrad_step": float(m_ng2.elbo()),
        "identity_gap": abs(float(m_ng2.elbo()) + l1),
    }
    print(json.dumps(out, indent=2))
    # the residual gap after free hyperparameter training comes from
    # Gauss-Hermite truncation of the (now wide) inner distribution and
    # jitter placement differences; it must be tiny relative to the
    # training improvement
    assert out["identity_gap"] < 0.05 * (l0 - l1)


if __name__ == "__main__":
    main()
