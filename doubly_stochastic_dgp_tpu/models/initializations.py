"""Layer-stack construction: PCA/identity skip connections and the
input-propagation variant.

Rebuilds /root/reference/doubly_stochastic_dgp/layer_initializations.py:
  - dim-matched layers get an Identity mean function (:31)
  - stepping down uses the PCA projection W = V[:dim_out]^T from the SVD
    of the running inputs (:34-37)
  - stepping up uses [I | 0] padding (:38-39)
  - the Linear(W) mean function is frozen (:41-42) and the running
    X/Z are projected forward to initialize deeper inducing points (:46-48)
All of this is host-side numpy at build time (no device work).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import default_float
from .layers import SVGPLayer
from .mean_functions import Identity, Linear, Zero

__all__ = ["init_layers_linear", "init_layers_input_prop"]


def init_layers_linear(X, Y, Z, kernels, num_outputs=None,
                       mean_function=None, Layer=SVGPLayer, white=False):
    X = np.asarray(X, dtype=default_float())
    Y = np.asarray(Y)
    Z = np.asarray(Z, dtype=default_float())
    num_outputs = num_outputs or Y.shape[1]
    if mean_function is None:
        mean_function = Zero(output_dim=num_outputs)

    layers = []
    X_running, Z_running = X.copy(), Z.copy()
    for kern_in, kern_out in zip(kernels[:-1], kernels[1:]):
        dim_in = kern_in.input_dim
        dim_out = kern_out.input_dim
        if dim_in == dim_out:
            mf = Identity()
        else:
            if dim_in > dim_out:  # stepping down: PCA projection
                _, _, V = np.linalg.svd(X_running, full_matrices=False)
                W = V[:dim_out, :].T
            else:                 # stepping up: identity + zero padding
                W = np.concatenate(
                    [np.eye(dim_in), np.zeros((dim_in, dim_out - dim_in))], 1)
            mf = Linear.make(W, trainable=False)

        layers.append(Layer.make(kern_in, Z_running, dim_out, mf,
                                 white=white))

        if dim_in != dim_out:
            Z_running = Z_running.dot(W)
            X_running = X_running.dot(W)

    layers.append(Layer.make(kernels[-1], Z_running, num_outputs,
                             mean_function, white=white))
    return layers


def init_layers_input_prop(X, Y, Z, kernels, num_outputs=None,
                           mean_function=None, Layer=SVGPLayer, white=False,
                           rng: Optional[np.random.RandomState] = None):
    """Input-propagation stack: every layer sees the raw input
    concatenated; inducing points are padded with kernel-scaled noise
    (reference layer_initializations.py:55-79)."""
    X = np.asarray(X, dtype=default_float())
    Y = np.asarray(Y)
    Z = np.asarray(Z, dtype=default_float())
    num_outputs = num_outputs or Y.shape[1]
    if mean_function is None:
        mean_function = Zero(output_dim=num_outputs)
    rng = rng or np.random.RandomState(0)
    D = X.shape[1]
    M = Z.shape[0]

    layers = []
    for kern_in, kern_out in zip(kernels[:-1], kernels[1:]):
        dim_in = kern_in.input_dim
        dim_out = kern_out.input_dim - D
        std_in = float(np.asarray(kern_in.variance.value)) ** 0.5
        pad = rng.randn(M, dim_in - D) * 2.0 * std_in
        Z_padded = np.concatenate([Z, pad], 1)
        layers.append(Layer.make(kern_in, Z_padded, dim_out,
                                 Zero(output_dim=dim_out), white=white,
                                 input_prop_dim=D))

    dim_in = kernels[-1].input_dim
    std_in = (float(np.asarray(kernels[-2].variance.value)) ** 0.5
              if dim_in > D else 1.0)
    pad = rng.randn(M, dim_in - D) * 2.0 * std_in
    Z_padded = np.concatenate([Z, pad], 1)
    layers.append(Layer.make(kernels[-1], Z_padded, num_outputs,
                             mean_function, white=white))
    return layers
