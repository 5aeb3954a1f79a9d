"""Layer-stack construction: PCA/identity skip connections and the
input-propagation variant.

Provides the capability of
/root/reference/doubly_stochastic_dgp/layer_initializations.py:
dim-matched inner layers get an Identity mean function; narrowing layers
get a frozen PCA projection; widening layers get frozen
identity-plus-zero padding; the running inputs/inducing points are
projected forward so deeper layers are initialized in the projected
space.  All of this is host-side numpy at build time (no device work).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import default_float
from .layers import SVGPLayer
from .mean_functions import Identity, Linear, Zero

__all__ = ["init_layers_linear", "init_layers_input_prop"]


def _linear_projection(dim_in: int, dim_out: int,
                       running_inputs: np.ndarray) -> np.ndarray:
    """(dim_in, dim_out) inter-layer projection for mismatched widths.

    Narrowing uses the top principal directions of the running inputs
    (right singular vectors); widening embeds the identity and pads the
    new coordinates with zeros.  (Capability of reference
    layer_initializations.py:34-39.)
    """
    if dim_in > dim_out:
        _, _, vt = np.linalg.svd(running_inputs, full_matrices=False)
        return np.ascontiguousarray(vt[:dim_out].T)
    return np.pad(np.eye(dim_in), ((0, 0), (0, dim_out - dim_in)))


def init_layers_linear(X, Y, Z, kernels, num_outputs=None,
                       mean_function=None, Layer=SVGPLayer, white=False):
    """Build the paper's SVGP stack with linear/PCA skip connections.

    Layer l maps width kernels[l].input_dim -> kernels[l+1].input_dim
    (the last layer maps to ``num_outputs`` with the user mean function).
    Frozen Linear mean functions carry the projections; the running X/Z
    are pushed through each projection to seed deeper inducing points.
    """
    dtype = default_float()
    X = np.asarray(X, dtype=dtype)
    Y = np.asarray(Y)
    num_outputs = num_outputs or Y.shape[1]
    if mean_function is None:
        mean_function = Zero(output_dim=num_outputs)

    widths_in = [k.input_dim for k in kernels]
    widths_out = widths_in[1:] + [num_outputs]

    inputs_running = np.array(X, dtype=dtype)
    inducing_running = np.asarray(Z, dtype=dtype).copy()
    layers = []
    for l, kern in enumerate(kernels):
        last = l == len(kernels) - 1
        d_in, d_out = widths_in[l], widths_out[l]
        project = None
        if last:
            mf = mean_function
        elif d_in == d_out:
            mf = Identity()
        else:
            project = _linear_projection(d_in, d_out, inputs_running)
            mf = Linear.make(project, trainable=False)
        layers.append(Layer.make(kern, inducing_running, d_out, mf,
                                 white=white))
        if project is not None:
            inputs_running = inputs_running @ project
            inducing_running = inducing_running @ project
    return layers


def _noise_padded_inducing(Z: np.ndarray, target_width: int,
                           kern_std: float,
                           rng: np.random.RandomState) -> np.ndarray:
    """Pad inducing inputs out to ``target_width`` with random
    coordinates scaled by twice the kernel amplitude (the extra
    coordinates live in sampled-output space, whose scale is set by the
    kernel; capability of reference layer_initializations.py:69-78)."""
    extra = target_width - Z.shape[1]
    if extra == 0:
        return Z
    noise = rng.randn(Z.shape[0], extra) * (2.0 * kern_std)
    return np.concatenate([Z, noise], axis=1)


def init_layers_input_prop(X, Y, Z, kernels, num_outputs=None,
                           mean_function=None, Layer=SVGPLayer, white=False,
                           rng: Optional[np.random.RandomState] = None):
    """Input-propagation stack: every layer sees the raw D input dims
    concatenated onto the previous layer's samples, so layer l takes
    width D + hidden_{l-1} and its inducing inputs need noise padding in
    the hidden coordinates."""
    dtype = default_float()
    X = np.asarray(X, dtype=dtype)
    Y = np.asarray(Y)
    Z = np.asarray(Z, dtype=dtype)
    num_outputs = num_outputs or Y.shape[1]
    if mean_function is None:
        mean_function = Zero(output_dim=num_outputs)
    rng = rng or np.random.RandomState(0)
    D = X.shape[1]

    def amplitude(kern):
        return float(np.asarray(kern.variance.value)) ** 0.5

    layers = []
    for l, kern in enumerate(kernels):
        last = l == len(kernels) - 1
        width = kern.input_dim
        if last:
            d_out, mf, prop = num_outputs, mean_function, None
            # hidden-coordinate scale comes from the previous kernel
            std = amplitude(kernels[l - 1]) if width > D else 1.0
        else:
            d_out = kernels[l + 1].input_dim - D
            mf, prop = Zero(output_dim=d_out), D
            std = amplitude(kern)
        Zl = _noise_padded_inducing(Z, width, std, rng)
        layers.append(Layer.make(kern, Zl, d_out, mf, white=white,
                                 input_prop_dim=prop))
    return layers
