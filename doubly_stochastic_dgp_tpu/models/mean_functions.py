"""Mean functions: Zero, Identity, Linear, Constant.

Rebuilds gpflow.mean_functions as used by the reference
(/root/reference/doubly_stochastic_dgp/layer_initializations.py:31,41,
dgp.py:186): Identity for dim-matched inner layers, frozen Linear(W) for
the PCA/padding skip connections, Zero for the final layer.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..config import default_float
from ..utils.modules import Module, Param, static_field

__all__ = ["MeanFunction", "Zero", "Identity", "Linear", "Constant"]


class MeanFunction(Module):
    def __call__(self, X):
        raise NotImplementedError


class Zero(MeanFunction):
    output_dim: int = static_field(default=1)

    def __call__(self, X):
        return jnp.zeros((*X.shape[:-1], self.output_dim), dtype=X.dtype)


class Identity(MeanFunction):
    def __call__(self, X):
        return X


class Linear(MeanFunction):
    """f(X) = X W + b.  W: (D_in, D_out); b: (D_out,)."""

    W: Param = None
    b: Param = None

    @classmethod
    def make(cls, W, b=None, trainable=True):
        W = jnp.asarray(W, dtype=default_float())
        if b is None:
            b = jnp.zeros((W.shape[1],), dtype=default_float())
        return cls(W=Param.create(W, trainable=trainable),
                   b=Param.create(b, trainable=trainable))

    def __call__(self, X):
        return X @ self.W.value + self.b.value


class Constant(MeanFunction):
    c: Param = None

    @classmethod
    def make(cls, c, trainable=True):
        return cls(c=Param.create(jnp.atleast_1d(
            jnp.asarray(c, dtype=default_float())), trainable=trainable))

    def __call__(self, X):
        c = self.c.value
        return jnp.broadcast_to(c, (*X.shape[:-1], c.shape[-1]))
