"""DGPDamianou: the fully-collapsed deep GP of Damianou & Lawrence
(AISTATS 2013), with variational uncertainty propagated through every
layer by psi statistics instead of Monte-Carlo samples.

The reference left this model as a literal TODO stub
(/root/reference/doubly_stochastic_dgp/model_zoo.py:91-104); this is the
completed inference, built from the same pieces the reference uses for
its collapsed SGPR layer (layers.py:345-450):

  generative model        H_0 = X,  H_l = f_l(H_{l-1}) + eps_l,
                          eps_l ~ N(0, sigma_l^2 I),  Y = H_L
  variational posterior   q(H_l) = prod_{n,d} N(h | m_l[n,d], s_l[n,d])
                          for l = 1..L-1; inducing outputs collapsed
                          analytically (Titsias) per layer.

Bound (eq. 10-13 of the paper, rearranged):

  log p(Y|X) >= sum_l E_{q(H_{l-1}), q(H_l)}[ g_l ]  +  sum_l H(q(H_l))

where g_l is the uncertain-input Titsias bound of layer l
(SGPRLayer.build_likelihood, reference layers.py:371-450) and the
expectation over the layer's *random outputs* H_l has the closed form
used below: g_l is quadratic in its targets Y (the only Y-dependent
terms are -||Y||^2/(2 sigma^2) and +||c||^2/2 with c linear in Y), so

  E_{Y ~ N(m, diag(s))}[ g_l(Y) ]
      = g_l(m) - sum_{n,d} s[n,d] / (2 sigma^2)
              + (1/2) sum_{n,d} [G^T G]_{nn} s[n,d],
  G = LB^{-1} A / sigma      (the linear map Y -> c inside the bound).

Everything is batched linear algebra on (M, M)/(M, N) blocks — Cholesky
+ triangular solves + MXU matmuls — and jits end-to-end; training is
full-batch (the bound is not a sum of independent per-datum terms),
exactly like DGPCollapsed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float
from ..ops.likelihoods import Gaussian
from ..ops.linalg import tri_solve
from ..utils.modules import Param
from .dgp import DGPBase
from .initializations import _linear_projection
from .layers import SGPRLayer
from .mean_functions import Zero

__all__ = ["DGPDamianou"]


class DGPDamianou(DGPBase):
    """Deep GP with every layer analytically collapsed and hidden-state
    uncertainty carried by explicit q(H_l) = N(m_l, diag(s_l))
    variational parameters (Damianou & Lawrence 2013).

    Extra variational state beyond DGPBase:
      h_mean[l]  Param (N, D_{l+1})  mean of q(H_{l+1}),  l = 0..L-2
      h_var[l]   Param (N, D_{l+1})  per-point diagonal variance
      noise[l]   Param ()            inner-layer noise sigma_{l+1}^2
    The top layer's noise is the Gaussian likelihood's variance.
    """

    full_batch_bound = True     # q(H) has one row per training point

    h_mean: Any = None
    h_var: Any = None
    noise: Any = None

    @classmethod
    def build(cls, X, Y, Z, kernels, likelihood, inner_noise=1e-2,
              h_var_init=1e-2, num_samples=1, num_data=None,
              mean_function=None):
        """Construct the stack.  Hidden width of layer l is
        kernels[l+1].input_dim (as in DGP.build); hidden means are
        initialized by the running PCA/identity projections of X (the
        init_layers_linear convention), inducing inputs by the projected
        Z, hidden variances by ``h_var_init``."""
        assert isinstance(likelihood, Gaussian), (
            "DGPDamianou collapses Gaussian layer conditionals; the "
            "likelihood must be Gaussian")
        dtype = default_float()
        X = np.asarray(X, dtype=dtype)
        Y = np.asarray(Y, dtype=dtype)
        Z = np.asarray(Z, dtype=dtype)
        num_outputs = Y.shape[1]
        widths_in = [k.input_dim for k in kernels]
        widths_out = widths_in[1:] + [num_outputs]

        layers, h_mean, h_var, noise = [], [], [], []
        inputs_running, inducing_running = X.copy(), Z.copy()
        for l, kern in enumerate(kernels):
            last = l == len(kernels) - 1
            d_in, d_out = widths_in[l], widths_out[l]
            mf = (mean_function or Zero(output_dim=num_outputs)) if last \
                else Zero(output_dim=d_out)
            layers.append(SGPRLayer.make(kern, inducing_running, d_out, mf))
            if not last:
                if d_in != d_out:
                    W = _linear_projection(d_in, d_out, inputs_running)
                    inputs_running = inputs_running @ W
                    inducing_running = inducing_running @ W
                h_mean.append(Param.create(inputs_running.copy()))
                h_var.append(Param.positive(
                    np.full_like(inputs_running, h_var_init)))
                noise.append(Param.positive(
                    np.asarray(inner_noise, dtype=dtype)))
        return cls.make(X, Y, likelihood, layers, num_samples=num_samples,
                        num_data=num_data, h_mean=h_mean, h_var=h_var,
                        noise=noise)

    # -- per-layer data under q ------------------------------------------------
    def _layer_data(self, l):
        """(X_mean, X_var, targets, noise_var) of layer ``l`` under q.
        X_var is None for the first layer (observed inputs -> the exact
        certain-input branch of the SGPR bound)."""
        last = l == len(self.layers) - 1
        mu = self.X_data if l == 0 else self.h_mean[l - 1].value
        sv = None if l == 0 else self.h_var[l - 1].value
        Yl = self.Y_data if last else self.h_mean[l].value
        var_l = (self.likelihood.variance.value if last
                 else self.noise[l].value)
        return mu, sv, Yl, var_l

    def _data_layers(self):
        return [layer.set_data(*self._layer_data(l))
                for l, layer in enumerate(self.layers)]

    # -- training objective ------------------------------------------------------
    def elbo(self, X=None, Y=None, key=None):
        """The Damianou-Lawrence collapsed bound.  Always evaluated on
        the full stored training set — q(H) has one row per training
        point, so the bound does not minibatch (same restriction as the
        paper and as DGPCollapsed)."""
        total = jnp.zeros((), dtype=default_float())
        L = len(self.layers)
        for l, layer in enumerate(self.layers):
            lay = layer.set_data(*self._layer_data(l))
            cm = lay._common()
            g = lay.build_likelihood(cm=cm)
            if l < L - 1:
                # E over the layer's random outputs H_{l+1} ~ q: the
                # bound is quadratic in its targets, so only the
                # variance corrections below survive beyond g(mean).
                s = self.h_var[l].value                       # (N, d)
                # same f32 floor as the bound itself (SGPRLayer
                # _bound_variance) so the correction and g use one
                # variance consistently
                var_l = lay._bound_variance()
                # highest matmul precision for the same reason as
                # SGPRLayer._common (f64 reference; bf16-class default
                # corrupts the small-matrix algebra on TPU)
                with jax.default_matmul_precision("highest"):
                    G = tri_solve(cm["LB"], cm["A"], lower=True,
                                  mode=layer.solve_mode) / jnp.sqrt(var_l)
                diagGtG = jnp.sum(G ** 2, axis=0)             # (N,)
                g = g - 0.5 * jnp.sum(s) / var_l \
                      + 0.5 * jnp.sum(diagGtG[:, None] * s)
                # + entropy of q(H_{l+1})
                g = g + 0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * jnp.e * s))
            total = total + g
        return total

    # -- prediction ----------------------------------------------------------------
    def propagate(self, X, key=None, full_cov=False, S=1, zs=None):
        """Sample new points through the per-layer collapsed posteriors.

        Inner layers add their noise variance sigma_l^2 to the sampled
        conditional (the next layer consumes H_l = f_l + eps_l, matching
        the generative model the bound was derived for); the top layer
        returns the noiseless f posterior — predict_y adds the
        likelihood variance, as everywhere else in the framework."""
        from ..ops.linalg import reparameterize

        key = key if key is not None else jax.random.PRNGKey(0)
        layers = self._data_layers()
        L = len(layers)
        F = jnp.tile(X[None, :, :], (S, 1, 1))
        if zs is None:
            zs = [None] * L
        keys = jax.random.split(key, L)
        Fs, Fmeans, Fvars = [], [], []
        for l, (layer, z) in enumerate(zip(layers, zs)):
            mean, var = layer.conditional_SND(F, full_cov=full_cov)
            if l < L - 1:
                var_l = self.noise[l].value
                if full_cov:                       # (S, N, N, D) diagonal
                    N = var.shape[1]
                    var = var + (var_l
                                 * jnp.eye(N, dtype=var.dtype)[None, :, :,
                                                               None])
                else:
                    var = var + var_l
            if z is None:
                z = jax.random.normal(keys[l], mean.shape, dtype=mean.dtype)
            else:
                z = jnp.broadcast_to(jnp.asarray(z, dtype=mean.dtype),
                                     mean.shape)
            F = reparameterize(mean, var, z, full_cov=full_cov,
                               jitter=layer.jitter)
            Fs.append(F)
            Fmeans.append(mean)
            Fvars.append(var)
        return Fs, Fmeans, Fvars
