"""Single-layer GP models: GPR (exact), SGPR (collapsed Titsias), SVGP
(uncollapsed variational), and GPRFITC.

These are the baselines the reference's UCI notebook compares the DGP
against (demo_regression_UCI.ipynb cell 3: gpflow's GPR/SGPR/SVGP/
GPRFITC) — part of the effective capability surface (SURVEY §6).  Each
is a thin model over the shared layer/conditional machinery; FITC adds
its own heteroscedastic-nugget marginal.

All models expose: log_likelihood() (the training objective; ELBO or
exact marginal), elbo() alias, predict_f / predict_f_full_cov /
predict_y / predict_density, and work with the generic training loops
(training.loop.fit operates on .elbo via X_data/Y_data buffers).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from ..config import default_float
from ..ops.likelihoods import Gaussian, Likelihood
from ..ops.linalg import add_jitter, mvn_logpdf, safe_cholesky, tri_solve
from ..utils.modules import Module, Param, static_field
from .layers import GPRLayer, SGPRLayer, SVGPLayer
from .mean_functions import Zero
from .dgp import DGPBase


class SVGP(DGPBase):
    """Sparse variational GP (Hensman et al.): exactly a 1-layer DGP —
    the bound has no MC error for a single layer because the final
    conditional moments are deterministic."""

    @classmethod
    def build(cls, X, Y, kern, likelihood, Z, num_latent=None, white=True,
              mean_function=None, num_data=None):
        X = np.asarray(X)
        Y = np.asarray(Y)
        num_latent = num_latent or Y.shape[1]
        layer = SVGPLayer.make(kern, Z, num_latent,
                               mean_function or Zero(output_dim=num_latent),
                               white=white)
        return cls.make(X, Y, likelihood, [layer], num_samples=1,
                        num_data=num_data)

    def log_likelihood(self, X=None, Y=None):
        return self.elbo(X, Y, key=jax.random.PRNGKey(0))

    # single layer: conditional moments are deterministic, S defaults to 1
    def predict_f(self, Xnew, S=1, key=None):
        return super().predict_f(Xnew, S, key)

    def predict_f_full_cov(self, Xnew, S=1, key=None):
        return super().predict_f_full_cov(Xnew, S, key)

    def predict_y(self, Xnew, S=1, key=None):
        m, v = super().predict_y(Xnew, S, key)
        return m[0], v[0]

    def predict_density(self, Xnew, Ynew, S=1, key=None):
        return super().predict_density(Xnew, Ynew, S, key)


class GPR(Module):
    """Exact GP regression (the gpflow GPR oracle of the reference
    tests; built on GPRLayer's collapsed marginal, reference
    layers.py:310-342)."""

    full_batch_bound = True    # exact/collapsed marginal: no minibatching

    layer: GPRLayer = None
    likelihood: Gaussian = None
    X_data: Any = None
    Y_data: Any = None

    @classmethod
    def build(cls, X, Y, kern, mean_function=None, noise_variance=1.0):
        X = jnp.asarray(X, dtype=default_float())
        Y = jnp.asarray(Y, dtype=default_float())
        mf = mean_function or Zero(output_dim=Y.shape[1])
        layer = GPRLayer.make(kern, mf, Y.shape[1])
        return cls(layer=layer, likelihood=Gaussian.make(noise_variance),
                   X_data=X, Y_data=Y)

    def _bound_layer(self):
        return self.layer.set_data(self.X_data, None, self.Y_data,
                                   self.likelihood.variance.value)

    def log_likelihood(self, X=None, Y=None, key=None):
        return self._bound_layer().build_likelihood()

    elbo = log_likelihood

    def predict_f(self, Xnew, full_cov=False):
        return self._bound_layer().conditional_ND(jnp.asarray(Xnew),
                                                  full_cov=full_cov)

    def predict_f_full_cov(self, Xnew):
        return self.predict_f(Xnew, full_cov=True)

    def predict_y(self, Xnew, S=None, key=None):
        del S, key  # deterministic predictive; uniform API with DGPBase
        m, v = self.predict_f(Xnew)
        return self.likelihood.predict_mean_and_var(m, v)

    def predict_density(self, Xnew, Ynew, S=None, key=None):
        del S, key
        m, v = self.predict_f(Xnew)
        return self.likelihood.predict_density(m, v, jnp.asarray(Ynew))


class SGPR(Module):
    """Collapsed sparse GP regression (Titsias bound; built on
    SGPRLayer, reference layers.py:345-402)."""

    full_batch_bound = True    # exact/collapsed marginal: no minibatching

    layer: SGPRLayer = None
    likelihood: Gaussian = None
    X_data: Any = None
    Y_data: Any = None

    @classmethod
    def build(cls, X, Y, kern, Z, mean_function=None, noise_variance=1.0):
        X = jnp.asarray(X, dtype=default_float())
        Y = jnp.asarray(Y, dtype=default_float())
        mf = mean_function or Zero(output_dim=Y.shape[1])
        layer = SGPRLayer.make(kern, np.asarray(Z), Y.shape[1], mf)
        return cls(layer=layer, likelihood=Gaussian.make(noise_variance),
                   X_data=X, Y_data=Y)

    def _bound_layer(self):
        return self.layer.set_data(self.X_data, None, self.Y_data,
                                   self.likelihood.variance.value)

    def log_likelihood(self, X=None, Y=None, key=None):
        return self._bound_layer().build_likelihood()

    elbo = log_likelihood

    def predict_f(self, Xnew, full_cov=False):
        return self._bound_layer().conditional_ND(jnp.asarray(Xnew),
                                                  full_cov=full_cov)

    def predict_f_full_cov(self, Xnew):
        return self.predict_f(Xnew, full_cov=True)

    def predict_y(self, Xnew, S=None, key=None):
        del S, key  # deterministic predictive; uniform API with DGPBase
        m, v = self.predict_f(Xnew)
        return self.likelihood.predict_mean_and_var(m, v)

    def predict_density(self, Xnew, Ynew, S=None, key=None):
        del S, key
        m, v = self.predict_f(Xnew)
        return self.likelihood.predict_density(m, v, jnp.asarray(Ynew))


class GPRFITC(Module):
    """FITC sparse GP regression (Snelson & Ghahramani): exact marginal
    of N(0, Qff + diag(Kff - Qff) + sigma^2 I) via Woodbury — the
    gpflow GPRFITC baseline of the UCI notebook.

    With G = diag(Kff - Qff + sigma^2) and A = L^{-1} Kuf:
      bound per column = log N(y; m(X), A^T A + G)
    computed through B = I + (A/sqrt(g)) (A/sqrt(g))^T.
    """

    full_batch_bound = True    # exact/collapsed marginal: no minibatching

    kern: Any = None
    Z: Param = None
    mean_function: Any = None
    likelihood: Gaussian = None
    X_data: Any = None
    Y_data: Any = None
    jitter: float = static_field(default=1e-6)

    @classmethod
    def build(cls, X, Y, kern, Z, mean_function=None, noise_variance=1.0,
              jitter=None):
        from ..config import default_jitter
        X = jnp.asarray(X, dtype=default_float())
        Y = jnp.asarray(Y, dtype=default_float())
        mf = mean_function or Zero(output_dim=Y.shape[1])
        return cls(kern=kern,
                   Z=Param.create(np.asarray(Z, dtype=default_float())),
                   mean_function=mf,
                   likelihood=Gaussian.make(noise_variance),
                   X_data=X, Y_data=Y,
                   jitter=(default_jitter() if jitter is None
                           else float(jitter)))

    def _common(self):
        X, Y = self.X_data, self.Y_data
        Z = self.Z.value
        M = Z.shape[0]
        sigma2 = self.likelihood.variance.value
        L = safe_cholesky(self.kern.K(Z), self.jitter)
        Kuf = self.kern.K(Z, X)                        # (M, N)
        A = tri_solve(L, Kuf, lower=True)              # (M, N)
        Qff = jnp.sum(A ** 2, axis=0)                  # (N,)
        g = self.kern.Kdiag(X) - Qff + sigma2          # (N,) nugget
        As = A / jnp.sqrt(g)[None, :]                  # (M, N)
        B = As @ As.T + jnp.eye(M, dtype=A.dtype)
        LB = jnp.linalg.cholesky(B)
        err = Y - self.mean_function(X)                # (N, D)
        Aerr = As @ (err / jnp.sqrt(g)[:, None])       # (M, D)
        c = tri_solve(LB, Aerr, lower=True)            # (M, D)
        return dict(L=L, LB=LB, c=c, g=g, err=err)

    def log_likelihood(self, X=None, Y=None, key=None):
        cm = self._common()
        g, LB, c, err = cm["g"], cm["LB"], cm["c"], cm["err"]
        N, D = err.shape
        ll = -0.5 * N * D * jnp.log(2 * jnp.pi)
        ll -= 0.5 * D * jnp.sum(jnp.log(g))
        ll -= D * jnp.sum(jnp.log(jnp.diagonal(LB)))
        ll -= 0.5 * jnp.sum(err ** 2 / g[:, None])
        ll += 0.5 * jnp.sum(c ** 2)
        return ll

    elbo = log_likelihood

    def predict_f(self, Xnew, full_cov=False):
        cm = self._common()
        L, LB, c = cm["L"], cm["LB"], cm["c"]
        Xnew = jnp.asarray(Xnew)
        Kus = self.kern.K(self.Z.value, Xnew)          # (M, Ns)
        tmp1 = tri_solve(L, Kus, lower=True)
        tmp2 = tri_solve(LB, tmp1, lower=True)
        mean = tmp2.T @ c + self.mean_function(Xnew)
        D = self.Y_data.shape[1]
        if full_cov:
            var = (self.kern.K(Xnew) + tmp2.T @ tmp2 - tmp1.T @ tmp1)
            var = jnp.repeat(var[:, :, None], D, axis=2)
        else:
            var = (self.kern.Kdiag(Xnew) + jnp.sum(tmp2 ** 2, axis=0)
                   - jnp.sum(tmp1 ** 2, axis=0))
            # same zero clamp as the GPR/SGPR collapsed layers' diag
            # branch: under f32 cancellation the residual can go
            # (roundoff-)negative, and the cached-posterior path
            # (models/posterior.py) clamps — keep live == cached.
            var = jnp.maximum(var, 0.0)
            var = jnp.repeat(var[:, None], D, axis=1)
        return mean, var

    def predict_f_full_cov(self, Xnew):
        return self.predict_f(Xnew, full_cov=True)

    def predict_y(self, Xnew, S=None, key=None):
        del S, key  # deterministic predictive; uniform API with DGPBase
        m, v = self.predict_f(Xnew)
        return self.likelihood.predict_mean_and_var(m, v)

    def predict_density(self, Xnew, Ynew, S=None, key=None):
        del S, key
        m, v = self.predict_f(Xnew)
        return self.likelihood.predict_density(m, v, jnp.asarray(Ynew))
