"""Precomputed-posterior (serving) cache for sparse variational layers.

The reference (and GPflow 1.x generally) re-runs the full conditional
pipeline — Kuu gram, Cholesky, triangular solves/inverse, staging
contractions — on *every* prediction call (reference layers.py:167-219
rebuilds `Lu` per graph; each `@autoflow` predict re-executes it).  For
training that cost is unavoidable (Z and q move every step), but at
serving time the parameters are frozen, so everything that depends only
on the parameters can be computed once and stored.  GPflow 2 later
introduced the same idea as ``model.posterior()``; here it is a pure
pytree-to-pytree transform, which makes the cached model jit-able,
exportable (serving.py StableHLO artifacts) and shardable like any
other model.

:func:`precompute` maps every SVGP-family layer (``SVGPLayer``,
``SGPMCLayer``) to a :class:`CachedSVGPLayer` holding the staged
factors, and (round-2 continuation) also covers the *collapsed* model
family — ``DGPCollapsed`` / ``DGPHeinonen`` / ``DGPDamianou`` — whose
live prediction path is far more expensive per request than SVGP's:
every ``conditional_ND`` re-runs the full collapsed factorization
(``SGPRLayer._common``: psi statistics over all N training rows +
two Choleskys; ``GPRLayer._chol``: an O(N^3) dense Cholesky).  The
collapsed conditionals all reduce to the same staged form

    mean = G^T alpha + m(X),   var = Kff - ||G||^2 (+ ||C^T G||^2)

with layer-specific factors:

    GPR    Z=X_data, Li = chol(Knn + sigma^2 I)^{-1}, alpha = Li err
    SGPR   Li = L^{-1}, alpha = LB^{-T} c, C = LB^{-T}  (per-request
           cost drops from O(N M^2 + M^3) to O(B M^2))
    GPMC   Z=X_fixed, Li = Lu^{-1}, alpha = q_mu (whitened)

``DGPDamianou``'s inner layers additionally carry the generative noise
sigma_l^2 (``extra_var``) so the generic sampling loop reproduces the
model's own ``propagate``.  For these models :func:`precompute` returns
a plain prediction-only ``DGPBase`` (the collapsed classes' overridden
``propagate``/``elbo`` need the live variational state).

    Li    = Lu^{-1}                      (M, M)
    alpha = Li q_mu   (q_mu if white)    (M, D)
    C     = Li q_sqrt (q_sqrt if white)  (D, M, M)   [None if q_sqrt is]

so a prediction needs only the cross-gram and pure MXU matmuls:

    G    = Li Kuf                        (M, B)
    mean = G^T alpha + m(X)
    var  = Kff - colsum(G*G) + colsum(H*H),   H = C^T G

— the same sum-of-squares staged form as the training-path
``solve_mode='inverse'`` branch (models/layers.py), so cached and live
predictions agree to float roundoff.  The O(M^3) Cholesky + inverse and
the O(M^2 D) staging disappear from the per-request cost; for small
serving batches (B ~ M) that is the dominant term.

The staging factors are computed once at HIGHEST matmul precision
(one-time cost); the per-request contractions follow the layer's
``precision`` tier exactly like the live path.

Cached layers are prediction-only: ``KL()`` raises, so accidentally
training a cached model fails loudly rather than silently optimizing
stale factors.  Cached arrays are bare buffers (not ``Param``), so
``trainable_mask`` is all-False over them.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import default_float
from ..utils.modules import Module, Param, static_field
from ..ops.linalg import inv_lower
from .layers import Layer, SVGPLayer
from .mean_functions import MeanFunction

__all__ = ["CachedSVGPLayer", "CachedSingleLayerGP", "precompute"]


class CachedSVGPLayer(Layer):
    """Prediction-only SVGP layer with precomputed staging factors.

    Built by :func:`precompute`; see the module docstring for the math.
    All array fields are bare buffers (no ``Param`` wrappers): the cache
    is a snapshot, not an optimizable state.
    """

    kern: Any = None
    Z: Any = None                 # (M, D_in) inducing inputs (buffer)
    Li: Any = None                # (M, M) Lu^{-1} (buffer)
    alpha: Any = None             # (M, D) staged mean head (buffer)
    C: Optional[Any] = None       # (D, M, M) staged cov factor or None
    # additive output noise sigma_l^2 (DGPDamianou inner layers: the
    # next layer consumes H_l = f_l + eps_l); None elsewhere
    extra_var: Optional[Any] = None
    mean_function: MeanFunction = None
    num_outputs_: int = static_field(default=1)
    input_prop_dim: Optional[int] = static_field(default=None)
    jitter: float = static_field(default=1e-6)
    precision: str = static_field(default="default")
    # tile a 1-column variance to num_outputs (the collapsed live
    # layers' repeat convention) so downstream shapes match exactly
    tile_var: bool = static_field(default=False)

    @property
    def num_outputs(self):
        return self.num_outputs_

    def KL(self):
        raise NotImplementedError(
            "CachedSVGPLayer is prediction-only: the staging factors are "
            "a frozen snapshot of (Z, kern, q_mu, q_sqrt).  Train the "
            "original model and re-run precompute().")

    def conditional_ND(self, X, full_cov=False):
        """Staged conditional from the cache (no Cholesky/inverse).

        Identical math (and, on the diag path, identical op sequence) to
        the live ``solve_mode='inverse'`` sum-of-squares branch at
        models/layers.py::SVGPLayer._conditional_ND_impl."""
        if self.precision == "highest" or (
                self.precision in ("mixed", "mixed_g", "mixed_high")
                and full_cov):
            with jax.default_matmul_precision("highest"):
                return self._impl(X, full_cov)
        return self._impl(X, full_cov)

    def _impl(self, X, full_cov):
        prec = (jax.lax.Precision.HIGHEST
                if self.precision == "mixed"
                else jax.lax.Precision.HIGH
                if self.precision == "mixed_high" else None)
        prec_g = (jax.lax.Precision.HIGHEST
                  if self.precision in ("mixed", "mixed_g")
                  else jax.lax.Precision.HIGH
                  if self.precision == "mixed_high" else None)
        Kuf = self.kern.K(self.Z, X)                           # (M, B)
        G = jnp.matmul(self.Li, Kuf, precision=prec_g)         # (M, B)
        mean = jnp.matmul(G.T, self.alpha, precision=prec)     # (B, D)
        if full_cov:
            Kff = self.kern.K(X)                               # (B, B)
            cov = Kff - G.T @ G                                # (B, B)
            if self.C is None:
                var = cov[:, :, None]                          # (B, B, 1)
            else:
                H = jnp.einsum("dim,ib->dmb", self.C, G)       # (D, M, B)
                var = cov[None] + jnp.einsum("dmb,dmc->dbc", H, H)
                var = jnp.transpose(var, (1, 2, 0))            # (B, B, D)
            var = self._tile(var)
            if self.extra_var is not None:
                B_ = var.shape[0]
                var = var + (self.extra_var
                             * jnp.eye(B_, dtype=var.dtype)[:, :, None])
            return mean + self.mean_function(X), var
        Kff = self.kern.Kdiag(X)                               # (B,)
        resid = Kff - jnp.sum(G * G, axis=0)                   # (B,)
        if self.C is None:
            var = resid[:, None]                               # (B, 1)
        else:
            D_, M_, _ = self.C.shape
            CT = jnp.swapaxes(self.C, -1, -2).reshape(D_ * M_, M_)
            H = (CT @ G).reshape(D_, M_, G.shape[1])           # (D, M, B)
            var = resid[:, None] + jnp.sum(H * H, axis=1).T    # (B, D)
        var = self._tile(jnp.maximum(var, 0.0))
        if self.extra_var is not None:
            var = var + self.extra_var
        return mean + self.mean_function(X), var

    def _tile(self, var):
        if self.tile_var and var.shape[-1] == 1 and self.num_outputs_ > 1:
            var = jnp.repeat(var, self.num_outputs_, axis=-1)
        return var


def _freeze_params(tree):
    """Mark every Param in the (sub)tree non-trainable: the cache is a
    snapshot of *all* the layer's parameters — moving the kernel (or a
    Linear mean fn) would silently invalidate Li/alpha/C."""
    return jax.tree_util.tree_map(
        lambda n: n.set_trainable(False) if isinstance(n, Param) else n,
        tree, is_leaf=lambda n: isinstance(n, Param))


def _cache_svgp(layer: SVGPLayer) -> CachedSVGPLayer:
    # One-time staging at HIGHEST precision — the cancellation-critical
    # contractions, same contract the 'mixed' tier pins on the live path.
    with jax.default_matmul_precision("highest"):
        _, Lu = layer._chol_Kuu()
        Li = inv_lower(Lu)
        if layer.white:
            alpha = layer.q_mu.value
            C = None if layer.q_sqrt is None else layer.q_sqrt.value
        else:
            alpha = Li @ layer.q_mu.value
            C = (None if layer.q_sqrt is None
                 else jnp.einsum("ij,djk->dik", Li, layer.q_sqrt.value))
    return CachedSVGPLayer(
        kern=_freeze_params(layer.kern),
        Z=jnp.asarray(layer.Z.value, dtype=default_float()),
        Li=Li, alpha=alpha, C=C,
        mean_function=_freeze_params(layer.mean_function),
        num_outputs_=layer.num_outputs_,
        input_prop_dim=layer.input_prop_dim,
        jitter=layer.jitter,
        precision=layer.precision,
    )


def _cache_gpmc(layer):
    """GPMC dense layer -> cached staged form.  The whitened dense
    conditional (models/layers.py::GPMCLayer.conditional_ND) is exactly
    the SVGP cache with Z = X_fixed, Li = Lu^{-1}, alpha = q_mu, C=None;
    its variance is repeated to num_outputs, hence tile_var."""
    with jax.default_matmul_precision("highest"):
        Li = inv_lower(layer.Lu)
    return CachedSVGPLayer(
        kern=_freeze_params(layer.kern),
        Z=jnp.asarray(layer.X_fixed, dtype=default_float()),
        Li=Li, alpha=jnp.asarray(layer.q_mu.value), C=None,
        mean_function=_freeze_params(layer.mean_function),
        num_outputs_=layer.num_outputs_,
        input_prop_dim=layer.input_prop_dim,
        jitter=layer.jitter, precision="default", tile_var=True,
    )


def _cache_gpr(layer):
    """Collapsed exact-GPR layer (with data set) -> cached staged form:
    Z = X_data, Li = chol(Knn + sigma^2 I)^{-1}, alpha = Li (Y - m(X)).
    Drops the per-request O(N^3) Cholesky of
    models/layers.py::GPRLayer.conditional_ND."""
    with jax.default_matmul_precision("highest"):
        Li = inv_lower(layer._chol())
        alpha = Li @ (layer._Y - layer.mean_function(layer._X_mean))
    return CachedSVGPLayer(
        kern=_freeze_params(layer.kern),
        Z=jnp.asarray(layer._X_mean, dtype=default_float()),
        Li=Li, alpha=alpha, C=None,
        mean_function=_freeze_params(layer.mean_function),
        num_outputs_=int(layer._Y.shape[1]),
        input_prop_dim=layer.input_prop_dim,
        jitter=layer.jitter, precision="default", tile_var=True,
    )


def _titsias_factors(obj):
    """Extract the shared staged factors (Li = L^{-1}, alpha = LB^{-T} c,
    LBiT = LB^{-T}) from anything exposing the Titsias ``_common()``
    dict — the collapsed SGPR layer and the FITC model use the identical
    tmp1/tmp2 pipeline, so the cached contract is one code path."""
    with jax.default_matmul_precision("highest"):
        cm = obj._common()
        Li = inv_lower(cm["L"])
        LBiT = inv_lower(cm["LB"]).T
        alpha = LBiT @ cm["c"]
    return Li, alpha, LBiT


def _cache_sgpr(layer, extra_var=None):
    """Collapsed SGPR/Titsias layer (with data set) -> cached staged
    form.  From cm = _common() (models/layers.py:676-718):

        tmp1 = L^{-1} Kus = G,  tmp2 = LB^{-1} tmp1 = (LB^{-T})^T G
        mean = tmp2^T c = G^T (LB^{-T} c)
        var  = Kff - ||tmp1||^2 + ||tmp2||^2

    i.e. Li = L^{-1}, alpha = LB^{-T} c, C = (LB^{-T})[None] — the
    ||C^T G||^2 term IS the +||tmp2||^2 correction.  Per-request cost
    drops from O(N M^2 + M^3) (psi statistics over all N data rows +
    two Choleskys, re-run on every conditional) to O(B M^2).
    ``extra_var`` carries a DGPDamianou inner layer's generative noise
    sigma_l^2 (models/damianou.py::DGPDamianou.propagate adds it to the
    sampled conditional)."""
    Li, alpha, LBiT = _titsias_factors(layer)
    return CachedSVGPLayer(
        kern=_freeze_params(layer.kern),
        Z=jnp.asarray(layer.Z.value, dtype=default_float()),
        Li=Li, alpha=alpha, C=LBiT[None],
        extra_var=extra_var,
        mean_function=_freeze_params(layer.mean_function),
        num_outputs_=int(layer._Y.shape[1]),
        input_prop_dim=layer.input_prop_dim,
        jitter=layer.jitter, precision="highest", tile_var=True,
    )


def _cache_any(layer):
    from .layers import GPMCLayer
    if isinstance(layer, SVGPLayer):
        return _cache_svgp(layer)
    if isinstance(layer, GPMCLayer):
        return _cache_gpmc(layer)
    return layer


def _prediction_model(model, layers):
    """Prediction-only DGPBase carrying the cached stack.  The collapsed
    model classes' overridden propagate/elbo re-derive the collapsed
    factorization from live variational state on every call; the generic
    DGPBase loop over the cached layers reproduces their prediction
    semantics exactly (tests pin equality)."""
    from .dgp import DGPBase
    return DGPBase(
        likelihood=_freeze_params(model.likelihood), layers=layers,
        X_data=model.X_data, Y_data=model.Y_data,
        num_samples=model.num_samples, num_data=model.num_data,
        remat=model.remat,
    )


class CachedSingleLayerGP(Module):
    """Prediction-only cache for the single-layer baseline models
    (models/single_layer.py GPR / SGPR / GPRFITC — the UCI notebook's
    gpflow baselines).  Keeps their non-sampled prediction API
    (``predict_f(_full_cov)`` / ``predict_y`` / ``predict_density``)
    while the per-request cost drops to gram + matmul, exactly as for
    the deep collapsed family."""

    layer: CachedSVGPLayer = None
    likelihood: Any = None

    def predict_f(self, Xnew, full_cov=False):
        return self.layer.conditional_ND(jnp.asarray(Xnew),
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

    def log_likelihood(self, X=None, Y=None, key=None):
        raise NotImplementedError(
            "CachedSingleLayerGP is prediction-only; train the original "
            "model and re-run precompute().")

    elbo = log_likelihood


def _cache_fitc(model):
    """GPRFITC -> cached staged form.  predict_f (single_layer.py) is
    the same tmp1/tmp2 pipeline as SGPR's conditional, so the identical
    factors apply: Li = L^{-1}, alpha = LB^{-T} c, C = LB^{-T}."""
    Li, alpha, LBiT = _titsias_factors(model)
    layer = CachedSVGPLayer(
        kern=_freeze_params(model.kern),
        Z=jnp.asarray(model.Z.value, dtype=default_float()),
        Li=Li, alpha=alpha, C=LBiT[None],
        mean_function=_freeze_params(model.mean_function),
        num_outputs_=int(model.Y_data.shape[1]),
        jitter=model.jitter, precision="default", tile_var=True,
    )
    return CachedSingleLayerGP(layer=layer,
                               likelihood=_freeze_params(model.likelihood))


def precompute(model, key=None, zs=None):
    """Return a prediction-only copy of ``model`` whose layers are
    replaced by :class:`CachedSVGPLayer` snapshots (see module
    docstring).

    - MC-bound models (``DGP``/``DGPQuad``/``DGPHeteroscedastic``/...):
      SVGP-family layers are cached in place; the model class (and with
      it the y-space hooks) is preserved.
    - ``DGPDamianou``: every collapsed layer is cached from its q(H)
      data, inner layers carrying the generative noise sigma_l^2; a
      generic ``DGPBase`` is returned.
    - ``DGPCollapsed``/``DGPHeinonen``: inner layers cached in place;
      the collapsed last layer is snapshotted from the inner propagation
      of the training data (``key``/``zs`` seed that propagation — for
      stacks with >1 inner layer it is stochastic, exactly as every
      live prediction re-draws it).

    The returned model supports the full prediction surface
    (``predict_f(_full_cov)``, ``predict_y``, ``predict_density``,
    ``predict_all_layers(_full_cov)``) but not training (``KL`` and the
    collapsed bounds raise).
    """
    from ..utils.modules import assert_live
    from .damianou import DGPDamianou
    from .layers import GPRLayer, SGPRLayer
    from .single_layer import GPR as SLGPR, GPRFITC, SGPR as SLSGPR
    from .zoo import DGPCollapsed

    assert_live(model)

    if isinstance(model, (SLGPR, SLSGPR)):
        lay = model._bound_layer()
        cached = (_cache_gpr(lay) if isinstance(lay, GPRLayer)
                  else _cache_sgpr(lay))
        return CachedSingleLayerGP(
            layer=cached, likelihood=_freeze_params(model.likelihood))
    if isinstance(model, GPRFITC):
        return _cache_fitc(model)
    if isinstance(model, DGPDamianou):
        L = len(model.layers)
        layers = [
            _cache_sgpr(lay, extra_var=(model.noise[l].value
                                        if l < L - 1 else None))
            for l, lay in enumerate(model._data_layers())
        ]
        return _prediction_model(model, layers)
    if isinstance(model, DGPCollapsed):
        from .zoo import DGPHeinonen
        if (key is None and zs is None and len(model.layers) > 2
                and not isinstance(model, DGPHeinonen)):
            # >1 stochastic inner layer: the snapshot bakes ONE
            # inner-propagation draw (PRNGKey(0)) into the collapsed
            # factorization, whereas the live model re-draws per call.
            import warnings
            warnings.warn(
                "precompute(DGPCollapsed with >1 stochastic inner layer): "
                "the cached collapsed factorization freezes a single "
                "inner-propagation draw (default PRNGKey(0)); live "
                "predictions re-draw it per call.  Pass key= (or zs=) "
                "explicitly to choose the frozen draw.", stacklevel=2)
        key = key if key is not None else jax.random.PRNGKey(0)
        last = model._collapsed_last_layer(key=key, zs=zs)
        cached_last = (_cache_gpr(last) if isinstance(last, GPRLayer)
                       else _cache_sgpr(last) if isinstance(last, SGPRLayer)
                       else last)
        layers = [_cache_any(l) for l in model.layers[:-1]] + [cached_last]
        return _prediction_model(model, layers)
    # MC family: keep the model class (its y-space hooks — DGPQuad,
    # DGPHeteroscedastic — must survive) but freeze the likelihood like
    # every other branch, so no Param anywhere in the cached model is
    # marked trainable.
    layers = [_cache_any(l) for l in model.layers]
    return model.replace(layers=layers,
                         likelihood=_freeze_params(model.likelihood))
