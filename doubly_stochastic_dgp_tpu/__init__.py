"""doubly_stochastic_dgp_tpu: a TPU-native (JAX/XLA/Pallas/pjit) Deep
Gaussian Process framework.

A from-scratch rebuild of the capability surface of
UCL-SML/Doubly-Stochastic-DGP (Salimbeni & Deisenroth, NIPS 2017 +
the natural-gradient follow-up) — including the GPflow-inherited
machinery (kernels, likelihoods, quadrature, conditionals, KL,
optimizers, monitoring) — designed TPU-first: MXU-shaped batched
linear algebra, fused Pallas gram kernels, pjit/shard_map data
parallelism over device meshes.
"""

from . import config
from .config import (default_float, default_jitter, set_default_float,
                     set_default_jitter, temp_config)
from .ops import kernels, likelihoods, linalg, quadrature
from .ops.kernels import (RBF, ArcCosine, Constant, Cosine, Kernel,
                          Linear as LinearKernel, Matern12, Matern32,
                          Matern52, Periodic, Product, RationalQuadratic,
                          Sum, White)
from .ops.likelihoods import (Bernoulli, Beta, Exponential, Gamma, Gaussian,
                              Likelihood, MultiClass, Ordinal, Poisson,
                              StudentT)
from .models import layers as gp_layers
from .models.dgp import DGP, DGPBase, DGPQuad
from .models.initializations import init_layers_linear, init_layers_input_prop
from .models.layers import (GPMCLayer, GPRLayer, SGPMCLayer, SGPRLayer,
                            SVGPLayer)
from .models.mean_functions import Constant as ConstantMean
from .models.mean_functions import Identity, Linear, Zero
from .models.dynamic import DynamicPredictor
from .models.posterior import CachedSVGPLayer, precompute
from .models.single_layer import GPR, GPRFITC, SGPR, SVGP
from .models.zoo import DGPCollapsed, DGPHeinonen, DGPHeteroscedastic
from .models.damianou import DGPDamianou
from .serving import make_server
from .utils.modules import (Module, Param, log_prior, summary,
                            trainable_mask, with_config)

__version__ = "0.1.0"
