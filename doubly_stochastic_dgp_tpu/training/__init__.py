from . import checkpoint, hmc, loop, monitor, natgrad, nuts, optim
from .checkpoint import restore_checkpoint, save_checkpoint
from .hmc import (effective_sample_size, hmc_sample,
                  hmc_sample_chains,
                  potential_scale_reduction)
from .nuts import nuts_sample, nuts_sample_chains
from .loop import (evaluate_classification,
                   evaluate_regression, fit, fit_dp,
                   make_natgrad_adam_step, make_sgd_train_step)
from .monitor import JsonlLogger, PrintTimings
from .natgrad import NaturalGradient, natgrad_update
from .optim import adam, lbfgs_minimize, make_train_step, masked_optimizer
