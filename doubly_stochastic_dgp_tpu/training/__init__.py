from . import natgrad, optim
from .natgrad import NaturalGradient, natgrad_update
from .optim import adam, lbfgs_minimize, make_train_step, masked_optimizer
