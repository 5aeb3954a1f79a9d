from . import conditional, gram
from .conditional import fused_conditional, fused_conditional_reference
from .gram import rbf_gram
