from . import (damianou, dgp, initializations, layers, mean_functions,
               single_layer, zoo)
