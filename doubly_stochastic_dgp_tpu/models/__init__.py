from . import dgp, initializations, layers, mean_functions, single_layer, zoo
