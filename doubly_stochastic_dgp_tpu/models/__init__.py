from . import dgp, initializations, layers, mean_functions, zoo
