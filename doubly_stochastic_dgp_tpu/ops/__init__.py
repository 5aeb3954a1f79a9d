from . import kernels, likelihoods, linalg, psi_stats, quadrature
