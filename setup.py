from setuptools import find_packages, setup

setup(
    name="doubly_stochastic_dgp_tpu",
    version="0.1.0",
    description=("TPU-native (JAX/XLA/Pallas/pjit) Deep Gaussian Process "
                 "framework: doubly-stochastic variational inference, "
                 "natural gradients, collapsed bounds"),
    packages=find_packages(exclude=("tests", "demos")),
    python_requires=">=3.10",
    install_requires=["jax", "optax", "numpy", "scipy"],
    extras_require={"data": ["pandas"]},
)
