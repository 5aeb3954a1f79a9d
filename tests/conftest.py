"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and float64 numerics (parity with the float64 reference, see
SURVEY §7 dtype policy).  Must run before jax initializes a backend."""

import os

# Force the CPU backend: the container env pins JAX_PLATFORMS=axon (the
# tunneled TPU), but parity tests need float64 + 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers (and initializes) the tunneled
# TPU backend in every interpreter before pytest starts, so the env vars
# above can come too late — force the platform and drop any
# already-initialized backends.
try:
    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        import jax.extend.backend as _xb
        _xb.clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; got " + jax.default_backend())

jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite compiles many small x64 programs;
# repeat runs (CI / the driver) hit the cache and run in a fraction of
# the cold time
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
