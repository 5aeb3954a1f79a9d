"""Demo bitrot guard: each demo runs end-to-end with tiny budgets in a
clean CPU subprocess (the axon plugin is skipped via the env guard)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, timeout=480):  # generous: xdist runs these under heavy
    # CPU contention and the mnist demo's compile has hit 240s
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""       # skip the TPU claim
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


@pytest.mark.parametrize("args", [
    ["demos/step_function.py", "--iterations", "40", "--num-samples", "5"],
    ["demos/priors.py", "--frames", "2"],
    ["demos/natural_gradients.py", "--iterations", "20"],
    ["demos/mnist.py", "--synthetic", "--iterations", "5",
     "--minibatch", "128"],
    ["demos/damianou.py", "--n", "120", "--iterations", "15",
     "--inducing", "12"],
    ["demos/sgpmc.py", "--num-data", "30", "--num-inducing", "8",
     "--num-samples", "60", "--num-burn", "40"],
    ["demos/sgpmc.py", "--sampler", "nuts", "--max-depth", "5",
     "--num-data", "30", "--num-inducing", "8",
     "--num-samples", "60", "--num-burn", "40"],
    ["demos/serving.py", "--num-data", "60", "--iterations", "30",
     "--batch", "16", "--num-samples", "3"],
], ids=["step_function", "priors", "natural_gradients", "mnist",
        "damianou", "sgpmc", "sgpmc_nuts", "serving"])
def test_demo_runs(args):
    out = _run(args)
    assert "Traceback" not in out
