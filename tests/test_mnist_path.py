"""Offline classification-pipeline test (round-3 VERDICT missing #2):
the committed MNIST-shaped fixture (tests/fixtures/mnist_tiny.npz,
scripts/make_mnist_fixture.py) drives the full chain the realdata
contract expects for data/mnist.npz — load_mnist_npz validation ->
DGP.build with robust-max MultiClass -> minibatch training ->
evaluate_classification -> dp_evaluate_classification — with zero
network, exactly as tests/fixtures/kin8nm.csv +
test_real_data_path.py do for regression.

Anchors: reference demo_mnist.ipynb cells 1-5 (loading/shapes) and
cell 11 (accuracy / loglik formulas)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "mnist_tiny.npz")


def _load():
    from doubly_stochastic_dgp_tpu.data.datasets import load_mnist_npz
    return load_mnist_npz(FIXTURE)


def test_loader_validates_fixture_and_rejects_malformed(tmp_path):
    d = _load()
    assert d["X"].shape == (160, 64) and d["X"].dtype == np.float32
    assert d["Y"].shape == (160, 1) and d["Xs"].shape == (40, 64)
    assert d["Ys"].shape == (40, 1)
    assert d["X"].min() >= 0.0 and d["X"].max() <= 1.0
    assert_allclose(d["Y"], np.round(d["Y"]))

    from doubly_stochastic_dgp_tpu.data.datasets import load_mnist_npz

    bad = tmp_path / "bad.npz"
    np.savez(bad, X=d["X"], Y=d["Y"], Xs=d["Xs"])        # missing Ys
    with pytest.raises(ValueError, match="missing"):
        load_mnist_npz(str(bad))
    np.savez(bad, X=d["X"] * 255.0, Y=d["Y"], Xs=d["Xs"], Ys=d["Ys"])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        load_mnist_npz(str(bad))
    np.savez(bad, X=d["X"], Y=d["Y"] + 0.5, Xs=d["Xs"], Ys=d["Ys"])
    with pytest.raises(ValueError, match="integer"):
        load_mnist_npz(str(bad))
    np.savez(bad, X=d["X"], Y=d["Y"][:10], Xs=d["Xs"], Ys=d["Ys"])
    with pytest.raises(ValueError, match="labels"):
        load_mnist_npz(str(bad))


def _build_model(d, M=16, hidden=4, S=1, seed=0):
    """Downscaled demo_mnist architecture: D -> hidden -> 10 with the
    robust-max MultiClass likelihood (cells 4-5)."""
    import doubly_stochastic_dgp_tpu as dsd

    rng = np.random.RandomState(seed)
    Z = d["X"][rng.permutation(d["X"].shape[0])[:M]].astype(np.float64)
    D = d["X"].shape[1]
    kernels = [dsd.RBF.make(D, lengthscales=2.0, variance=2.0),
               dsd.RBF.make(hidden, lengthscales=2.0, variance=2.0)]
    return dsd.DGP.build(d["X"].astype(np.float64), d["Y"], Z, kernels,
                         dsd.MultiClass.make(10), num_outputs=10,
                         num_samples=S)


def test_classification_chain_train_and_eval():
    """load -> build -> fit(minibatch) -> evaluate_classification, the
    offline classification pipeline, in the fast tier (zero network)."""
    from doubly_stochastic_dgp_tpu.training.loop import (
        evaluate_classification, fit)

    d = _load()
    m = _build_model(d)
    # minimal compile surface for the fast tier: 2 plain SGD steps
    # (no scan wrapper), S=2 eval
    m, hist = fit(m, iterations=2, learning_rate=0.02, batch_size=32,
                  log_every=1, scan_steps=1)
    assert np.isfinite(hist[-1]["loss"])

    r = evaluate_classification(m, d["Xs"], d["Ys"], S=2,
                                batch_size=40, seed=0)
    assert 0.0 <= r["accuracy"] <= 1.0
    assert np.isfinite(r["loglik"]) and r["nll"] == -r["loglik"]


@pytest.mark.slow
def test_classification_dp_eval_on_fixture():
    """dp_evaluate_classification on the fixture over a data mesh (the
    grad-free shard_map MultiClass predict compile is ~40s on 1-CPU
    containers — slow tier)."""
    from doubly_stochastic_dgp_tpu.parallel.dp import (
        dp_evaluate_classification)
    from doubly_stochastic_dgp_tpu.parallel.mesh import make_mesh

    d = _load()
    m = _build_model(d)
    mesh = make_mesh(num_devices=4, axis="data")
    r_dp = dp_evaluate_classification(
        m, d["Xs"], d["Ys"], S=2, key=jax.random.PRNGKey(0), mesh=mesh)
    assert 0.0 <= r_dp["accuracy"] <= 1.0
    assert np.isfinite(r_dp["loglik"]) and r_dp["nll"] == -r_dp["loglik"]


@pytest.mark.slow
def test_mnist_demo_cli_on_fixture(tmp_path):
    """demos/mnist.py end-to-end on the fixture via --data (the cached
    real-data code path, not --synthetic): trains and emits the final
    JSON metrics line."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "demos", "mnist.py"),
         "--data", FIXTURE, "--iterations", "10", "--minibatch", "64"],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert 0.0 <= rec["accuracy"] <= 1.0
    assert np.isfinite(rec["test_loglik"])
