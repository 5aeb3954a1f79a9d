"""Multi-host exercise (round-1 VERDICT missing #4): two OS processes,
each with 2 virtual CPU devices, join through
``parallel.mesh.initialize_distributed`` (jax.distributed over a
localhost coordinator) and run the real data-parallel path — ``dp_elbo``
on a 4-device global mesh plus a short ``fit_dp`` — and must agree with
each other AND with the identical program on a single-process 4-device
mesh (same seeds, same mesh shape => same compiled program => equal
values in float64)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(n_local):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    env["JAX_ENABLE_X64"] = "1"
    # the parent test session's conftest env must not leak a device count
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return env


def _parse(out):
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError("no RESULT line in:\n" + out[-2000:])


@pytest.mark.slow
def test_two_process_distributed_dp_matches_single_process():
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord],
            cwd=REPO, env=_worker_env(2), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # generous: grad-of-shard_map compiles in 2 competing
            # processes on a contended 1-CPU container can exceed
            # 420s (measured: 157s idle)
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    r0, r1 = (_parse(o) for o in outs)
    assert r0["devices"] == r1["devices"] == 4

    # ground truth: the same program, one process, 4 local devices
    ref = subprocess.run(
        [sys.executable, WORKER, "0", "1", "unused", "single"],
        cwd=REPO, env=_worker_env(4), capture_output=True, text=True,
        timeout=420)
    assert ref.returncode == 0, ref.stdout[-3000:] + ref.stderr[-2000:]
    rs = _parse(ref.stdout)
    assert rs["devices"] == 4

    for k in ("elbo", "final_loss"):
        assert r0[k] == pytest.approx(r1[k], abs=1e-9), (k, r0, r1)
        assert r0[k] == pytest.approx(rs[k], abs=1e-7), (k, r0, rs)
