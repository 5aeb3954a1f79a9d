"""Smoke-test the driver benchmark path (bench.py build+measure) on CPU
with a tiny config, and the graft entry points."""

import argparse
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(autouse=True)
def _restore_config():
    """bench/entry set global float32 config; restore x64 test defaults."""
    yield
    from doubly_stochastic_dgp_tpu import (set_default_float,
                                           set_default_jitter)
    from doubly_stochastic_dgp_tpu.config import config
    set_default_float("float64")
    set_default_jitter(1e-6)
    config.solve_mode = "solve"
    config.use_pallas = False


def test_bench_build_and_measure_tiny():
    sys.path.insert(0, REPO)
    import bench

    args = argparse.Namespace(steps=4, batch=64, layers=2, num_samples=2,
                              pallas=False, inner_steps=2, with_cpu=False)
    bench._set_numerics(args)
    X, Y, real = bench._regression_data()
    model = bench.build_regression(X, Y, args.layers, 100,
                                   args.num_samples)
    rate, loss, model = bench.measure(model, args.batch, args.steps,
                                      warmup=2, inner_steps=2)
    assert rate > 0
    assert np.isfinite(loss)
    # the flop model / MFU helpers are sane
    fl = bench.step_flops(model, 100, args.num_samples, args.batch)
    assert fl > 0
    assert 0 < bench.achievable_ceiling(100) < bench.achievable_ceiling(128) + 1
    assert bench.achievable_ceiling(128) == bench.F32_MATMUL_CEILING


def test_bench_collapsed_rows_tiny():
    """The collapsed-family matrix rows (round-2 VERDICT next-step #4)
    build + train through the generic measure() path."""
    sys.path.insert(0, REPO)
    import bench

    args = argparse.Namespace(steps=2, batch=64, layers=2, num_samples=1,
                              pallas=False, inner_steps=2, with_cpu=False)
    bench._set_numerics(args)
    X, Y, _ = bench._regression_data()
    for build in (bench.build_damianou, bench.build_collapsed):
        m = build(X, Y, M=8, L=2, N=64)
        flops = bench.collapsed_step_flops(m, 8, 64)
        assert flops > 0
        rate, loss, _ = bench.measure(m, None, 2, warmup=1,
                                      inner_steps=2)
        assert rate > 0
        assert np.isfinite(loss)


def test_bench_serving_rows_tiny(monkeypatch):
    sys.path.insert(0, REPO)
    import bench

    args = argparse.Namespace(steps=2, batch=32, layers=2, num_samples=2,
                              pallas=False, inner_steps=1, with_cpu=False)
    bench._set_numerics(args)
    X, Y, _ = bench._regression_data()
    monkeypatch.setattr(bench, "SERVING_S", 3)
    monkeypatch.setattr(bench, "SERVING_BATCH", 32)
    rows = bench.run_serving(args, X[:128], Y[:128])
    assert {r["name"] for r in rows} == {"serve_predict_y",
                                         "serve_predict_y_cached",
                                         "serve_predict_y_server",
                                         "serve_predict_density"}
    for r in rows:
        assert r["latency_ms"] > 0
        assert r["points_per_sec"] > 0
        assert r["device_ms"] > 0      # scan-amortized flag basis
        assert r["rtt_ms"] >= 0
        assert isinstance(r["congested"], bool)


def test_graft_entry():
    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    import jax

    fn, eargs = g.entry()
    out = jax.jit(fn)(*eargs)
    assert np.isfinite(float(out))


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_bench_prior_round_comparability():
    """Round-3 VERDICT weak #1: bench rows carry spread stats and a
    regression flag vs the newest committed BENCH_r*.json (whose driver
    'tail' capture may be front-truncated — rows must still recover)."""
    sys.path.insert(0, REPO)
    import bench

    rows, fname = bench._prior_bench_rows()
    # this repo has committed BENCH_r*.json files; the r03 tail is
    # front-truncated, so recovery must still find named rows
    assert fname is not None
    assert any("steps_per_sec" in r for r in rows.values())

    # flag logic: clearly-below-prior trips, within-noise doesn't
    bench._PRIOR_ROWS = {"rowA": {"steps_per_sec": 1000.0},
                         "srv": {"latency_ms": 2.0}}
    bench._PRIOR_FILE = "fake"
    row = {"name": "rowA", "steps_per_sec": 500.0,
           "steps_per_sec_max": 520.0, "spread_pct": 4.0}
    bench._flag_vs_prior(row)
    assert row["regressed_vs_prior"] and row["prior_steps_per_sec"] == 1000.0
    row2 = {"name": "rowA", "steps_per_sec": 950.0,
            "steps_per_sec_max": 990.0, "spread_pct": 8.0}
    bench._flag_vs_prior(row2)
    assert not row2["regressed_vs_prior"]
    srv = {"name": "srv", "latency_ms": 2.05, "spread_pct": 5.0}
    bench._flag_vs_prior(srv)
    assert not srv["regressed_vs_prior"]
    srv2 = {"name": "srv", "latency_ms": 2.5, "spread_pct": 5.0}
    bench._flag_vs_prior(srv2)
    assert srv2["regressed_vs_prior"]
    bench._PRIOR_ROWS, bench._PRIOR_FILE = None, None


def test_bench_device_rate_flags_and_congestion():
    """Round-4 VERDICT next #2: when BOTH rounds carry a device rate
    the flag compares those with a tight 12% floor (the 45% request-
    rate floor is retired on that path); a congested row's flag is
    explicitly indeterminate (None)."""
    sys.path.insert(0, REPO)
    import bench

    bench._PRIOR_ROWS = {
        "rowA": {"steps_per_sec": 1000.0, "device_steps_per_sec": 1100.0},
        "srv": {"latency_ms": 2.0}}
    bench._PRIOR_FILE = "fake"
    try:
        # 20% device-rate loss: hidden under the old 45% dispatch floor,
        # caught by the device-rate rule
        row = {"name": "rowA", "steps_per_sec": 900.0,
               "steps_per_sec_max": 930.0, "spread_pct": 3.0,
               "device_steps_per_sec": 880.0, "congested": False}
        bench._flag_vs_prior(row, dispatch_ms=20.0)
        assert row["regressed_vs_prior"] is True
        assert row["prior_device_steps_per_sec"] == 1100.0
        # 8% device-rate loss: inside the floor
        row2 = {"name": "rowA", "steps_per_sec": 900.0,
                "steps_per_sec_max": 930.0, "spread_pct": 3.0,
                "device_steps_per_sec": 1010.0, "congested": False}
        bench._flag_vs_prior(row2, dispatch_ms=20.0)
        assert row2["regressed_vs_prior"] is False
        # congested rows: indeterminate, never asserted
        row3 = {"name": "rowA", "steps_per_sec": 400.0,
                "steps_per_sec_max": 420.0, "spread_pct": 3.0,
                "device_steps_per_sec": 500.0, "congested": True}
        bench._flag_vs_prior(row3, dispatch_ms=20.0)
        assert row3["regressed_vs_prior"] is None
        srv = {"name": "srv", "latency_ms": 7.0, "spread_pct": 5.0,
               "congested": True}
        bench._flag_vs_prior(srv)
        assert srv["regressed_vs_prior"] is None
    finally:
        bench._PRIOR_ROWS, bench._PRIOR_FILE = None, None


def test_bench_compact_record_parses_and_fits_tail():
    """Round-4 VERDICT next #1a: the single stdout line must stay
    within the driver's 2000-char tail capture at full matrix size and
    carry the driver-contract fields."""
    sys.path.insert(0, REPO)
    import bench

    out = {
        "metric": "elbo_steps_per_sec (kin8nm-shape, 5-layer DGP, "
                  "M=100, S=10, batch=1000)",
        "value": 672.5, "unit": "steps/sec", "vs_baseline": 628.5,
        "platform": "axon", "precision": "mixed",
        "mfu_pct_of_achievable": 5.2,
        "throughput_mode": {"steps_per_sec": 780.0},
        "matrix": [
            {"name": f"row_with_a_long_name_{i}", "steps_per_sec": 1234.56,
             "device_steps_per_sec": 2345.67,
             "mfu_pct_of_achievable": None,
             "pct_of_psi2_roofline": 96.7,
             "regressed_vs_prior": False, "congested": i == 0}
            for i in range(9)],
        "serving": [
            {"name": f"serve_predict_y_variant_{i}", "latency_ms": 2.34,
             "regressed_vs_prior": None, "congested": True}
            for i in range(4)],
    }
    line = json.dumps(bench._compact_record(out), separators=(",", ":"))
    assert len(line) < 1900
    rec = json.loads(line)
    assert rec["value"] == 672.5 and rec["unit"] == "steps/sec"
    assert rec["vs_baseline"] == 628.5
    assert len(rec["matrix"]) == 9 and len(rec["serving"]) == 4
    assert rec["matrix"]["row_with_a_long_name_0"]["hot"] is True
    assert rec["matrix"]["row_with_a_long_name_1"]["dev"] == 2345.67
    assert rec["full_record"] == "BENCH_FULL.json"


def test_bench_prior_rows_prefer_full_record(tmp_path):
    """BENCH_FULL.json (the committed full record) wins over the
    driver's truncated BENCH_r*.json tails as the comparability
    anchor."""
    sys.path.insert(0, REPO)
    import bench

    full = {"matrix": [{"name": "rowZ", "steps_per_sec": 111.0,
                        "device_steps_per_sec": 123.0}],
            "serving": [{"name": "srvZ", "latency_ms": 2.22}]}
    (tmp_path / "BENCH_FULL.json").write_text(json.dumps(full))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(
        {"tail": '{"matrix": [{"name": "rowZ", "steps_per_sec": 999.0}]}'}))
    rows, fname = bench._prior_bench_rows(root=str(tmp_path))
    assert fname == "BENCH_FULL.json"
    assert rows["rowZ"]["steps_per_sec"] == 111.0
    assert rows["srvZ"]["latency_ms"] == 2.22
    # without the full record, tail recovery still works
    (tmp_path / "BENCH_FULL.json").unlink()
    rows2, fname2 = bench._prior_bench_rows(root=str(tmp_path))
    assert fname2 == "BENCH_r09.json"
    assert rows2["rowZ"]["steps_per_sec"] == 999.0


def test_bench_measure_stats_tiny():
    """measure_stats emits the spread fields the matrix rows record."""
    sys.path.insert(0, REPO)
    import bench

    args = argparse.Namespace(steps=2, batch=32, layers=1, num_samples=1,
                              pallas=False, inner_steps=2, with_cpu=False)
    bench._set_numerics(args)
    X, Y, _ = bench._regression_data()
    m = bench.build_regression(X, Y, 1, 8, 1)
    stats, loss, _ = bench.measure_stats(m, 32, 2, warmup=1,
                                         inner_steps=2, repeats=2)
    assert stats["repeats"] == 2
    assert (stats["steps_per_sec_min"] <= stats["steps_per_sec"]
            <= stats["steps_per_sec_max"])
    assert stats["spread_pct"] >= 0
    assert stats["sec_per_dispatch_best"] > 0   # device-rate input
    assert np.isfinite(loss)
    assert bench._rtt_probe_ms(n=2) > 0


def test_bench_matrix_precision_override_tiny():
    """The tier-ladder matrix row (large_M_high_staging) carries a
    per-row precision override; the override path (with_config before
    measure) trains finitely at a tiny shape."""
    sys.path.insert(0, REPO)
    import bench
    from doubly_stochastic_dgp_tpu import with_config

    by_name = {row[0]: row for row in bench.MATRIX}
    assert by_name["large_M_high_staging"][6] == "mixed_high"
    assert all(len(row) == 6 for name, row in by_name.items()
               if name != "large_M_high_staging")

    args = argparse.Namespace(steps=2, batch=32, layers=2, num_samples=1,
                              pallas=False, inner_steps=2, with_cpu=False)
    bench._set_numerics(args)
    X, Y, _ = bench._regression_data()
    m = with_config(bench.build_regression(X, Y, 2, 8, 1),
                    precision="mixed_high")
    assert all(layer.precision == "mixed_high" for layer in m.layers)
    rate, loss, _ = bench.measure(m, 32, 2, warmup=1, inner_steps=2)
    assert rate > 0
    assert np.isfinite(loss)
