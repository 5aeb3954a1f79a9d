#!/usr/bin/env python
"""Benchmark: ELBO optimization steps/sec.

Headline config (BASELINE.json): kin8nm-shaped data (N=7372, D=8),
5-layer DGP, M=100 inducing points, S=10 MC samples, minibatch 1000,
Adam(0.01) (reference run config demos/run_regression.py:45-69 +
notebook cell 15).

Round-2 (VERDICT next-step #3): the default run also measures the
multi-config matrix —
  - paper_L2 / paper_L5: the reference experiment config, minibatch
    10000 (full batch when N < 10000) and S=1
    (/root/reference/demos/run_regression.py:45-69);
  - mnist_dgp2: 784->30->10 MultiClass robust-max, minibatch 1000
    (reference demo_mnist.ipynb);
  - large_M: M=512, batch 8192, L=2 — the MXU-friendly regime.
Each row reports steps/s, sustained TFLOP/s from an analytic matmul
flop model of the staged-inverse conditional, and % of the
*achievable* f32 ceiling (66 TFLOP/s x the (M/Mpad)^2 128-lane padding
efficiency — the PERF.md roofline method).

Round-2 precision policy: the headline (and matrix) run at the
framework-default matmul precision 'mixed' — f64-class training
trajectories at ~15% cost over the bf16-class 'default' path (PERF.md
precision experiments).  The JSON also carries a "throughput_mode" row
measuring the same step at precision='default' (the r01 headline
contract) for cross-round comparability.

Output contract (round-5): stdout is exactly ONE compact JSON line
(guaranteed to fit the driver's 2000-char tail capture)
  {"metric": ..., "value": steps/sec, "unit": "steps/sec",
   "vs_baseline": ratio, "congested": ..., "matrix": {name: {...}},
   "serving": {...}, "full_record": "BENCH_FULL.json"}
while the FULL record goes to BENCH_FULL.json (committed — the
next round's comparability anchor) and to stderr.  Every row carries
an RTT congestion sentinel and an RTT-corrected device rate; see
_rtt_probe_ms / _flag_vs_prior.

vs_baseline is measured against the GPflow/TF1 CPU reference's training
rate for the headline config.  The reference's own published throughput
anecdote (demo_mnist.ipynb cell 15: ~0.23 it/s for SVGP M=500 on CPU) is
not config-matched, so the pinned number below was measured by timing
this same 5-layer/M=100/S=10/batch=1000 training step with JAX on this
container's CPU backend (a strictly *faster* stand-in for the TF1-graph
CPU reference — GPflow 1.x session.run steps are slower than an XLA CPU
fused step).  Re-measure with --with-cpu.
"""

import argparse
import json
import os
import re
import sys
import time

# Pinned CPU-baseline steps/sec for the headline config (see module
# docstring).  Measured on this container (JAX CPU, float32, same train
# step): the honest stand-in for "CPU GPflow" given zero egress.  Update
# with --with-cpu.
CPU_BASELINE_STEPS_PER_SEC = 1.07

F32_MATMUL_CEILING = 66e12          # v5e: exact-f32 as 3-pass bf16


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def _set_numerics(args):
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import config

    dsd.set_default_float("float32")
    dsd.set_default_jitter(1e-5)
    config.solve_mode = "inverse"
    if getattr(args, "precision", None):
        config.matmul_precision = args.precision
    # --pallas forces the fused conditional everywhere; default False —
    # end-to-end measurements show XLA ahead in-context at all shapes
    # tried (PERF.md round 3; scripts/bench_large_m.py)
    config.use_pallas = True if args.pallas else False


def _regression_data():
    from doubly_stochastic_dgp_tpu.data.datasets import (
        Datasets, SyntheticRegression)
    try:
        data = Datasets("data/").all_datasets["kin8nm"].get_data(split=0)
        real = True
    except Exception:
        data = SyntheticRegression(N=8192, D=8).get_data(split=0)
        real = False
    return data["X"].astype("float32"), data["Y"].astype("float32"), real


def build_regression(X, Y, layers, M, num_samples):
    import doubly_stochastic_dgp_tpu as dsd
    from scipy.cluster.vq import kmeans2

    Z = kmeans2(X, M, minit="points", seed=0)[0]
    D = X.shape[1]
    kernels = []
    for l in range(layers):
        k = dsd.RBF.make(D)
        if l < layers - 1:
            k = k + dsd.White.make(D, variance=2e-6, trainable=False)
        kernels.append(k)
    model = dsd.DGP.build(X, Y, Z, kernels, dsd.Gaussian.make(0.05),
                          num_samples=num_samples)
    # near-deterministic inner layers (reference run_regression.py:71-74)
    mlayers = list(model.layers)
    for i, layer in enumerate(mlayers[:-1]):
        mlayers[i] = layer.replace(
            q_sqrt=layer.q_sqrt.with_value(layer.q_sqrt.value * 1e-5))
    return model.replace(layers=mlayers)


def build_mnist_shape(M=100):
    """784->30->10 MultiClass DGP2 on shape-matched synthetic MNIST
    (reference demo_mnist.ipynb; zero egress blocks the real download)."""
    import numpy as np
    import doubly_stochastic_dgp_tpu as dsd
    from scipy.cluster.vq import kmeans2

    rng = np.random.RandomState(0)
    N, D, K = 6000, 784, 10
    W = rng.randn(D, K) * 0.5
    X = rng.rand(N, D).astype("float32")
    Y = np.argmax(X @ W + rng.randn(N, K) * 0.1, 1)[:, None]
    Z = kmeans2(X, M, minit="points", seed=0)[0]
    kernels = [dsd.RBF.make(784, lengthscales=2.0, variance=2.0),
               dsd.RBF.make(30, lengthscales=2.0, variance=2.0)]
    return dsd.DGP.build(X, Y.astype("float32"), Z, kernels,
                         dsd.MultiClass.make(K), num_outputs=K,
                         num_samples=1)


def build_damianou(X, Y, M=100, L=2, N=1500, hidden=None):
    """Fully-collapsed Damianou-Lawrence DGP at a full-batch shape (the
    bound is not a per-datum sum; no minibatching — round-2 VERDICT
    weak #3: the psi-statistics cost center on the record).

    ``hidden`` sets the latent-layer width (default: input dim).  The
    compute-bound row uses hidden=2, the Damianou & Lawrence setting
    (the paper's deep-GP latent spaces are 1-5 dimensional) — and the
    width the hybrid psi2 backward kernel is gated for (D <= 2,
    ops/pallas/psi2.py)."""
    import doubly_stochastic_dgp_tpu as dsd
    from scipy.cluster.vq import kmeans2

    X, Y = X[:N], Y[:N]
    Z = kmeans2(X, M, minit="points", seed=0)[0]
    D = X.shape[1]
    dims = [D] + [hidden or D] * (L - 1)
    kerns = [dsd.RBF.make(d) for d in dims]
    return dsd.DGPDamianou.build(X, Y, Z, kerns, dsd.Gaussian.make(0.05))


def build_collapsed(X, Y, M=100, L=2, N=1500):
    """Generic DGPCollapsed (MC inner SVGP layers + collapsed SGPR final
    layer, reference model_zoo.py:25-57) at the same full-batch shape."""
    import numpy as np
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.models.layers import SGPRLayer
    from scipy.cluster.vq import kmeans2

    X, Y = X[:N], Y[:N]
    Z = kmeans2(X, M, minit="points", seed=0)[0]
    D = X.shape[1]
    kerns = [dsd.RBF.make(D) for _ in range(L)]
    layers = dsd.init_layers_linear(X, Y, Z, kerns,
                                    num_outputs=Y.shape[1])
    fin = SGPRLayer.make(layers[-1].kern, np.asarray(layers[-1].Z.value),
                         Y.shape[1], layers[-1].mean_function)
    return dsd.DGPCollapsed.make(X, Y, dsd.Gaussian.make(0.05),
                                 layers[:-1] + [fin])


def collapsed_step_flops(model, M, N):
    """Approximate flops/step for the collapsed family.  The cost center
    is the per-row psi2 block (an (M, M) ELEMENTWISE map per row, ~6 ops
    per (n, m, m') for the RBF cross terms, forced to HIGHEST precision
    — ops/psi_stats.py), plus O(M^3) factorizations; bwd ~ 2x fwd.
    These are VPU-bound, not MXU matmuls, so no %-of-achievable is
    reported for these rows (the matmul ceiling doesn't apply — see
    pct_of_psi2_roofline for the ceiling that does)."""
    L = len(model.layers)
    D = model.X_data.shape[1]
    fwd = L * (6 * N * M * M + 2 * N * M * D + 4 * M ** 3)
    return 3 * fwd


# Measured psi2 fwd+bwd times through _rbf_cross_psi2 at the
# compute-bound shape (N=8192, M=256, one v5e chip — round-5 sweep,
# scripts/sweep_psi2_bwd.py): the dominant-op ceilings for the
# collapsed family, playing the role F32_MATMUL_CEILING plays for the
# MC family.  The hybrid (Pallas-backward) route's rate is
# D-dependent (the pre-recompute chain / MXU-pre residual slope), so
# the ceiling interpolates the measured table; the XLA route is flat
# (one structural (N, M, M) HBM roundtrip fwd + residual traffic bwd).
_PSI2_SWEEP_N = 8192
# (M, D) -> measured best-kernel-route fwd+bwd ms at N=8192 (round-5
# sweeps).  The per-element rate IMPROVES with M (row staging
# amortizes over a larger (M, M) tile), so the ceiling is looked up at
# the nearest measured M, then nearest D.
PSI2_HYBRID_MS_BY_MD = {
    (256, 1): 8.72, (256, 2): 12.82, (256, 3): 14.32, (256, 4): 15.32,
    (256, 5): 17.38, (256, 6): 17.91, (256, 7): 18.47, (256, 8): 18.97,
    (512, 2): 33.97, (512, 8): 75.4,
}
PSI2_FWDBWD_ELEM_RATE_XLA = _PSI2_SWEEP_N * 256 * 256 / 23.6e-3
# Below one 128-lane tile XLA fully fuses the (N, M, M) block and runs
# ~5x faster per element (measured at N=1500, M=100: fwd+bwd 0.13-0.14
# ms = ~110 Gelem/s) — the dedicated small-M ceiling, and the reason
# the kernel route gates at PSI2_KERNEL_MIN_M = 128.
PSI2_FWDBWD_ELEM_RATE_XLA_SMALL_M = 110e9


def psi2_hybrid_elem_rate(M, d):
    """elems/s ceiling for the kernel route at (M, d): nearest
    measured M (the per-element rate is M-dependent), then nearest D
    within that M."""
    ms_avail = sorted({m for m, _ in PSI2_HYBRID_MS_BY_MD})
    mm = min(ms_avail, key=lambda m: abs(m - M))
    dm = min((dd for m, dd in PSI2_HYBRID_MS_BY_MD if m == mm),
             key=lambda dd: abs(dd - d))
    return (_PSI2_SWEEP_N * mm * mm
            / (PSI2_HYBRID_MS_BY_MD[(mm, dm)] * 1e-3))


def collapsed_psi_roofline_seconds(model, M, N):
    """Ideal seconds/step if the step were ONLY its psi2 data-sums
    running at the measured dominant-op rate: sum over uncertain-input
    layers of N*M^2 elements at the route's ceiling rate.  The bench
    reports pct_of_psi2_roofline = ideal / measured — a real
    utilization fraction for the VPU/HBM-bound collapsed rows
    (round-3 VERDICT next #1).

    The per-layer ceiling follows the ACTUAL route the layer's psi2
    will take (ops/psi_stats.py::_psi2_route: config.psi2_impl +
    backend + the kernel's shape/dtype/profitability gates) — not D
    alone, so an f64 run, an M > 512 row, or a forced psi2_impl='xla'
    is scored against the XLA ceiling it actually runs at."""
    from doubly_stochastic_dgp_tpu.ops.psi_stats import _psi2_route

    dims = []
    if hasattr(model, "h_mean") and model.h_mean:        # DGPDamianou
        dims = [h.value.shape[1] for h in model.h_mean]
    elif hasattr(model, "inner_layers_propagate"):       # DGPCollapsed
        dims = [model.layers[-1].kern.input_dim]
    from doubly_stochastic_dgp_tpu.ops.pallas.psi2 import (
        PSI2_KERNEL_MIN_M)

    total = 0.0
    for d in dims:
        route, _ = _psi2_route(N, M, d, model.X_data.dtype)
        if route == "pallas":
            rate = psi2_hybrid_elem_rate(M, d)
        elif M < PSI2_KERNEL_MIN_M:
            rate = PSI2_FWDBWD_ELEM_RATE_XLA_SMALL_M
        else:
            rate = PSI2_FWDBWD_ELEM_RATE_XLA
        total += N * M * M / rate
    return total


def step_flops(model, M, S, B):
    """Analytic matmul-dominated flops per optimizer step (fwd + bwd).

    Per layer, R = S*B rows through the staged-inverse conditional
    (models/layers.py:266-293): gram Kuf 2*R*M*Din, G = Li Kuf
    2*M^2*R, T = W G 2*Do*M^2*R, mean/var epilogues 4*M*R*Do, and the
    M^3-ish chol + triangular inverse.  Backward ~ 2x forward (the
    PERF.md roofline method, refined from the round-2 estimate)."""
    R = S * B
    total = 0
    Din = model.X_data.shape[1]
    for layer in model.layers:
        Do = layer.num_outputs
        fwd = (2 * R * M * Din + 2 * M * M * R * (1 + Do)
               + 4 * M * R * Do + 2 * M ** 3)
        total += 3 * fwd                       # fwd + ~2x bwd
        Din = Do
    return total


def achievable_ceiling(M):
    """f32 matmul ceiling x the 128-lane padding efficiency at this M."""
    Mp = -(-M // 128) * 128
    return F32_MATMUL_CEILING * (M / Mp) ** 2


_RTT_PROBE_FN = None
_RTT_PROBE_SEQ = [0]


def _rtt_probe_ms(n=5):
    """Median host<->device round trip of a minimal unique dispatch +
    scalar readback — the host-congestion sentinel (round-4 VERDICT
    next #1b).  Unique inputs per call (the tunneled-TPU dispatch-cache
    pitfall, utils/timing.py); the probe program is one scalar add
    (jitted ONCE per process — a fresh lambda per probe would pay a
    retrace and poison the probe with compile time), so anything above
    the quiet-host band is host/tunnel congestion, not compute."""
    import statistics

    import jax
    import jax.numpy as jnp

    global _RTT_PROBE_FN
    if _RTT_PROBE_FN is None:
        _RTT_PROBE_FN = jax.jit(lambda x: x + 1.0)
        float(_RTT_PROBE_FN(jnp.float32(-1.0)))      # compile + warm
    f = _RTT_PROBE_FN
    ts = []
    for _ in range(n):
        _RTT_PROBE_SEQ[0] += 1
        t0 = time.perf_counter()
        float(f(jnp.float32(_RTT_PROBE_SEQ[0])))
        ts.append(time.perf_counter() - t0)
    return 1e3 * statistics.median(ts)


# Quiet-host band for the RTT probe.  The probe is a SYNCHRONOUS
# scalar readback per call — on this tunnel that round trip is ~25 ms
# even on a quiet host (utils/timing.py documents the same 25 ms
# constant; measured quiet-band probes in the round-5 run: 24.7-38.8
# ms).  NB this is NOT the serving rows' 2-8 ms "latency": those are
# amortized per-call times over 30 async-queued dispatches with the
# sync RTT subtracted once per block.  A row whose before/after probe
# exceeds the threshold is re-run once and, if still hot, annotated
# congested=true with its regression flag suppressed (null) — the
# committed artifact then carries the machine-checkable tiebreaker the
# round-4 record lacked.
CONGESTED_RTT_MS = 45.0


def measure_stats(model, batch_size, steps, warmup=5, inner_steps=1,
                  repeats=3, reject_nonfinite=False):
    """Train-step throughput with round-over-round comparability
    (round-3 VERDICT weak #1): the timed section runs ``repeats``
    independent blocks and reports {median, min, max, spread_pct} of
    the per-block rates, so a future regression on a dispatch-bound row
    is distinguishable from tunnel/host noise (the serving rows'
    best-of-N discipline, utils/timing.py, extended to the scanned
    rows).  Returns (stats_dict, final_loss, model)."""
    import statistics

    import jax
    import optax
    from doubly_stochastic_dgp_tpu.training.loop import (
        make_scan_train_step, make_sgd_train_step)
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    tx = masked_optimizer(optax.adam(0.01), model)
    opt_state = tx.init(model)
    if inner_steps > 1 or reject_nonfinite:
        # the collapsed rows run guarded (reject-nonfinite rollback,
        # training/loop.py): the f32 full-batch trajectory is on record
        # NaN'ing from ulp-level rerolls (PERF.md round-4) — a guarded
        # row cannot end in a NaN final_loss
        step = make_scan_train_step(tx, batch_size=batch_size,
                                    inner_steps=inner_steps,
                                    reject_nonfinite=reject_nonfinite)
    else:
        step = make_sgd_train_step(tx, batch_size=batch_size)
    key = jax.random.PRNGKey(0)

    n_calls = max(1, steps // inner_steps)

    # Repeat blocks re-time the SAME training segment from a snapshot
    # (device-side copies; the jitted step donates its inputs, so the
    # snapshot is what makes re-running possible).  Without the reset,
    # `repeats` silently multiplied the optimization horizon — at
    # repeats=5 the collapsed rows trained 4x past the round-3 horizon
    # and walked into the documented f32 full-batch instability (NaN
    # final_loss), making rows incomparable across rounds.
    def snapshot(t):
        return jax.tree_util.tree_map(
            lambda a: a.copy() if hasattr(a, "copy") else a, t)

    for i in range(max(1, warmup // inner_steps)):
        model, opt_state, loss = step(model, opt_state,
                                      jax.random.fold_in(key, i))
    loss.block_until_ready()
    # snapshot the POST-warmup state: every block then times the same
    # [warmup, warmup + steps] segment, and final_loss keeps the
    # pre-round-4 meaning (loss after warmup + steps)
    m0, s0 = snapshot(model), snapshot(opt_state)
    rates = []
    disp = []
    for r in range(max(1, repeats)):
        model, opt_state = snapshot(m0), snapshot(s0)
        jax.block_until_ready((model, opt_state))
        t0 = time.perf_counter()
        for i in range(n_calls):
            # keys stay unique per block (tunneled-TPU pitfall, PERF.md:
            # identical dispatches can be served from caches) — the
            # horizon is identical, only the MC noise differs
            model, opt_state, loss = step(
                model, opt_state,
                jax.random.fold_in(key, 1000 + r * n_calls + i))
        loss.block_until_ready()
        dt = time.perf_counter() - t0
        rates.append(n_calls * inner_steps / dt)
        disp.append(dt / n_calls)
    med = statistics.median(rates)
    stats = {
        "steps_per_sec": med,
        "steps_per_sec_min": min(rates),
        "steps_per_sec_max": max(rates),
        "spread_pct": (100.0 * (max(rates) - min(rates)) / med
                       if med else 0.0),
        "repeats": len(rates),
        # best observed seconds per XLA dispatch — the device-rate
        # estimator's input (round-4 VERDICT next #2).  The block's
        # n_calls dispatches are queued asynchronously and synced ONCE,
        # so the sync RTT is amortized: device time per step ~=
        # (sec_per_dispatch_best - rtt / n_calls) / inner_steps.
        "sec_per_dispatch_best": min(disp),
        "n_calls": n_calls,
    }
    return stats, float(loss), model


def measure(model, batch_size, steps, warmup=5, inner_steps=1):
    """Single-number rate (median of 1 block) — thin back-compat shim
    over measure_stats for scripts/tests."""
    stats, loss, model = measure_stats(model, batch_size, steps,
                                       warmup=warmup,
                                       inner_steps=inner_steps, repeats=1)
    return stats["steps_per_sec"], loss, model


MATRIX = [
    # name, layers, M, S, batch, kind[, precision override]
    ("paper_L2", 2, 100, 1, 10000, "reg"),
    ("paper_L5", 5, 100, 1, 10000, "reg"),
    ("mnist_dgp2", 2, 100, 1, 1000, "mnist"),
    ("large_M", 2, 512, 1, 8192, "reg"),
    # the 3-pass-staging throughput knob at the MXU-bound shape
    # (PERF.md round-3 'mixed_high' verdict: +14% rate, ~0.03-0.05-nat
    # converged-horizon cost — the tier ladder on the record each round)
    ("large_M_high_staging", 2, 512, 1, 8192, "reg", "mixed_high"),
    # collapsed family (full batch; psi-stats HIGHEST cost on record —
    # round-2 VERDICT next-step #4)
    ("damianou_L2", 2, 100, 1, 1500, "damianou"),
    ("collapsed_L2", 2, 100, 1, 1500, "collapsed"),
    # compute-bound collapsed roofline row (round-3 VERDICT next #1):
    # N=8192, M=256, hidden width 2 (the Damianou-Lawrence latent-dim
    # setting, and the hybrid psi2 kernel's win region) — reports a
    # non-null pct_of_psi2_roofline against the measured dominant-op
    # ceiling
    ("damianou_large", 2, 256, 1, 8192, "damianou_large"),
    # the HBM-wall row (round-5): at N=8192, M=512 the XLA psi2
    # fwd+bwd CANNOT run on one chip (its scan-saved (N, M, M)
    # residuals need ~16.5 GB > 15.75 GB HBM — PERF.md round-5
    # fill-in), so this row exists only because the recompute-backward
    # kernel route removes that traffic; a reference-style
    # implementation has no number here at all.
    ("damianou_xl", 2, 512, 1, 8192, "damianou_large"),
]


def _build_row_model(spec, X, Y):
    from doubly_stochastic_dgp_tpu import with_config
    name, L, M, S, batch, kind, *prec = spec
    if kind == "mnist":
        model = build_mnist_shape(M=M)
        B = min(batch, 6000)
    elif kind == "damianou":
        model = build_damianou(X, Y, M=M, L=L, N=batch)
        B = None                       # full batch (no minibatching)
    elif kind == "damianou_large":
        model = build_damianou(X, Y, M=M, L=L, N=batch, hidden=2)
        B = None
    elif kind == "collapsed":
        model = build_collapsed(X, Y, M=M, L=L, N=batch)
        B = None
    else:
        model = build_regression(X, Y, L, M, S)
        B = min(batch, X.shape[0])
    if prec:
        model = with_config(model, precision=prec[0])
    return model, B


def run_matrix(args, X, Y):
    rows = []
    only = getattr(args, "only", None)
    for spec in MATRIX:
        name, L, M, S, batch, kind, *prec = spec
        if only and not re.search(only, name):
            continue
        # Collapsed-family steps are sub-ms since the round-3
        # safe_cholesky custom_vjp fix; at the old inner=5 the damianou
        # row read the dispatch RTT, not compute (measured 398 vs 3735
        # steps/s across sessions = tunnel noise, PERF.md round-3).
        # Full batch + tiny step -> amortize hard, like the headline.
        mxu_bound = kind not in ("damianou", "damianou_large",
                                 "collapsed")
        steps = args.matrix_steps if mxu_bound else args.matrix_steps * 3
        inner = (args.matrix_inner_steps if mxu_bound
                 else max(args.matrix_inner_steps, 50))

        # congestion sentinel: probe the dispatch RTT before and after
        # the timed blocks; a congested row is re-run once (fresh
        # model — measure donates its buffers) and, if still hot,
        # shipped annotated with its regression flag suppressed
        for attempt in range(2):
            # fresh 'before' probe each attempt: carrying the hot
            # trailing probe over would make a transient burst
            # impossible to clear on the re-run
            rtt0 = _rtt_probe_ms()
            model, B = _build_row_model(spec, X, Y)
            # flops from the pytree BEFORE measure() donates buffers
            if not mxu_bound:
                flops = collapsed_step_flops(model, M, batch)
                psi_ideal = collapsed_psi_roofline_seconds(model, M,
                                                           batch)
            else:
                flops = step_flops(model, M, S, B)
                psi_ideal = None
            stats, loss, _ = measure_stats(
                model, B, max(steps, inner), inner_steps=inner,
                repeats=getattr(args, "repeats", 3),
                reject_nonfinite=not mxu_bound)
            rtt1 = _rtt_probe_ms()
            congested = max(rtt0, rtt1) > CONGESTED_RTT_MS
            if not congested:
                break
            print(f"# {name}: congested host (rtt {rtt0:.1f}/"
                  f"{rtt1:.1f} ms){' — re-running' if attempt == 0 else ''}",
                  file=sys.stderr, flush=True)
        rate = stats["steps_per_sec"]
        sustained = flops * rate
        # pure device time per step: best dispatch minus the block's
        # ONE sync round trip amortized over its n_calls queued
        # dispatches — the regression-flag basis for every row
        # (round-4 VERDICT next #2: request-rate flags needed a 45%
        # floor to absorb tunnel noise, which hid real regressions;
        # the device rate is what the hardware actually did).  The
        # corrected dispatch time is floored at 30% of the raw one so
        # an over-estimated RTT can never produce absurd rates.
        rtt_ms = min(rtt0, rtt1)
        dev_sec = max(stats["sec_per_dispatch_best"]
                      - rtt_ms / 1e3 / stats["n_calls"],
                      0.3 * stats["sec_per_dispatch_best"]) / inner
        dev_rate = 1.0 / dev_sec
        row = {
            "name": name, "layers": L, "M": M, "S": S,
            **({"precision": prec[0]} if prec else {}),
            "batch": B if B is not None else batch,
            "steps_per_sec": round(rate, 2),
            "steps_per_sec_min": round(stats["steps_per_sec_min"], 2),
            "steps_per_sec_max": round(stats["steps_per_sec_max"], 2),
            "device_steps_per_sec": round(dev_rate, 2),
            "rtt_ms": round(rtt_ms, 2),
            "congested": congested,
            "spread_pct": round(stats["spread_pct"], 1),
            "repeats": stats["repeats"],
            "flops_per_step": float(f"{flops:.3g}"),
            "tflops_sustained": round(sustained / 1e12, 2),
            # VPU-bound collapsed rows: the matmul ceiling doesn't apply
            "mfu_pct_of_achievable": (round(
                100 * sustained / achievable_ceiling(M), 1)
                if mxu_bound else None),
            # ... their ceiling is the measured psi2 dominant-op rate
            "pct_of_psi2_roofline": (round(100 * psi_ideal * rate, 1)
                                     if psi_ideal else None),
            "final_loss": round(loss, 2),
        }
        _flag_vs_prior(row, dispatch_ms=1e3 * inner / max(rate, 1e-9))
        rows.append(row)
        mfu_txt = (f", {100 * sustained / achievable_ceiling(M):.1f}% "
                   f"of achievable" if mxu_bound
                   else f", {100 * psi_ideal * rate:.1f}% of psi2 "
                        f"roofline" if psi_ideal else " (VPU-bound)")
        print(f"# {name}: {rate:.1f} steps/s "
              f"[{stats['steps_per_sec_min']:.1f}, "
              f"{stats['steps_per_sec_max']:.1f}] "
              f"(device {dev_rate:.1f}), "
              f"{sustained / 1e12:.1f} TFLOP/s{mfu_txt}",
              file=sys.stderr, flush=True)
    return rows


def _prior_bench_rows(root=None):
    """Matrix/serving rows of the newest committed bench record, keyed
    by row name — the round-over-round comparability anchor (round-3
    VERDICT weak #1).  Preference order: the committed BENCH_FULL.json
    (the full record bench.py writes since round 5 — the driver's
    BENCH_r*.json tail capture truncated the r3/r4 records), then the
    newest BENCH_r*.json with per-row recovery from its (possibly
    front-truncated) tail."""
    import glob
    here = root or os.path.dirname(os.path.abspath(__file__))
    full = os.path.join(here, "BENCH_FULL.json")
    if os.path.exists(full):
        try:
            with open(full) as f:
                rec = json.load(f)
            rows = {}
            for r in rec.get("matrix", []) + rec.get("serving", []):
                rows[r["name"]] = r
            if rows:
                return rows, "BENCH_FULL.json"
        except Exception:
            pass
    files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not files:
        return {}, None
    try:
        with open(files[-1]) as f:
            txt = f.read()
        # driver format: {"n":..,"cmd":..,"rc":..,"tail": "<json>"} —
        # and the tail may be FRONT-TRUNCATED (last-N-bytes capture), so
        # a whole-line parse can fail.  Fall back to recovering the flat
        # per-row objects ({"name": ...}) individually.
        rec = json.loads(txt)
        if isinstance(rec, dict) and "tail" in rec:
            tail = rec["tail"].strip().splitlines()[-1]
            try:
                rec = json.loads(tail)
            except Exception:
                rec = {"matrix": [
                    json.loads(m) for m in re.findall(
                        r'\{"name":[^{}]*\}', tail)]}
        rows = {}
        for r in rec.get("matrix", []) + rec.get("serving", []):
            rows[r["name"]] = r
        return rows, os.path.basename(files[-1])
    except Exception:
        return {}, None


_PRIOR_ROWS, _PRIOR_FILE = None, None


def _load_priors():
    """Eagerly load the prior-round rows (called at the top of main(),
    BEFORE any measurement — this process later overwrites
    BENCH_FULL.json, so the anchor must be captured first)."""
    global _PRIOR_ROWS, _PRIOR_FILE
    if _PRIOR_ROWS is None:
        _PRIOR_ROWS, _PRIOR_FILE = _prior_bench_rows()
    return _PRIOR_ROWS


def _flag_vs_prior(row, dispatch_ms=None):
    """Annotate a freshly measured row with the prior round's number and
    a regression flag.

    Flag basis (round-4 VERDICT next #2): when both rounds carry a
    ``device_steps_per_sec`` (RTT-corrected pure device rate), compare
    THOSE with a tight 12% floor — device time doesn't see tunnel/host
    congestion, so the old 45% dispatch-bound floor (which let 6 of 9
    rows lose 45% silently) is retired on that path.  Against a
    pre-round-5 prior (request rates only) the legacy request-rate rule
    applies once more: 10% floor compute-bound, 45% for rows whose
    per-dispatch work is under ~100 ms (mnist_dgp2 measured 455-1328
    steps/s across quiet/contended sessions, PERF.md).  A row measured
    on a congested host (sentinel) gets ``regressed_vs_prior: null`` —
    explicitly indeterminate rather than silently wrong."""
    _load_priors()
    prior = _PRIOR_ROWS.get(row["name"])
    if not prior:
        return
    if "steps_per_sec" in row and "steps_per_sec" in prior:
        prev = prior["steps_per_sec"]
        row["prior_steps_per_sec"] = prev
        if row.get("congested"):
            row["regressed_vs_prior"] = None
            return
        prev_dev = prior.get("device_steps_per_sec")
        if prev_dev and row.get("device_steps_per_sec"):
            row["prior_device_steps_per_sec"] = prev_dev
            # the 12% floor widens with the row's own demonstrated
            # within-run spread (the legacy branch's rule) — a noisy-
            # but-uncongested row can't trip on its own noise
            tol = max(row.get("spread_pct", 0.0) / 100.0, 0.12)
            row["regressed_vs_prior"] = bool(
                row["device_steps_per_sec"] < prev_dev * (1.0 - tol))
            return
        floor = (0.45 if dispatch_ms is not None and dispatch_ms < 100
                 else 0.10)
        tol = max(row.get("spread_pct", 0.0) / 100.0, floor)
        row["regressed_vs_prior"] = bool(
            row.get("steps_per_sec_max", row["steps_per_sec"])
            < prev * (1.0 - tol))
    elif "latency_ms" in row and "latency_ms" in prior:
        prev = prior["latency_ms"]
        row["prior_latency_ms"] = prev
        if row.get("congested"):
            row["regressed_vs_prior"] = None
            return
        prev_dev = prior.get("device_ms")
        if prev_dev and row.get("device_ms"):
            # flag on the scan-amortized DEVICE time: best-of request
            # latency on this tunnel swings ~2x between QUIET runs
            # (measured 1.78 -> 4.04 ms same-day, round-5), so a
            # latency-based flag is either vacuous or noise; the
            # device leg is what a real serving regression moves.
            # Fixed 12% tolerance — spread_pct here is LATENCY spread
            # (the noise the device leg escapes), so widening by it
            # would re-import exactly that noise into the flag.
            row["prior_device_ms"] = prev_dev
            row["regressed_vs_prior"] = bool(
                row["device_ms"] > prev_dev * 1.12)
            return
        # legacy (pre-device-leg prior): best-of-repeats latency
        tol = max(row.get("spread_pct", 0.0) / 100.0, 0.10)
        row["regressed_vs_prior"] = bool(
            row["latency_ms"] > prev * (1.0 + tol))


SERVING_S = 100          # the reference eval loop: S=100 mixture samples
SERVING_BATCH = 1000     # the reference streaming-eval batch


def _serving_device_ms(call2, x0, key, iters=50, n=6):
    """Scan-amortized pure device time per request (ms):
    ``call2(X, key)`` applied ``iters`` times inside one jitted
    lax.scan with a value-coupling term (the
    scripts/bench_serving_ab.py device-leg methodology).  Request
    latency on this tunnel swings ~2x between QUIET runs (measured
    round-5: best-of-8 1.78 -> 4.04 ms across two same-day uncongested
    sessions), so serving regression flags fire on THIS number; the
    latency stays the production view."""
    import jax
    import jax.numpy as jnp

    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call

    @jax.jit
    def run(x, k):
        x = x + 0.0 * jax.random.uniform(k, (), x.dtype)

        def body(c, kk):
            out = call2(c, kk)
            # couple EVERY output leaf back into the carry: coupling
            # only the first (the mean) would let XLA dead-code-
            # eliminate the variance path out of the measured program
            coupling = sum(jnp.mean(leaf)
                           for leaf in jax.tree_util.tree_leaves(out))
            return c + 0.0 * coupling, None

        c, _ = jax.lax.scan(body, x, jax.random.split(k, iters))
        return c.ravel()[0]

    t = timed_per_call(
        lambda i: run(x0, jax.random.fold_in(key, i + (1 << 21))), n=n)
    return t * 1e3 / iters


def run_serving(args, X, Y):
    """Prediction-path throughput on the headline 5-layer model: jitted
    predict_y / predict_density at the reference's streaming-eval shape
    (1000-row batches, S=100 — run_regression.py's test loop and
    evaluate_regression's contract).  Reports points/sec and per-batch
    latency; serving is the other half of the production story and is
    NOT dispatch-amortizable by lax.scan (one request = one dispatch)."""
    import jax
    import jax.numpy as jnp

    model = build_regression(X, Y, args.layers, 100, args.num_samples)
    B = min(SERVING_BATCH, X.shape[0])
    Xs = jnp.asarray(X[:B])
    Ys = jnp.asarray(Y[:B])
    key = jax.random.PRNGKey(0)

    py = jax.jit(lambda m, x, k: m.predict_y(x, SERVING_S, key=k))
    pd = jax.jit(lambda m, x, y, k: m.predict_density(x, y, SERVING_S,
                                                      key=k))

    # Timing methodology (tunneled-TPU pitfall, PERF.md round-2):
    # unique-input dispatch + scalar-readback sync with RTT
    # subtraction, owned by utils/timing.py.
    from doubly_stochastic_dgp_tpu.utils.timing import timed_per_call_stats

    # Cached-posterior serving (models/posterior.py): staging factors
    # (Lu^{-1}, alpha, C) precomputed once, so the per-request program
    # is gram + MXU matmuls only — no Cholesky/inverse per call.
    from doubly_stochastic_dgp_tpu import make_server, precompute
    post = precompute(model)
    pyc = jax.jit(lambda m, x, k: m.predict_y(x, SERVING_S, key=k))

    # The production form (round-4 PERF.md serving verdict, shipped as
    # serving.make_server): cached factors baked into the program as
    # closure-jit constants — no per-request model-pytree leaf handling.
    server = make_server(model, SERVING_S)

    rows = []
    for name, fn, fnargs, call2 in [
            ("serve_predict_y", py, (model, Xs),
             lambda x, k: py(model, x, k)),
            ("serve_predict_y_cached", pyc, (post, Xs),
             lambda x, k: pyc(post, x, k)),
            ("serve_predict_y_server", server, (Xs,),
             lambda x, k: server(x, key=k)),
            ("serve_predict_density", pd, (model, Xs, Ys),
             lambda x, k: pd(model, x, Ys, k))]:
        for attempt in range(2):
            rtt0 = _rtt_probe_ms()
            if name == "serve_predict_y_server":
                call = (lambda i, fn=fn, fnargs=fnargs:
                        fn(*fnargs, key=jax.random.fold_in(key, 1 + i)))
            else:
                call = (lambda i, fn=fn, fnargs=fnargs:
                        fn(*fnargs, jax.random.fold_in(key, 1 + i)))
            # serving blocks are ~1 s each: run more of them than the
            # matrix rows so best-of-N actually reaches the quiet
            # floor (the round-5 congested-leg spread hit 109% at 3)
            stats = timed_per_call_stats(
                call, repeats=max(getattr(args, "repeats", 3), 8))
            rtt1 = _rtt_probe_ms()
            congested = max(rtt0, rtt1) > CONGESTED_RTT_MS
            if not congested:
                break
            print(f"# {name}: congested host (rtt {rtt0:.1f}/"
                  f"{rtt1:.1f} ms)"
                  f"{' — re-running' if attempt == 0 else ''}",
                  file=sys.stderr, flush=True)
        best = stats["best"]
        dev_ms = _serving_device_ms(call2, Xs, key)
        row = {
            "name": name, "batch": B, "S": SERVING_S,
            "latency_ms": round(best * 1e3, 2),
            "latency_ms_median": round(stats["median"] * 1e3, 2),
            "latency_ms_max": round(stats["max"] * 1e3, 2),
            "device_ms": round(dev_ms, 3),
            "rtt_ms": round(min(rtt0, rtt1), 2),
            "congested": congested,
            "spread_pct": round(stats["spread_pct"], 1),
            "repeats": stats["repeats"],
            "points_per_sec": round(B / best, 1),
        }
        _flag_vs_prior(row)
        rows.append(row)
        print(f"# {name}: {best * 1e3:.2f} ms/batch "
              f"[median {stats['median'] * 1e3:.2f}, "
              f"max {stats['max'] * 1e3:.2f}, "
              f"device {dev_ms:.3f}], "
              f"{B / best:.0f} points/s", file=sys.stderr, flush=True)
    return rows


def _compact_record(out):
    """One-line summary of the full record, guaranteed to fit the
    driver's 2000-char stdout-tail capture (round-4 VERDICT next #1:
    BENCH_r03/r04 had ``parsed: null`` because the full record outgrew
    the tail).  Keeps the driver contract fields (metric/value/unit/
    vs_baseline) and compresses each matrix/serving row to its
    essentials; the complete record is in BENCH_FULL.json (committed)
    and on stderr."""
    c = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "vs_baseline": out["vs_baseline"],
        "platform": out.get("platform"),
        "precision": out.get("precision"),
        "congested": out.get("congested"),
        "mfu_pct": out.get("mfu_pct_of_achievable"),
        "throughput_mode_sps": out.get("throughput_mode", {}).get(
            "steps_per_sec"),
        "full_record": "BENCH_FULL.json",
    }
    if "matrix" in out:
        c["matrix"] = {
            r["name"]: {
                "sps": r["steps_per_sec"],
                "dev": r.get("device_steps_per_sec"),
                "pct": (r.get("mfu_pct_of_achievable")
                        if r.get("mfu_pct_of_achievable") is not None
                        else r.get("pct_of_psi2_roofline")),
                "reg": r.get("regressed_vs_prior"),
                **({"hot": True} if r.get("congested") else {}),
            }
            for r in out["matrix"]}
    if "serving" in out:
        c["serving"] = {
            r["name"]: {
                "ms": r["latency_ms"],
                "dev": r.get("device_ms"),
                "reg": r.get("regressed_vs_prior"),
                **({"hot": True} if r.get("congested") else {}),
            }
            for r in out["serving"]}
    return c


def _emit(out):
    """Full record -> BENCH_FULL.json + stderr; compact one-liner ->
    stdout (the ONLY stdout line, so the driver tail always parses)."""
    full = json.dumps(out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FULL.json")
    try:
        with open(path, "w") as f:
            f.write(full + "\n")
    except OSError:
        pass
    print(full, file=sys.stderr, flush=True)
    line = json.dumps(_compact_record(out), separators=(",", ":"))
    if len(line) > 1900:     # belt and braces: never outgrow the tail
        line = json.dumps({k: v for k, v in _compact_record(out).items()
                           if k not in ("matrix", "serving")},
                          separators=(",", ":"))
    print(line, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=1000)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--pallas", action="store_true", default=False)
    p.add_argument("--inner-steps", type=int, default=50,
                   help="steps per XLA dispatch (lax.scan amortization)")
    p.add_argument("--no-matrix", action="store_true",
                   help="headline config only")
    p.add_argument("--matrix-steps", type=int, default=60)
    p.add_argument("--matrix-inner-steps", type=int, default=20)
    p.add_argument("--repeats", type=int, default=3,
                   help="independent timed blocks per row; the JSON "
                        "carries {median, min, max, spread_pct} so "
                        "round-over-round deltas are separable from "
                        "dispatch/tunnel noise")
    p.add_argument("--with-cpu", action="store_true",
                   help="also measure the CPU backend for vs_baseline")
    p.add_argument("--precision", default=None,
                   help="override conditional matmul precision "
                        "('default'|'highest') for all configs")
    p.add_argument("--only", default=None,
                   help="regex over matrix row names; skips the headline "
                        "+ serving sections and runs only matching rows")
    args = p.parse_args()

    import jax
    from doubly_stochastic_dgp_tpu.config import config
    _enable_compile_cache()
    _set_numerics(args)
    _load_priors()           # BEFORE this run overwrites BENCH_FULL.json
    X, Y, real = _regression_data()
    platform = jax.devices()[0].platform

    if args.only:
        out = {"platform": platform, "matrix": run_matrix(args, X, Y)}
        print(json.dumps(out), file=sys.stderr, flush=True)
        compact = _compact_record(
            {"metric": "matrix_only", "value": None, "unit": None,
             "vs_baseline": None, "platform": platform,
             "matrix": out["matrix"]})
        # partial runs never write BENCH_FULL.json — don't point at a
        # stale one
        compact.pop("full_record", None)
        print(json.dumps(compact, separators=(",", ":")))
        return

    rtt_headline = _rtt_probe_ms()
    model = build_regression(X, Y, args.layers, 100, args.num_samples)
    # flops from the pytree BEFORE measure() donates its buffers
    flops = step_flops(model, 100, args.num_samples, args.batch)
    hstats, loss, _ = measure_stats(model, args.batch, args.steps,
                                    inner_steps=args.inner_steps,
                                    repeats=args.repeats)
    rate = hstats["steps_per_sec"]

    # throughput mode: the same step at precision='default' (the
    # bf16-class matmul path; the r01 headline contract).  The headline
    # above runs the framework default precision ('mixed' — f64-class
    # trajectories, see PERF.md); this row keeps the max-throughput
    # number comparable across rounds.  Fresh build: the scanned train
    # step donates the model's buffers on TPU, so the measured model
    # must not be reused.
    from doubly_stochastic_dgp_tpu import with_config
    tp_model = with_config(
        build_regression(X, Y, args.layers, 100, args.num_samples),
        precision="default")
    tp_rate, tp_loss, _ = measure(tp_model, args.batch, args.steps,
                                  inner_steps=args.inner_steps)

    baseline = CPU_BASELINE_STEPS_PER_SEC
    if args.with_cpu:
        cpu_devs = jax.devices("cpu")
        with jax.default_device(cpu_devs[0]):
            m2 = build_regression(X, Y, args.layers, 100,
                                  args.num_samples)
            baseline, _, _ = measure(m2, args.batch,
                                     max(10, args.steps // 10),
                                     inner_steps=args.inner_steps)

    rtt_after = _rtt_probe_ms()
    rtt_ms = min(rtt_headline, rtt_after)
    dev_rate = args.inner_steps / max(
        hstats["sec_per_dispatch_best"]
        - rtt_ms / 1e3 / hstats["n_calls"],
        0.3 * hstats["sec_per_dispatch_best"])
    out = {
        "metric": "elbo_steps_per_sec (kin8nm-shape, 5-layer DGP, "
                  "M=100, S=10, batch=1000)",
        "value": round(rate, 3),
        "unit": "steps/sec",
        "steps_per_sec_min": round(hstats["steps_per_sec_min"], 3),
        "steps_per_sec_max": round(hstats["steps_per_sec_max"], 3),
        "device_steps_per_sec": round(dev_rate, 3),
        "rtt_ms": round(rtt_ms, 2),
        "congested": bool(max(rtt_headline, rtt_after)
                          > CONGESTED_RTT_MS),
        "spread_pct": round(hstats["spread_pct"], 1),
        "vs_baseline": round(rate / baseline, 3),
        "platform": platform,
        "real_kin8nm": real,
        "final_loss": round(loss, 3),
        "tflops_sustained": round(flops * rate / 1e12, 2),
        "mfu_pct_of_achievable": round(
            100 * flops * rate / achievable_ceiling(100), 1),
        "precision": config.matmul_precision,
        "throughput_mode": {
            "precision": "default",
            "steps_per_sec": round(tp_rate, 3),
            "vs_baseline": round(tp_rate / baseline, 3),
            "final_loss": round(tp_loss, 3),
        },
    }
    if not args.no_matrix:
        out["matrix"] = run_matrix(args, X, Y)
        out["serving"] = run_serving(args, X, Y)
    _emit(out)


if __name__ == "__main__":
    main()
