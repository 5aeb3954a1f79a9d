"""Fused Pallas psi2-core kernel vs the dense XLA reference contract
(interpret mode on CPU; the real-TPU A/B lives in
scripts/bench_psi2_kernel.py and PERF.md round-4).

The kernel computes sum_n exp(logdet_n + min(U_na + V_nb
- sum_d w_nd Z_ad Z_bd, 0)) without materializing the (N, M, M) block
to HBM — the op profile_collapsed_scan.py measured at >50% of a
compute-bound collapsed step (reference consumes psi2 via
gpflow.expectations at layers.py:415-417).
"""

import jax
import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_allclose

from doubly_stochastic_dgp_tpu.ops.pallas.psi2 import (
    _block_rows, psi2_core, psi2_core_reference, psi2_kernel_supported)


def _case(N, M, D, seed=0, spread=0.5):
    rng = np.random.RandomState(seed)
    U = jnp.asarray(rng.randn(N, M).astype("float32") * spread - 0.2)
    V = jnp.asarray(rng.randn(N, M).astype("float32") * spread - 0.2)
    w = jnp.asarray(rng.rand(N, D).astype("float32"))
    logdet = jnp.asarray(rng.randn(N, 1).astype("float32") * 0.3)
    Z = jnp.asarray(rng.randn(M, D).astype("float32") * 0.5)
    return U, V, w, logdet, Z


def test_forward_matches_reference_including_padded_tail():
    # N deliberately not a multiple of the block size: the padded rows
    # must contribute exactly zero (logdet sentinel underflows exp).
    # Covers BOTH forwards: the production hybrid (blocked XLA) and the
    # all-Pallas variant kept for the A/B record.
    from doubly_stochastic_dgp_tpu.ops.pallas.psi2 import (
        psi2_core_pallas_fwd)

    for N, M, D in [(37, 20, 3), (130, 9, 1)]:
        U, V, w, logdet, Z = _case(N, M, D)
        assert N % _block_rows(M) != 0
        ref = psi2_core_reference(U, V, w, logdet, Z)
        for fwd in (psi2_core, psi2_core_pallas_fwd):
            out = fwd(U, V, w, logdet, Z, True)
            assert_allclose(np.asarray(out), np.asarray(ref),
                            rtol=2e-6, atol=2e-5)


def test_gradients_match_reference_all_operands():
    N, M, D = 41, 12, 2
    U, V, w, logdet, Z = _case(N, M, D, seed=1)
    rng = np.random.RandomState(2)
    g = jnp.asarray(rng.randn(M, M).astype("float32"))

    def loss(core):
        return lambda *a: jnp.sum(g * core(*a))

    gk = jax.grad(loss(lambda *a: psi2_core(*a, True)),
                  argnums=(0, 1, 2, 3, 4))(U, V, w, logdet, Z)
    gr = jax.grad(loss(psi2_core_reference),
                  argnums=(0, 1, 2, 3, 4))(U, V, w, logdet, Z)
    for a, b in zip(gk, gr):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                        rtol=0, atol=3e-6)


def test_clamp_gate_zeroes_quadratic_gradients_but_not_logdet():
    # push every pre-clamp exponent positive: U, V large positive and
    # w == 0 -> min(.., 0) is active everywhere, so gU/gV/gw/gZ == 0
    # while glogdet stays the full (ungated) exponential mass
    N, M, D = 16, 6, 2
    U = jnp.full((N, M), 3.0, dtype=jnp.float32)
    V = jnp.full((N, M), 2.0, dtype=jnp.float32)
    w = jnp.zeros((N, D), dtype=jnp.float32)
    logdet = jnp.full((N, 1), -0.5, dtype=jnp.float32)
    Z = jnp.asarray(np.random.RandomState(3).randn(M, D)
                    .astype("float32"))

    gk = jax.grad(lambda *a: jnp.sum(psi2_core(*a, True)),
                  argnums=(0, 1, 2, 3, 4))(U, V, w, logdet, Z)
    gU, gV, gw, glogdet, gZ = gk
    assert float(jnp.max(jnp.abs(gU))) == 0.0
    assert float(jnp.max(jnp.abs(gV))) == 0.0
    assert float(jnp.max(jnp.abs(gw))) == 0.0
    assert float(jnp.max(jnp.abs(gZ))) == 0.0
    assert_allclose(np.asarray(glogdet),
                    np.full((N, 1), M * M * np.exp(-0.5), "float32"),
                    rtol=1e-5)


def test_supported_gate():
    f32, f64 = jnp.float32, jnp.float64
    assert psi2_kernel_supported(8192, 256, 8, f32)
    assert psi2_kernel_supported(1500, 100, 1, f32)
    assert not psi2_kernel_supported(8192, 1024, 8, f32)   # M too big
    assert not psi2_kernel_supported(8192, 256, 64, f32)   # D too big
    assert not psi2_kernel_supported(8192, 256, 8, f64)    # f64 -> XLA
    assert not psi2_kernel_supported(10 ** 6, 256, 8, f32)  # staging cap

    # profitability = the round-5 MEASURED win region (D and M gates)
    from doubly_stochastic_dgp_tpu.ops.pallas.psi2 import (
        psi2_kernel_profitable)

    assert psi2_kernel_profitable(8192, 256, 8, f32)
    assert psi2_kernel_profitable(8192, 128, 2, f32)
    assert not psi2_kernel_profitable(8192, 100, 2, f32)   # M < 128:
    # XLA fully fuses below one lane tile (5-6x measured loss)
    assert not psi2_kernel_profitable(8192, 256, 9, f32)   # D > 8


def _psi_case(N, M, D, seed=0):
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import temp_config

    rng = np.random.RandomState(seed)
    mu = jnp.asarray(rng.randn(N, D).astype("float32"))
    S = jnp.asarray((rng.rand(N, D) * 0.1 + 1e-3).astype("float32"))
    Z = jnp.asarray(rng.randn(M, D).astype("float32"))
    # f32 kernel params (the kernel's dtype domain; the suite default
    # is f64)
    with temp_config(float_dtype="float32"):
        kern = dsd.RBF.make(D, lengthscales=1.3, variance=0.7)
    return kern, mu, S, Z


def test_psi2_route_gates():
    from doubly_stochastic_dgp_tpu.config import temp_config
    from doubly_stochastic_dgp_tpu.ops.psi_stats import _psi2_route

    # CPU backend: 'auto' never picks the kernel; 'pallas' forces it in
    # interpret mode inside the hard shape limits and falls back beyond
    with temp_config(psi2_impl="auto"):
        assert _psi2_route(100, 20, 1, jnp.float32) == ("xla", False)
    with temp_config(psi2_impl="pallas"):
        assert _psi2_route(100, 20, 1, jnp.float32) == ("pallas", True)
        assert _psi2_route(100, 1024, 1, jnp.float32) == ("xla", False)
    with temp_config(psi2_impl="xla"):
        assert _psi2_route(100, 20, 1, jnp.float32) == ("xla", False)


def test_psi2_kernel_path_matches_xla_path():
    """The integrated kernel path (forced, interpret mode) reproduces
    the blocked XLA path's psi2 to f32 rounding — including through a
    Sum kernel (cross terms route per-pair) — and its mu/S/Z/ls/var
    gradients match."""
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import temp_config
    from doubly_stochastic_dgp_tpu.ops.psi_stats import psi_statistics

    kern, mu, S, Z = _psi_case(67, 12, 2, seed=4)

    def run():
        return psi_statistics(kern, mu, S, Z)

    with temp_config(psi2_impl="xla"):
        p0x, p1x, p2x = run()
    with temp_config(psi2_impl="pallas"):
        p0p, p1p, p2p = run()
    np.testing.assert_array_equal(np.asarray(p0x), np.asarray(p0p))
    np.testing.assert_array_equal(np.asarray(p1x), np.asarray(p1p))
    scale = float(jnp.max(jnp.abs(p2x)))
    assert_allclose(np.asarray(p2p), np.asarray(p2x),
                    rtol=0, atol=3e-6 * scale)

    def loss(mu, S, Z, impl):
        with temp_config(psi2_impl=impl):
            _, _, p2 = psi_statistics(kern, mu, S, Z)
        return jnp.sum(p2 ** 2)

    gx = jax.grad(loss, argnums=(0, 1, 2))(mu, S, Z, "xla")
    gp = jax.grad(loss, argnums=(0, 1, 2))(mu, S, Z, "pallas")
    for a, b in zip(gp, gx):
        s = max(float(jnp.max(jnp.abs(b))), 1.0)
        assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                        rtol=0, atol=5e-5)


def test_psi2_kernel_path_sum_kernel_cross_terms():
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import temp_config
    from doubly_stochastic_dgp_tpu.ops.psi_stats import psi_statistics

    _, mu, S, Z = _psi_case(41, 9, 1, seed=5)
    from doubly_stochastic_dgp_tpu.config import temp_config
    with temp_config(float_dtype="float32"):
        kern = (dsd.RBF.make(1, lengthscales=0.8, variance=1.1)
                + dsd.RBF.make(1, lengthscales=2.0, variance=0.4))
    with temp_config(psi2_impl="xla"):
        _, _, p2x = psi_statistics(kern, mu, S, Z)
    with temp_config(psi2_impl="pallas"):
        _, _, p2p = psi_statistics(kern, mu, S, Z)
    scale = float(jnp.max(jnp.abs(p2x)))
    assert_allclose(np.asarray(p2p), np.asarray(p2x),
                    rtol=0, atol=3e-6 * scale)


def test_damianou_trains_finite_under_kernel_route():
    """Integration net for the round-4 NaN class: a small Damianou
    stack whose psi layer routes through the hybrid kernel (forced,
    interpret mode) must train finite — the original failure was psi2
    ulps flipping chol(B) past the ladder's old top rung (see
    safe_cholesky_ladder's round-4 note), i.e. an interaction only a
    training run exercises."""
    import optax
    import doubly_stochastic_dgp_tpu as dsd
    from doubly_stochastic_dgp_tpu.config import temp_config
    from doubly_stochastic_dgp_tpu.training.loop import (
        make_sgd_train_step)
    from doubly_stochastic_dgp_tpu.training.optim import masked_optimizer

    rng = np.random.RandomState(0)
    Xd = rng.randn(48, 3).astype("float32")
    Yd = np.sin(Xd[:, :1]) + 0.05 * rng.randn(48, 1).astype("float32")
    Z = Xd[:12].copy()
    with temp_config(float_dtype="float32", solve_mode="inverse",
                     jitter=1e-5, psi2_impl="pallas"):
        kerns = [dsd.RBF.make(3), dsd.RBF.make(2)]
        model = dsd.DGPDamianou.build(Xd, Yd, Z, kerns,
                                      dsd.Gaussian.make(0.05))
        tx = masked_optimizer(optax.adam(0.01), model)
        st = tx.init(model)
        step = make_sgd_train_step(tx, batch_size=None)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(10):
            model, st, loss = step(model, st, jax.random.fold_in(key, i))
            losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0]


def test_mxu_backward_matches_reference_all_operands():
    """The MXU-contraction backward kernel (round-5: D-independent op
    count for the D >= _BWD_MXU_MIN_D region) produces the same
    gradients as the dense reference for every operand, across D on
    both sides of the kernel-selection threshold and with a padded
    tail."""
    from doubly_stochastic_dgp_tpu.ops.pallas.psi2 import (
        _psi2_core_bwd_call)

    for N, M, D in [(41, 12, 1), (37, 20, 3), (130, 9, 8)]:
        U, V, w, logdet, Z = _case(N, M, D, seed=D)
        rng = np.random.RandomState(2)
        g = jnp.asarray(rng.randn(M, M).astype("float32"))
        gr = jax.grad(
            lambda *a: jnp.sum(g * psi2_core_reference(*a)),
            argnums=(0, 1, 2, 3, 4))(U, V, w, logdet, Z)
        gk = _psi2_core_bwd_call(U, V, w, logdet, Z, g,
                                 interpret=True, bwd_impl="mxu")
        for a, b in zip(gk, gr):
            scale = max(float(jnp.max(jnp.abs(b))), 1.0)
            assert_allclose(np.asarray(a) / scale,
                            np.asarray(b) / scale, rtol=0, atol=3e-6)
