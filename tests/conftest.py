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


# ---------------------------------------------------------------------------
# Fast tier (round-1 VERDICT next-step #9): centralized slow-marking.
# ``pytest -m "not slow"`` is the quick feedback loop on 1-CPU
# containers; the slow mass is grad-of-shard_map compiles (mesh tests),
# subprocess demos, HMC end-to-end runs, and the biggest f64 oracles.
# Durations source: full-suite --durations=60 (BENCH round-2 session).
# ---------------------------------------------------------------------------
SLOW_FILES = {
    "test_parallel.py", "test_outdim.py", "test_dp_collapsed.py",
    "test_demos.py", "test_fused_layer.py", "test_multihost.py",
    "test_mcmc_mesh.py",
}
SLOW_TESTS = {
    "test_solve_modes.py::test_conditional_modes_agree[True]",
    "test_solve_modes.py::test_mixed_high_tier_pins_high_on_staging",
    "test_dgp.py::TestStepUp::test_dim_increase",
    "test_single_layer_models.py::test_fitc_diag_variance_clamped_nonnegative",
    "test_zoo.py::test_sgpmc_layer_hmc_smoke",
    "test_psi_stats.py::test_psi2_blocked_equals_unblocked",
    "test_posterior.py::test_precompute_warns_on_multi_stochastic_inner_draw",
    "test_posterior.py::test_export_predict_y_cached_single_layer",
    "test_posterior.py::test_cached_heinonen_matches_live",
    "test_solve_modes.py::test_precision_knob_pins_highest_and_matches_f64",
    "test_psi_stats.py::test_psi_statistics_grads_match_finite_differences",
    "test_bench.py::test_graft_dryrun_multichip",
    "test_bench.py::test_bench_serving_rows_tiny",
    "test_bench.py::test_bench_measure_stats_tiny",
    "test_real_data_path.py::test_run_regression_cli_on_cached_csv",
    "test_float32.py::test_f32_elbo_tracks_f64",
    "test_float32.py::test_f32_training_finite_while_escalation_fires",
    "test_zoo.py::test_heinonen_vs_degenerate_dgp2",
    "test_zoo.py::test_heteroscedastic_smoke",
    "test_zoo.py::test_heteroscedastic_predict_y_integrates_noise_head",
    "test_zoo.py::test_heteroscedastic_predict_density_shape_and_mc",
    "test_zoo.py::test_sgpmc_hmc_matches_dense_gpmc_at_Z_eq_X",
    "test_zoo.py::test_heinonen_hmc_end_to_end_posterior_predictive",
    "test_oracle_independence.py::"
    "test_natgrad_optimal_svgp_predictions_equal_exact_gpr",
    "test_single_layer_models.py::"
    "test_svgp_elbo_below_sgpr_and_tight_after_natgrad",
    "test_single_layer_models.py::test_sgpr_titsias",
    "test_collapsed.py::test_natgrad_one_step_equals_collapsed",
    "test_collapsed.py::test_single_layer_collapsed_vs_exact_gpr",
    "test_kernels.py::TestExtendedKernels::test_composition_and_dgp_layer",
    "test_dgp.py::TestVsSingleLayer::test_gaussian",
    "test_dgp.py::TestVsSingleLayer::test_multiclass",
    "test_dgp.py::TestInputProp::test_input_prop_stack",
    "test_damianou.py::test_full_cov_propagation_adds_inner_noise_on_diagonal",
    "test_damianou.py::test_bound_is_below_true_log_marginal",
    "test_damianou.py::test_bound_is_quadratic_in_targets",
    "test_damianou.py::test_training_improves_bound_and_fit",
    "test_serving.py::test_export_predict_y_damianou_roundtrip",
    "test_serving.py::test_artifact_callable_in_fresh_process",
    "test_posterior.py::test_cached_export_roundtrip",
    "test_posterior.py::test_cached_full_cov_matches_solve_mode",
    "test_posterior.py::test_cached_input_prop_and_sgpmc",
    "test_training.py::test_lbfgs_improves",
    "test_training.py::test_checkpoint_orbax_roundtrip",
    "test_likelihoods.py::test_zero_variance_gradients_finite",
    "test_likelihoods.py::TestMultiClass::test_prob_is_largest_vs_mc",
    "test_pallas_gram.py::test_gradient_parity",
    "test_pallas_conditional.py::test_gradient_parity_with_clamp_active",
    "test_pallas_conditional.py::test_gradient_parity_multi_tile",
    "test_fused_layer.py::test_fused_ill_conditioned_1d_f32_trains_like_solve",
    "test_gradients.py::test_kl_nonnegative_property",
    "test_solve_modes.py::"
    "test_inverse_mode_ill_conditioned_1d_f32_trains_like_solve",
    # mid-size trims: each component keeps a cheaper oracle in the fast
    # tier (e.g. TestQuad determinism, psi blocked/zero-var/cross-term
    # oracles, pallas forward parity, FITC==GPR at Z=X)
    "test_dgp.py::TestVsSingleLayer::test_bernoulli",
    "test_dgp.py::TestQuad::test_quadrature_vs_mc",
    "test_float32.py::test_collapsed_bound_variance_floor_f32",
    "test_float32.py::"
    "test_collapsed_conditional_variances_nonnegative_near_degenerate",
    "test_psi_stats.py::test_random_sum_compositions_vs_quadrature",
    "test_pallas_conditional.py::test_gradient_parity",
    "test_single_layer_models.py::test_fitc_vs_dense_marginal",
    # round-3 re-tier (VERDICT weak #6): the continuation sessions'
    # heaviest additions move out of the fast tier; kept-fast oracles
    # per component: posterior -> cached_equals_live_inverse +
    # cached_heinonen; dynamic -> one_compile_services_every_S;
    # training -> donated-model guard + fit oracles.
    "test_training.py::test_remat_is_value_and_grad_exact_and_in_jaxpr",
    "test_training.py::test_training_objective_includes_parameter_priors",
    "test_posterior.py::test_cached_collapsed_composes_with_mesh_prediction",
    "test_posterior.py::test_cached_collapsed_sgpr_matches_live",
    "test_posterior.py::test_cached_damianou_matches_live",
    "test_posterior.py::test_cached_single_layer_baselines_match_live",
    "test_zoo.py::test_sgpmc_multi_output_hidden_layer",
    "test_dynamic.py::test_exact_vs_plain_methods_single_layer",
    # round-3 continuation: pipeline parallelism — mesh/scan/ppermute
    # compiles are heavy; the fast tier keeps the cheap pp_stack/pp_specs
    # validity oracles (unlisted)
    "test_pp.py::test_pp_elbo_matches_single_device",
    "test_pp.py::test_pp_elbo_two_layers_per_stage",
    "test_pp.py::test_pp_keyed_matches_single_device_emulation",
    "test_pp.py::test_pp_grads_match_single_device",
    "test_pp.py::test_pp_dp_composed_matches_single_device",
    "test_pp.py::test_pp_params_actually_shard_and_step_improves",
    "test_pp.py::test_pp_split_final_matches_single_device",
    "test_pp.py::test_pp_split_final_grads_match_single_device",
    "test_pp.py::test_pp_split_final_keyed_and_trains",
    "test_pp.py::test_pp_remat_value_and_grad_exact",
    "test_pp.py::test_pp_bubble_warning_fires_below_2x_stages",
    # round-4: fused chol+inverse — the fast tier keeps the bitwise
    # forward, the solve-free jaxpr pin, and the tri_solve(Li=) oracle
    "test_linalg.py::test_safe_cholesky_inv_grad_matches_unfused",
    "test_linalg.py::test_safe_cholesky_ladder_inv_escalates_with_finite_grads",
    # (the fused-chol ops are unwired infrastructure since the round-4
    # revert — their remaining fast-tier presence is the solve-free
    # jaxpr pin; the bitwise-fwd and tri_solve(Li=) oracles ride slow)
    "test_linalg.py::test_safe_cholesky_inv_forward_bitwise_vs_unfused",
    "test_linalg.py::test_tri_solve_precomputed_inverse",
    # round-4: hybrid psi2 kernel — fast tier keeps the forward parity
    # oracle + the pure-python route/supported gates
    # round-5 additions: kept-fast oracles = make_server cached parity,
    # the guard's sane-trajectory no-op, and the three pure-logic bench
    # record/flag tests; everything heavier rides slow
    "test_serving.py::test_make_server_predict_density_and_live",
    "test_serving.py::test_make_server_batch_buckets",
    "test_serving.py::test_make_server_heteroscedastic_head_preserved",
    "test_training.py::test_reject_nonfinite_bounds_exploding_trajectory",
    "test_training.py::test_fit_auto_guards_full_batch_collapsed",
    "test_pallas_psi2.py::test_gradients_match_reference_all_operands",
    "test_pallas_psi2.py::test_mxu_backward_matches_reference_all_operands",
    "test_pallas_psi2.py::test_clamp_gate_zeroes_quadratic_gradients_but_not_logdet",
    "test_pallas_psi2.py::test_psi2_kernel_path_matches_xla_path",
    "test_pallas_psi2.py::test_psi2_kernel_path_sum_kernel_cross_terms",
    "test_pallas_psi2.py::test_damianou_trains_finite_under_kernel_route",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]          # file.py::test[param]
        fname = rel.split("::", 1)[0]
        base = rel.split("[", 1)[0]               # strip parametrization
        if fname in SLOW_FILES or base in SLOW_TESTS or rel in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
