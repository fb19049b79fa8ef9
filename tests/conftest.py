"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; JAX's standard fake-backend trick
(xla_force_host_platform_device_count) lets sharding/collective code paths be
exercised on CPU (SURVEY §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + speed for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Force CPU even when the environment presets JAX_PLATFORMS (e.g. 'axon');
# the env var alone is overridden by the TPU plugin, so set the config too.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Smoke tier: one fast test per subsystem, selected centrally by nodeid so
# the full suite (~30 min on the 1-core bench host) never has to race the
# driver's end-of-round clock.  `pytest -m smoke` must stay under ~5 min
# (VERDICT r3 next #7).  Names are (file basename, bare test name — the
# part before any parametrize bracket); a class test matches on the method
# name alone.
# ---------------------------------------------------------------------------
_SMOKE = {
    ("test_config.py", "test_family_precedence"),
    ("test_config.py", "test_roundtrip"),
    ("test_data.py", "test_loader_shapes_and_droplast"),
    ("test_native_loader.py", "test_decode_matches_numpy"),
    ("test_ops_parity.py", "test_conv3d_vs_torch"),
    ("test_ops_parity.py", "test_conv_transpose3d_vs_torch"),
    ("test_layers_parity.py", "test_conv_forward_and_state_updates"),
    ("test_layers_parity.py", "test_vs_torch_oracle"),
    ("test_models.py", "test_families_forward_shapes"),
    ("test_train_e2e.py", "test_dcgan_wgan_train_and_resume"),
    ("test_stylegan.py", "test_vs_per_sample_weight_oracle"),
    ("test_stylegan.py", "test_stylegan2_e2e"),
    ("test_eval_metrics.py", "test_mmd_matches_reference_formula"),
    ("test_eval_cli.py", "test_load_run_and_sample"),
    ("test_optimizer.py", "test_b1zero_state_has_no_mu"),
    ("test_spatial.py", "test_spatial_conv_halo_matches_unsharded"),
    ("test_tp.py", "test_tp_sharding_rule"),
    ("test_sync_bn.py", "test_grouped_bn_matches_per_shard_stats"),
    ("test_attention_ops.py", "test_pallas_forward_matches_einsum_interpret"),
    ("test_fast_fir.py", "test_gates"),
    ("test_c1_conv.py", "test_gate"),
    ("test_subpixel_conv.py", "test_gates"),
    ("test_upsample_conv.py", "test_value_parity"),
    ("test_downsample_conv.py", "test_avgpool_conv3d_matches_composed"),
    ("test_convert.py", "test_generator_numeric_oracle"),
    ("test_sn_dynamics.py", "test_sn_update_counts_per_fused_step"),
    ("test_png.py", "test_slice_grid_layout"),
    ("test_aux_subsystems.py", "test_energy_tracker_writes_summary"),
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        base = item.name.split("[")[0]
        if (item.fspath.basename, base) in _SMOKE:
            item.add_marker(pytest.mark.smoke)
