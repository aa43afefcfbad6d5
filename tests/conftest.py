import os
import sys

# The container boots with JAX_PLATFORMS=axon (a tunneled real TPU) and a
# sitecustomize that imports jax before conftest runs, so the env var alone
# is not enough — use config.update, which takes effect before first backend
# initialization.  Tests run on a virtual 8-device CPU mesh.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


# ---------------------------------------------------------------------------
# fast / slow split (VERDICT r4 #8): `pytest -m fast` is the CI-grade subset
# — golden-locked, no reference-subprocess harness — measured <= ~4 min on
# this host; the unmarked full suite (~80 min, incl. the reference-run_exp
# posterior/trajectory parity harness) is the nightly re-verification of the
# north-star contract.  Classification data: a full `--durations=0` run
# (421 tests, 4763 s); files/tests below are the measured heavy tail.
# ---------------------------------------------------------------------------

# whole files: reference-subprocess parity harness and multi-config e2e
# sweeps (per-file call time in parentheses)
_SLOW_FILES = {
    "test_posterior_parity.py",   # reference run_exp subprocesses (3004 s)
    "test_cfg_matrix_runs.py",    # 14-family cfg e2e sweep (355 s)
    "test_e2e.py",                # crash/resume + arch e2e drives (197 s)
    "test_bf16.py",               # bf16 zoo e2e drives (152 s)
    "test_zoo_e2e.py",            # (79 s)
    "test_export.py",             # (80 s)
    "test_multihost.py",          # 2-process jax.distributed (53 s)
    "test_flagship_cfg_runs.py",  # (32 s)
}

# individual heavy tests inside otherwise-fast files (>= ~8 s measured;
# mostly interpret-mode Pallas conv kernels, whose CPU interpreter is
# inherently slow, and subprocess drives)
_SLOW_TESTS = {
    "test_models.py": (
        "test_sincnet_fused_ln0_path_matches_xla",
        "test_conv_impl_dot_matches_xla",
        "test_fast_dropout_semantics",
    ),
    "test_kernels.py": (
        "test_xla_composed_backward_matches_pallas_grads",
        "test_conv1d_pool_ln_act_matches_composed",
        "test_conv1d_pool_kernel_matches_xla",
        "test_model_pallas_impl_gradients",
        "test_gru_kernel_forward_and_vjp_parity",
        "test_custom_vjp_matches_autodiff",
    ),
    "test_dist.py": (
        "test_graft_entry_dryrun",
        "test_sharded_bf16_step_runs_and_matches",
        "test_sharded_step_matches_single_device",
    ),
    "test_cli.py": ("test_run_exp_subprocess_with_override",),
    "test_torch_import.py": (
        "test_pase_native_forward_and_checkpoint_import",
    ),
    "test_logmelfb_e2e.py": ("test_logmelfb_rate_experiment",),
    "test_models_extended.py": ("test_cnn_shapes",),
    "test_transfer.py": ("test_pretrain_file_warm_start",),
    "test_sincnet_e2e.py": ("test_sincnet_raw_experiment",),
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        fname = os.path.basename(str(item.fspath))
        slow = fname in _SLOW_FILES or any(
            item.name.startswith(pref)
            for pref in _SLOW_TESTS.get(fname, ())
        )
        item.add_marker(pytest.mark.slow if slow else pytest.mark.fast)
