"""Pytest config: run all tests on a simulated 8-device CPU mesh.

The axon TPU platform ignores the JAX_PLATFORMS env var, so we force the CPU
backend via jax.config (must happen before any backend is initialized). The
real TPU chip is reserved for bench.py (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Float64 available for finite-difference gradient checks (tests only; the
# library itself computes in fp32/bf16).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------- slow lane
# The full suite takes ~90 min single-process (the interpret-mode kernel
# parity tests dominate — Pallas interpret tracing of unrolled gather loops
# is minutes per test). Default runs are the FAST set (pytest.ini pins
# `-m "not slow"`); the full pre-verdict lane is
#     python -m pytest tests/ -m "slow or not slow" -q
# Every component marked slow keeps a fast test in the same file (smaller
# interpret config, XLA custom-vjp path, or a sibling model test), so the
# fast set's component reach is unchanged — only depth/scale moves to the
# slow lane. List = every test >30 s in the round-5 full-suite timing run
# plus ten 20-30 s redundant siblings (~4,150 s of the 5,549 s total).
# Measured fast lane: 321 tests in 24:36 on this 4-core builder host
# (round-5 run, TPU probe sharing the box); on an idle 8+-core runner
# the same set is the <15-min default CI lane.
_SLOW = {
    "test_lotd_brick4.py::test_bwd_kernel_interpret_parity",
    "test_lotd_brick4.py::test_second_order_interpret_parity",
    "test_lotd_brick4.py::test_bwd_v4_kernel_interpret_parity",
    "test_permuto_cell4.py::test_bwd_kernel_interpret_parity",
    "test_permuto_cell4.py::test_fwd_kernel_interpret_parity",
    "test_permuto_cell4.py::test_nablas4_kernel_and_dynamic_field",
    "test_permuto_cell4.py::test_custom_vjp_cpu_and_fit",
    "test_permuto_cell.py::test_pallas_full_backward_interpret_parity",
    "test_permuto_cell.py::test_pallas_interpret_parity",
    "test_permuto_cell.py::test_nablas_kernel_interpret_parity",
    "test_permuto_cell.py::test_sdf_cell_nablas_split",
    "test_examples.py::test_example_smoke",
    "test_lotd_brick.py::test_pallas_backward_interpret_mode",
    "test_lotd_brick.py::test_pallas_backward_v4_interpret_mode",
    "test_lotd_brick.py::test_brick_sdf_field_nablas_path",
    "test_forest_brick.py::test_batched_kernel_interpret_parity",
    "test_parallel.py::test_forest_block_sharded_encode_and_train_step",
    "test_parallel.py::test_graft_entry_dryrun",
    "test_model_families.py::test_forest_neus_model_query_and_grads",
    "test_model_families.py::test_permuto_static_field_family",
    "test_forest_accel.py::test_forest_sharded_train_step",
    "test_forest_accel.py::test_forest_segment_march_mode_model",
    "test_forest_accel.py::test_forest_empty_block_skipping_reduces_samples",
    "test_model_classes.py::test_dynamic_permuto_neus_model",
    "test_model_classes.py::test_lotd_neus_model_brick_backend_train_step",
    "test_model_classes.py::test_emernerf_model",
    "test_chunking.py::test_brick_chunked_fwd_bwd_matches_single",
    "test_query_modes.py::test_neus_sphere_trace_vs_march_occ",
    "test_variants_utils.py::test_neus_dynamic_query",
    "test_variants_utils.py::test_neus_compressed_query_matches_uncompressed",
    "test_permuto_sphere_trace.py::test_permuto_fwd_dydx_and_second_order",
    "test_viewer.py::test_viewer_controls_dynamic_model",
    # 20-30s band, each redundant with a faster sibling in the same file
    "test_mesh_gs_misc.py::test_gaussian_splatting_render",
    "test_query_modes.py::test_neus_compressed_default_keeps_far_occupied",
    "test_query_modes.py::test_nerf_compressed_grad_flows",
    "test_lotd_brick4.py::test_fwd_kernel_interpret_parity",
    "test_lotd_growers.py::test_style_lotd_with_grower_type",
    "test_viewer.py::test_viewer_overlay_datalayer",
    "test_permuto_cell.py::test_pallas_backward_interpret_parity",
    "test_variants_utils.py::test_neus_batched_query",
    "test_model_classes.py::test_dynamic_generative_neus_model",
    "test_forest_brick.py::test_forest_model_brick_backend_train_step",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = f"{item.fspath.basename}::{item.originalname}" \
            if hasattr(item, "originalname") else item.nodeid
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
