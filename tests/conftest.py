"""Test configuration: run JAX on CPU with 8 virtual devices so
data-parallel sharding is exercised without TPU hardware
(SURVEY.md §4's multi-device test strategy).

Note: this environment's sitecustomize registers a TPU PJRT plugin in
every interpreter and forces JAX_PLATFORMS onto it, so env vars alone are
not enough — we must flip jax_platforms via the config API before any
backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls so torch-parity tolerances are meaningful
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: the suite compiles many small programs on one
# CPU core; cached reruns (including the driver's) skip all of that
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()


def pytest_addoption(parser):
    parser.addoption("--regen-heatmap-golden", action="store_true",
                     default=False,
                     help="regenerate tests/fixtures/heatmap_golden.npz "
                          "after an intentional renderer change")
