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

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
