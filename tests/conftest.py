"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip logic is tested without a pod via XLA's host-platform device-count
override, the standard JAX stand-in for distributed tests (SURVEY.md section 4).
Note: this environment pins jax_platforms via site config, so the JAX_PLATFORMS
env var alone is not honored — we must call jax.config.update before any
backend is initialized.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
