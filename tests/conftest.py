"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 fake devices so multi-chip sharding logic
(data-parallel and cell-parallel shard_map) is exercised without TPU
hardware. This mirrors how the driver validates `dryrun_multichip`.

Note: this image's sitecustomize imports jax at interpreter startup (before
conftest runs), so setting JAX_PLATFORMS via os.environ is too late — we must
go through jax.config. XLA_FLAGS is still read lazily at backend init, so
setting it here (before the first jax.devices()) works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
