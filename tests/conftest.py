"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the driver validates real multi-chip via __graft_entry__).

Note: the axon TPU plugin ignores JAX_PLATFORMS, so we also set the config
flag after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
