"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run without a real TPU slice (the standard JAX testing
pattern; SURVEY.md §4e).

Note: this environment's sitecustomize force-registers the 'axon' TPU
platform ahead of JAX_PLATFORMS, so we must override via jax.config after
import — env vars alone are not honoured.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
