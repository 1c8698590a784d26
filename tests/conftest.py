"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding tests run against JAX's fake-device CPU backend
(SURVEY.md #4: ``xla_force_host_platform_device_count`` is the JAX-native
"fake multi-node backend").

Note: the environment's sitecustomize imports jax at interpreter startup (to
register the axon TPU plugin), so JAX_PLATFORMS env mutations here are too
late — the platform must be overridden via ``jax.config.update``, which also
skips the plugin's ~2-minute tunnel initialization for CPU-only test runs.
XLA_FLAGS is still read lazily at first CPU-client creation, so the fake
device count can be injected here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
