"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use the standard fake-cluster trick
(xla_force_host_platform_device_count) so pjit/shard_map paths are exercised
without a TPU pod; single-device numerics run on CPU device 0.

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU-tunnel backend at interpreter startup, so JAX_PLATFORMS in os.environ is
read too early to override — force the platform through jax.config instead.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
