"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
(mesh/pjit/shard_map) is exercised without TPU hardware.

Uses the jax.config API rather than JAX_PLATFORMS/XLA_FLAGS env vars: this
image injects an `axon` TPU PJRT plugin via sitecustomize that ignores
JAX_PLATFORMS=cpu and hangs when --xla_force_host_platform_device_count is
set. jax.config.update takes precedence and is fast."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
