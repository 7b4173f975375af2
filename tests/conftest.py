"""Test configuration: fast CPU backend with an 8-device virtual mesh.

The ambient environment registers an `axon` TPU plugin whose ``register()``
calls ``jax.config.update("jax_platforms", "axon,cpu")`` — which overrides the
JAX_PLATFORMS env var and silently routes every test op through the single
tunneled TPU chip (seconds per dispatch).  Unit tests must run on local CPU,
so we override the config *explicitly* here, before any backend initializes
(jaxtyping's pytest plugin imports jax early, but backends init lazily).

Multi-chip sharding is validated the way SURVEY.md §4 prescribes: CPU
simulation via ``--xla_force_host_platform_device_count=8``, asserting
sharded == single-device results.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
