"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests run on CPU via
``xla_force_host_platform_device_count`` (no TPU needed in CI), per the
test strategy in SURVEY.md §4. The environment may pre-import jax with a
TPU plugin (JAX_PLATFORMS=axon via sitecustomize), so the platform must be
re-pinned through ``jax.config`` before any backend initialization rather
than through env vars alone.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
