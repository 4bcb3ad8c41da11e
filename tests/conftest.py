"""Test configuration.

Tests run on a virtual 8-device CPU mesh (per SURVEY.md §4: multi-host logic
is tested with XLA_FLAGS=--xla_force_host_platform_device_count=8) so the
distributed shuffle/join/agg paths execute without a TPU pod.

Note: the environment's sitecustomize pins JAX_PLATFORMS=axon (remote TPU via
RPC tunnel) — per-op dispatch over that tunnel is seconds-slow, so tests
must force CPU unconditionally, before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is not enough: the axon plugin is registered by
# sitecustomize at interpreter start, so pin the platform via config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
