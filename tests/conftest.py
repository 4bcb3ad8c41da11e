"""Test configuration.

Tests run on a virtual 8-device CPU mesh (per SURVEY.md §4: multi-host logic
is tested with XLA_FLAGS=--xla_force_host_platform_device_count=8) so the
distributed shuffle/join/agg paths execute without a TPU pod. This must be
set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
