"""Test harness: force an 8-device virtual CPU mesh.

The axon TPU plugin registers itself via sitecustomize and pins
jax_platforms="axon,cpu", so env vars alone don't demote it — we override the
config before any backend is initialised. The same pjit programs that run on
a TPU pod then run here over 8 host-platform devices.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
