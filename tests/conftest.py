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


# ---------------------------------------------------------------------------
# `slow` marker (VERDICT r3 weak #6): heavy tests (the ~10-min integration
# pipeline, the graft subprocess re-exec, the full-geometry dryrun) are
# skipped by default so the routine run stays <10 min.  Run everything with
# RUN_SLOW=1 python -m pytest tests/ -q        (documented in CLAUDE.md)
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test, skipped unless RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow test — set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
