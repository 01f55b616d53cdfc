"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: the environment's sitecustomize imports jax and registers the
'axon' TPU platform before any test code runs, so JAX_PLATFORMS env
tweaks are too late — jax.config.update is the reliable switch.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test platform: per-test jit
# compiles dominate the fast tier (~9 min cold), and a warm cache cuts
# compile-bound tests ~4x. The package skips the cache on CPU because
# XLA:CPU AOT loads log a machine-feature "mismatch" — inspected here:
# the only deltas are XLA's synthetic +prefer-no-scatter/-gather tuning
# flags (codegen preferences, not instructions; every real ISA feature
# matches this host), so same-host reuse is safe. Dedicated directory:
# CPU entries never mix with the TPU serving cache.
if os.environ.get("PBD_TEST_COMPILE_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".jax_cache_cpu"),
    )
    # stable keys: strip call-site source locations from Mosaic
    # payloads (see partsbaseddetector_tpu._enable_compile_cache)
    jax.config.update("jax_traceback_in_locations_limit", 0)
    jax.config.update("jax_include_full_tracebacks_in_locations", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


def pytest_collection_modifyitems(config, items):
    """Default run = fast tier. The slow tier (multi-minute end-to-end
    training proofs, compiled-oracle sweeps) is opt-in: PBD_RUN_SLOW=1
    runs everything, `-m slow` runs only the slow tier. Without this,
    the stock `pytest tests/ -x -q` invocation silently includes ~1h of
    slow-marked tests."""
    if os.environ.get("PBD_RUN_SLOW", "0") == "1":
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    import pytest

    skip = pytest.mark.skip(
        reason="slow tier: set PBD_RUN_SLOW=1 or pass -m slow"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
