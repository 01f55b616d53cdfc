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


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
