"""Test configuration: hermetic CPU backend with an 8-device virtual mesh.

Mirrors the reference's stub-bridge strategy (CAAudioBridge.swift:139-264 —
a fake backend selected automatically when real hardware is unavailable):
tests never require a TPU; multi-chip sharding tests run on virtual CPU
devices via --xla_force_host_platform_device_count.

Note: the environment pre-sets jax_platforms to "axon,cpu" (TPU tunnel), so
JAX_PLATFORMS env alone is not enough — we must update the config before any
backend is initialised.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
