"""Test configuration: force a pure 8-device virtual CPU mesh.

Two jobs, both of which must happen before jax initializes a backend:

1. Run tests on CPU with ``--xla_force_host_platform_device_count=8`` so
   multi-device sharding paths (cross-replica batch-norm, pjit train steps)
   are exercised without TPU hardware — the test strategy SURVEY.md
   section 4 calls for.
2. Undo the axon TPU sitecustomize's ``jax_platforms="axon,cpu"`` config
   override: left in place, every test-suite compile is routed through the
   TPU remote-compile relay (minutes of wall clock per pytest run, and
   hangs when the chip is busy). ``jax.config.update`` here runs after the
   sitecustomize, so the last write wins; the CPU client is not yet
   initialized at conftest-import time, so the XLA_FLAGS device-count env
   is still honored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
