"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests run on CPU (multi-device sharding is validated on a virtual mesh per
SURVEY.md section 4); float64 is enabled so numerical parity with the
reference's float64 semantics can be asserted tightly. TPU float32 behavior
is covered by dedicated dtype tests.
"""

import os

# Force CPU: the sandbox presets JAX_PLATFORMS=axon (remote TPU tunnel) and
# a sitecustomize imports jax at interpreter startup, so the env var is
# already bound - use config.update, which works post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The persistent compilation cache is DISABLED for the test process.
# XLA:CPU's executable serialize()/deserialize() segfault
# deterministically after ~100+ accumulated compilations in one process
# on this jaxlib/host combination (observed round 4 at an identical crash
# position across runs: put_executable_and_time with writes enabled,
# get_executable_and_time with writes disabled, with or without the
# zstandard backend). The in-memory jit cache still covers repeated
# shapes within the run; TPU-side consumers (bench.py) keep the
# persistent cache - their executables serialize through the TPU plugin
# path, which has never shown the crash.
jax.config.update("jax_enable_compilation_cache", False)
