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

from graphik_tpu.utils.cache import ensure_cache_dir

# Unbind the zstandard C backend from jax's persistent compilation cache:
# both its compress (write) and decompress (read) paths segfault after
# ~100+ tests of accumulated compilations in one process on this
# jaxlib/host combination (observed round 4: identical deterministic
# crash position, first in put_executable_and_time, then - with writes
# disabled - in get_executable_and_time). jax falls back to zlib, which
# is stable. A sys.modules block would be too late: the sandbox's
# sitecustomize imports jax at interpreter startup, binding the real
# module before any test code runs.
try:
    from jax._src import compilation_cache as _cc

    _cc.zstandard = None
except Exception:
    pass

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# x64 CPU compiles are slow in this environment; READ cached programs
# across test runs. The cache dir is stamped with the host CPU signature
# and wiped on mismatch: stale AOT CPU code from a migrated VM loads with
# only a warning and then SEGFAULTS (observed round 4).
#
jax.config.update("jax_compilation_cache_dir", ensure_cache_dir())
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
