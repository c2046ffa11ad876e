"""Persistent-compilation-cache hygiene.

XLA:CPU persists AOT-compiled host code into the jax compilation cache.
If the VM migrates to a host with a different ISA (observed in this
sandbox: avx512/amx feature sets changed mid-session), loading a cached
entry emits only a warning ("could lead to execution errors such as
SIGILL") and then actually segfaults at run time. `ensure_cache_dir`
stamps the cache directory with the host's CPU feature signature and
wipes it in place when the signature changes, so every consumer
(tests/conftest.py, bench.py, tools/) gets a cache that is always valid
for the machine it runs on.
"""

from __future__ import annotations

import hashlib
import os
import shutil

DEFAULT_DIR = "/tmp/graphik_tpu_jax_cache"
_MARKER = ".host_cpu_signature"


def _host_signature() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()


def ensure_cache_dir(path: str = DEFAULT_DIR) -> str:
    """Return a jax compilation-cache dir valid for THIS host's ISA."""
    sig = _host_signature()
    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            if f.read().strip() != sig:
                shutil.rmtree(path, ignore_errors=True)
    except OSError:
        # No marker. A NON-EMPTY dir without a marker was populated by an
        # older writer (pre-marker conftest/bench used this same default
        # path) or by something else entirely; its entries may carry a
        # different host's ISA - exactly the SIGILL scenario this guard
        # exists for - and stamping it with the current signature would
        # make the staleness permanent. Only trust a dir whose marker
        # matches; wipe anything else before stamping.
        try:
            if os.path.isdir(path) and any(os.scandir(path)):
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass
    os.makedirs(path, exist_ok=True)
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write(sig)
    return path
