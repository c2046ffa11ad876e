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


def _stamp(path: str, sig: str) -> str:
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, _MARKER)
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write(sig)
    return path


def ensure_cache_dir(path: str = DEFAULT_DIR) -> str:
    """Return a jax compilation-cache dir valid for THIS host's ISA.

    Never adopts cache entries this module did not stamp: a marker written
    by us proves the entries' ISA, so a stale marker means OUR cache from
    another host and is wiped in place. A non-empty directory WITHOUT a
    marker may belong to anything (a shared jax cache, a mistyped path) —
    deleting it would be destructive, and stamping it would make possibly
    stale-ISA entries permanent — so the cache is redirected to a
    signature-keyed subdirectory instead and the foreign contents are left
    untouched.
    """
    sig = _host_signature()
    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            if f.read().strip() == sig:
                return path
        # Our own marker with a different signature: this is our cache
        # from a different host ISA — wipe in place and re-stamp.
        shutil.rmtree(path, ignore_errors=True)
        return _stamp(path, sig)
    except OSError:
        pass
    try:
        nonempty = os.path.isdir(path) and any(os.scandir(path))
    except OSError:
        nonempty = False
    if nonempty:
        # Unmarked, non-empty: not provably ours. Use an ISA-keyed
        # subdirectory (itself marker-stamped) and leave the rest alone.
        return _stamp(os.path.join(path, f"by-isa-{sig[:12]}"), sig)
    return _stamp(path, sig)
