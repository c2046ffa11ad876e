"""Native (C++) CPU reference kernels for the EDM-completion costs.

The reference ships numba AOT-compiled kernels as its only native component
(reference: graphik/solvers/costs.py:5, 208-209, built via numba.pycc). Here
the equivalent role — a fast, f64, edge-list CPU oracle for the accelerator
compute path — is filled by a small C++ library built on demand with the
system toolchain and bound through ctypes (no pybind11 in this image).

Public surface:
  available() -> bool                did the library build/load?
  edges_from_masks(...)              dense (N,N) masks -> COO edge arrays
  cost / cost_and_grad / hess        batched kernels over (B, N, d) f64
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "costgrd.cc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None

_f64p = ctypes.POINTER(ctypes.c_double)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64 = ctypes.c_int64


def _so_path() -> str:
    # Per-user cache dir, mode 0700: a world-writable shared path would let
    # another local user pre-plant a library that ctypes would dlopen.
    cache = os.environ.get("GRAPHIK_TPU_NATIVE_CACHE")
    if cache is None:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            tempfile.gettempdir(), f"graphik_tpu_native_{os.getuid()}"
        )
        cache = (
            os.path.join(base, "graphik_tpu")
            if os.environ.get("XDG_CACHE_HOME")
            else base
        )
    os.makedirs(cache, mode=0o700, exist_ok=True)
    return os.path.join(cache, "costgrd.so")


def _build() -> Optional[ctypes.CDLL]:
    so = _so_path()
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        # Compile to a unique temporary name, then atomically publish with
        # os.replace() so concurrent builders never dlopen a truncated file.
        tmp = f"{so}.{os.getpid()}.tmp"
        cmd = [
            "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-fopenmp",
            "-o", tmp, _SRC,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as exc:
            # Retry without OpenMP before giving up.
            try:
                subprocess.run(
                    [c for c in cmd if c != "-fopenmp"],
                    check=True, capture_output=True, text=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError) as exc2:
                global _build_error
                _build_error = f"{exc}\n{exc2}"
                return None
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)

    common = [
        _f64p, _f64p, _i32p, _i32p, _f64p, _f64p, _f64p, _f64p, _f64p,
        _i64, _i64, _i64, _i64,
    ]
    lib.gtpu_cost.argtypes = common + [_f64p]
    lib.gtpu_cost.restype = None
    lib.gtpu_cost_and_grad.argtypes = common + [_f64p, _f64p]
    lib.gtpu_cost_and_grad.restype = None
    lib.gtpu_hess.argtypes = [_f64p] + common + [_f64p]
    lib.gtpu_hess.restype = None
    return lib


def _get() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if _build_error is not None:
                raise RuntimeError(f"native build failed:\n{_build_error}")
            _lib = _build()
            if _lib is None:
                raise RuntimeError(f"native build failed:\n{_build_error}")
        return _lib


def available() -> bool:
    # OSError covers ctypes.CDLL load failures (e.g. missing libgomp) so
    # callers' skip guards degrade gracefully instead of crashing collection.
    try:
        _get()
        return True
    except (RuntimeError, OSError):
        return False


def edges_from_masks(
    omega: np.ndarray,
    psi_L: np.ndarray,
    psi_U: np.ndarray,
    L_mask: np.ndarray,
    U_mask: np.ndarray,
) -> Tuple[np.ndarray, ...]:
    """Dense (N, N) masks -> upper-triangular COO edge arrays.

    Returns (ei, ej, omega_e, psil_e, psiu_e, lmask_e, umask_e) covering every
    unordered pair where any of the three cost terms is active — the same
    nonzero-triu index tuple the reference feeds its numba kernels
    (reference: graphik/solvers/riemannian_solver.py:84-93, 130-138).
    """
    omega = np.asarray(omega, np.float64)
    active = (omega != 0) | (np.asarray(L_mask) != 0) | (np.asarray(U_mask) != 0)
    iu = np.triu_indices(omega.shape[-1], k=1)
    keep = active[iu]
    ei = iu[0][keep].astype(np.int32)
    ej = iu[1][keep].astype(np.int32)
    sel = lambda M: np.ascontiguousarray(np.asarray(M, np.float64)[ei, ej])
    return ei, ej, sel(omega), sel(psi_L), sel(psi_U), sel(L_mask), sel(U_mask)


def _prep(Y, dgoal, ei, ej, *edge_arrays):
    """Coerce inputs to the exact ABI the C++ kernels assume.

    int64 indices (numpy's nonzero default) or non-contiguous float views
    would otherwise be reinterpreted raw as int32/f64, producing
    out-of-bounds scatter writes in gtpu_cost_and_grad.
    """
    Y = np.ascontiguousarray(Y, np.float64)
    squeeze = Y.ndim == 2
    if squeeze:
        Y = Y[None]
    B, N, d = Y.shape
    if d > 3:
        raise ValueError("native kernels support d <= 3")
    ei = np.ascontiguousarray(ei, np.int32)
    ej = np.ascontiguousarray(ej, np.int32)
    E = len(ei)
    if len(ej) != E or any(len(a) != E for a in edge_arrays):
        raise ValueError("edge arrays must all have the same length E")
    if E and (ei.max() >= N or ej.max() >= N or ei.min() < 0 or ej.min() < 0):
        raise ValueError("edge indices out of range for N")
    dgoal = np.ascontiguousarray(np.broadcast_to(dgoal, (B, E)), np.float64)
    edge_arrays = tuple(
        np.ascontiguousarray(a, np.float64) for a in edge_arrays
    )
    return (Y, dgoal, ei, ej, B, N, d, E, squeeze) + edge_arrays


def _ptr(a):
    return a.ctypes.data_as(_f64p)


def cost(Y, dgoal_e, ei, ej, omega_e, psil_e, psiu_e, lmask_e, umask_e):
    """Batched cost; matches graphik_tpu.solvers.costs.cost to f64 precision."""
    lib = _get()
    (Y, dgoal_e, ei, ej, B, N, d, E, squeeze, omega_e, psil_e, psiu_e,
     lmask_e, umask_e) = _prep(
        Y, dgoal_e, ei, ej, omega_e, psil_e, psiu_e, lmask_e, umask_e)
    out = np.empty(B, np.float64)
    lib.gtpu_cost(
        _ptr(Y), _ptr(dgoal_e),
        ei.ctypes.data_as(_i32p), ej.ctypes.data_as(_i32p),
        _ptr(omega_e), _ptr(psil_e), _ptr(psiu_e), _ptr(lmask_e),
        _ptr(umask_e), B, N, d, E, _ptr(out))
    return out[0] if squeeze else out


def cost_and_grad(Y, dgoal_e, ei, ej, omega_e, psil_e, psiu_e, lmask_e,
                  umask_e):
    lib = _get()
    (Y, dgoal_e, ei, ej, B, N, d, E, squeeze, omega_e, psil_e, psiu_e,
     lmask_e, umask_e) = _prep(
        Y, dgoal_e, ei, ej, omega_e, psil_e, psiu_e, lmask_e, umask_e)
    out_f = np.empty(B, np.float64)
    out_g = np.empty((B, N, d), np.float64)
    lib.gtpu_cost_and_grad(
        _ptr(Y), _ptr(dgoal_e),
        ei.ctypes.data_as(_i32p), ej.ctypes.data_as(_i32p),
        _ptr(omega_e), _ptr(psil_e), _ptr(psiu_e), _ptr(lmask_e),
        _ptr(umask_e), B, N, d, E, _ptr(out_f), _ptr(out_g))
    if squeeze:
        return out_f[0], out_g[0]
    return out_f, out_g


def hess(Y, Z, dgoal_e, ei, ej, omega_e, psil_e, psiu_e, lmask_e, umask_e):
    """Batched Hessian-vector product at Y along Z."""
    lib = _get()
    (Y, dgoal_e, ei, ej, B, N, d, E, squeeze, omega_e, psil_e, psiu_e,
     lmask_e, umask_e) = _prep(
        Y, dgoal_e, ei, ej, omega_e, psil_e, psiu_e, lmask_e, umask_e)
    Z = np.ascontiguousarray(Z, np.float64)
    if Z.ndim == 2:
        Z = Z[None]
    if Z.shape != Y.shape:
        raise ValueError("Z must match Y's shape")
    out_h = np.empty((B, N, d), np.float64)
    lib.gtpu_hess(
        _ptr(Y), _ptr(Z), _ptr(dgoal_e),
        ei.ctypes.data_as(_i32p), ej.ctypes.data_as(_i32p),
        _ptr(omega_e), _ptr(psil_e), _ptr(psiu_e), _ptr(lmask_e),
        _ptr(umask_e), B, N, d, E, _ptr(out_h))
    return out_h[0] if squeeze else out_h
