"""Stage timing and profiler hooks (SURVEY.md section 5, tracing/profiling).

The reference records per-solve wall time in pymanopt's optlog
(reference trust_region.py:177,433 -> riemannian_solver.py:212-215) and SDP
solver_stats (convex_iteration.py:236-242). The TPU equivalent here:

* `StageTimer` - named wall-clock stages with counts/totals; device work is
  fenced with a host transfer so async dispatch (and the axon tunnel's
  asynchronous block_until_ready) cannot under-report.
* `timed(name)` - context manager sugar on a shared timer.
* `device_trace(dir)` - jax.profiler trace scope (TensorBoard-viewable),
  no-op if the profiler is unavailable on the platform.

These are host-side tools: nothing here runs inside jit, so hot paths are
unaffected unless a timer is explicitly used.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

import numpy as np


def fence(tree) -> None:
    """Block until `tree`'s device computations are done.

    A host transfer of one leaf guarantees completion even where
    block_until_ready is effectively asynchronous (axon tunnel).
    """
    import jax

    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0])


@dataclasses.dataclass
class StageRecord:
    total_s: float = 0.0
    count: int = 0
    last_s: float = 0.0

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class StageTimer:
    """Accumulates wall time per named stage.

    Example:
        timer = StageTimer()
        with timer.stage("solve"):
            out = solver(T_goal)
            timer.sync(out)          # fence device work into the stage
        print(timer.summary())
    """

    def __init__(self) -> None:
        self.records: Dict[str, StageRecord] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_result=None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if sync_result is not None:
                fence(sync_result)
            dt = time.perf_counter() - t0
            rec = self.records.setdefault(name, StageRecord())
            rec.total_s += dt
            rec.count += 1
            rec.last_s = dt

    def sync(self, tree) -> None:
        fence(tree)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(r.total_s, 6),
                "count": r.count,
                "mean_s": round(r.mean_s, 6),
                "last_s": round(r.last_s, 6),
            }
            for k, r in self.records.items()
        }

    def reset(self) -> None:
        self.records.clear()


_GLOBAL = StageTimer()


def timed(name: str, sync_result=None):
    """Context manager recording into the module-global timer."""
    return _GLOBAL.stage(name, sync_result=sync_result)


def global_summary() -> Dict[str, Dict[str, float]]:
    return _GLOBAL.summary()


def reset() -> None:
    _GLOBAL.reset()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None or unsupported.

    View with TensorBoard's profile plugin. On platforms where the profiler
    backend is unavailable (some tunneled devices) this degrades to a no-op
    rather than raising.
    """
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
