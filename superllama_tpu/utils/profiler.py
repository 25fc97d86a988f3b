"""Device-level profiling — the jax.profiler/xprof integration (SURVEY §5.1).

The reference exposes per-op timing through ggml's graph profiler and
`llama_perf_*` counters (common/common.cpp perf printing) plus the per-op
eval callback (examples/eval-callback). On TPU the authoritative per-op
timeline is the XLA device trace: `jax.profiler` captures HLO-level op
timing, HBM usage and host↔device transfers, viewable in XProf/TensorBoard
or Perfetto.

Three surfaces:
- ``device_trace(dir)``: context manager around any region (used by the
  CLI's --profile-dir flag and the bench).
- ``start``/``stop``: imperative control, used by the server's
  /profile/start and /profile/stop endpoints (capture a window of live
  serving traffic).
- ``annotate(name)``: a TraceAnnotation so engine phases (prefill, decode
  block, sampler) show as named spans inside the device trace.

All entry points degrade to no-ops when profiling is unavailable (e.g. the
axon AOT tunnel, which has no on-host profiler daemon).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Iterator

_lock = threading.Lock()
_active_dir: str | None = None


def available() -> bool:
    try:
        import jax.profiler  # noqa: F401
        return True
    except Exception:  # pragma: no cover - import failure is environmental
        return False


def start(trace_dir: str) -> bool:
    """Begin a device trace into ``trace_dir``; False if unavailable or
    already tracing."""
    global _active_dir
    import jax
    with _lock:
        if _active_dir is not None:
            return False
        try:
            jax.profiler.start_trace(trace_dir)
        except Exception:
            return False
        _active_dir = trace_dir
        return True


def stop() -> str | None:
    """End the active trace; returns its directory (None if none active)."""
    global _active_dir
    import jax
    with _lock:
        if _active_dir is None:
            return None
        out, _active_dir = _active_dir, None
        try:
            jax.profiler.stop_trace()
        except Exception:
            return None
        return out


def active() -> str | None:
    return _active_dir


@contextlib.contextmanager
def device_trace(trace_dir: str | None) -> Iterator[None]:
    """Trace the enclosed region when ``trace_dir`` is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    started = start(trace_dir)
    try:
        yield
    finally:
        if started:
            stop()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span inside the device trace (TraceAnnotation); cheap no-op
    when no trace is active."""
    try:
        import jax.profiler
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
