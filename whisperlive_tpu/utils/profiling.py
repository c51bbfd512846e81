"""JAX profiler integration (xprof traces).

The reference has no tracing/profiling at all (SURVEY §5 — only a latency
histogram). Here any component can be traced: pass --profile_dir to the
server or set WL_PROFILE_DIR to capture device traces viewable in
XProf/TensorBoard, plus a context manager for scoped captures.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator, Optional

logger = logging.getLogger(__name__)

_active_dir: Optional[str] = None


def start_profiler(log_dir: str) -> bool:
    """Begin a long-running trace (stopped at process exit or stop_profiler)."""
    global _active_dir
    import jax

    try:
        os.makedirs(log_dir, exist_ok=True)
        jax.profiler.start_trace(log_dir)
        _active_dir = log_dir
        logger.info("JAX profiler tracing to %s", log_dir)
        return True
    except Exception:
        logger.exception("failed to start profiler")
        return False


def stop_profiler() -> None:
    global _active_dir
    if _active_dir is None:
        return
    import jax

    try:
        jax.profiler.stop_trace()
        logger.info("JAX profiler trace written to %s", _active_dir)
    except Exception:
        logger.exception("failed to stop profiler")
    finally:
        _active_dir = None


@contextlib.contextmanager
def trace_scope(log_dir: str) -> Iterator[None]:
    """Capture one scoped trace: with trace_scope('/tmp/prof'): ..."""
    start_profiler(log_dir)
    try:
        yield
    finally:
        stop_profiler()


def annotate(name: str):
    """Named region visible in the trace timeline (host + device)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def maybe_start_from_env() -> None:
    log_dir = os.environ.get("WL_PROFILE_DIR")
    if log_dir:
        start_profiler(log_dir)
