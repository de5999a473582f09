"""Profiler trace annotations (TPU analog of the reference's NVTX helpers).

Parity: gsplat/trace.py:1-80 — `trace_push/trace_pop/trace_range/
trace_function` with the same helper API, routed through
`jax.profiler.TraceAnnotation` (shows up in xplane/tensorboard profiles)
instead of an nvtx domain. No-ops if the profiler is unavailable.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Callable, Optional

try:
    from jax.profiler import TraceAnnotation as _TraceAnnotation
except Exception:  # pragma: no cover
    _TraceAnnotation = None

_stack: list = []


def trace_push(name: str) -> None:
    """Push a named trace region (pair with trace_pop)."""
    if _TraceAnnotation is None:
        return
    ann = _TraceAnnotation(name)
    ann.__enter__()
    _stack.append(ann)


def trace_pop() -> None:
    """Pop the most recent trace region."""
    if not _stack:
        return
    _stack.pop().__exit__(None, None, None)


@contextlib.contextmanager
def trace_range(name: str):
    """Context manager tracing a region."""
    if _TraceAnnotation is None:
        yield
        return
    with _TraceAnnotation(name):
        yield


def trace_function(name: Optional[str] = None) -> Callable:
    """Decorator tracing a function call (name defaults to qualname)."""

    def deco(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with trace_range(label):
                return fn(*args, **kwargs)

        return wrapper

    return deco
