"""Nested span timers, the reference's start_timer!/end_timer! equivalent.

(reference: bench-utils macros, Cargo.toml:16, wrapped around every prover
round at src/lib.rs:71-134 and every MSM/keygen phase; compiled out unless
the print-trace feature is on.) Enable with SPARTAN_PRINT_TRACE=1 or
``set_print_trace(True)``. Also usable as a context manager, and emits
jax.profiler ranges when tracing on-device work.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

_PRINT = os.environ.get("SPARTAN_PRINT_TRACE", "0") not in ("0", "", "false")
_DEPTH = 0


def set_print_trace(on: bool) -> None:
    global _PRINT
    _PRINT = on


class _Span:
    __slots__ = ("label", "t0")

    def __init__(self, label: str):
        self.label = label
        self.t0 = time.perf_counter()


def start_timer(label: str) -> _Span:
    global _DEPTH
    if _PRINT:
        print(f"{'··' * _DEPTH}Start: {label}", flush=True)
    _DEPTH += 1
    return _Span(label)


def end_timer(span: _Span) -> float:
    global _DEPTH
    _DEPTH -= 1
    dt = time.perf_counter() - span.t0
    if _PRINT:
        print(f"{'··' * _DEPTH}End: {span.label} {dt * 1e3:.3f}ms", flush=True)
    return dt


@contextmanager
def span(label: str):
    """Wall-clock span + a jax.profiler TraceAnnotation so device work issued
    inside the span shows up as a named range in TPU profiler traces."""
    s = start_timer(label)
    try:
        from jax.profiler import TraceAnnotation

        ann = TraceAnnotation(label)
    except Exception:  # jax absent or profiler API unavailable
        ann = None
    if ann is not None:
        ann.__enter__()
    try:
        yield s
    finally:
        if ann is not None:
            ann.__exit__(None, None, None)
        end_timer(s)
