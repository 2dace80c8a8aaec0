"""Tracing / profiling hooks (SURVEY §5: the reference had only wall-clock ETA
strings, utils.py:23-33).

Two mechanisms, both flag-gated and zero-cost when off:
  - `maybe_start_server(port)`: jax.profiler trace server for live capture
    with TensorBoard / xprof (`--profile_port`).
  - `trace_epoch(logdir, epoch)`: programmatic jax.profiler.trace around an
    epoch (`--profile_dir`), plus `annotate` spans around data/step phases so
    device timelines show where host time goes.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


def maybe_start_server(port: int = 0) -> None:
    if port:
        jax.profiler.start_server(port)


@contextlib.contextmanager
def trace_epoch(logdir: Optional[str], epoch: int) -> Iterator[None]:
    if not logdir:
        yield
        return
    with jax.profiler.trace(f"{logdir}/epoch_{epoch:04d}"):
        yield


def annotate(name: str):
    """Span annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
