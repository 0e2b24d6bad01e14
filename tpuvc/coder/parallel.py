"""Threaded host coding of independent per-frame rANS streams.

The level-batched sequence coders produce one independent stream (set)
per frame; the ctypes rANS calls release the GIL for the duration of the
C call, so a thread pool codes them concurrently — host entropy coding
scales with cores instead of serializing behind one stream at ~50 Msym/s.
"""

from __future__ import annotations

import contextvars
import os
from concurrent.futures import ThreadPoolExecutor

_POOL: ThreadPoolExecutor | None = None


class _CtxPool(ThreadPoolExecutor):
    """ThreadPoolExecutor that runs each task under a copy of the
    SUBMITTER's contextvars context.

    The compute-dtype policy (tpuvc.ops.precision) is a contextvar read at
    jit TRACE time; async host phases can be the first caller of a jitted
    graph (e.g. decode_v's pipelined entropy decode traces ``_params_idx``
    on a worker), and a bare worker thread would trace it under the
    default (f32) policy while the encoder traced bf16 — a silent
    enc/dec program mismatch that desyncs the rANS decode. Each task gets
    its own Context copy (a Context can only be entered by one thread at
    a time)."""

    def submit(self, fn, /, *args, **kwargs):
        ctx = contextvars.copy_context()
        return super().submit(ctx.run, fn, *args, **kwargs)

    def map(self, fn, *iterables, timeout=None, chunksize=1):
        ctx = contextvars.copy_context()
        return super().map(
            lambda *a: ctx.copy().run(fn, *a),
            *iterables, timeout=timeout, chunksize=chunksize,
        )


def host_pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = _CtxPool(max_workers=min(8, os.cpu_count() or 4))
    return _POOL


def parallel_map(fn, items):
    """fn over items on the host pool, order-preserving."""
    items = list(items)
    if len(items) <= 1:
        return [fn(x) for x in items]
    return list(host_pool().map(fn, items))


_ASYNC_POOL: ThreadPoolExecutor | None = None


def async_pool() -> ThreadPoolExecutor:
    """Separate pool for the enc/dec async host phases (symbol fetches +
    rANS coding + device dispatch of the entropy-parameter graphs).
    Distinct from host_pool so a host phase that fans out into
    parallel_map cannot deadlock waiting for workers of its own pool.
    Workers spend their time in GIL-released C calls and D2H fetches, so
    a few of them overlap several chunks' host phases against the device
    work the main thread keeps dispatching (TPUVC_ASYNC_WORKERS
    overrides; decode-side pipelining wants >2 in flight)."""
    global _ASYNC_POOL
    if _ASYNC_POOL is None:
        _ASYNC_POOL = _CtxPool(
            max_workers=int(os.environ.get("TPUVC_ASYNC_WORKERS", "4"))
        )
    return _ASYNC_POOL
