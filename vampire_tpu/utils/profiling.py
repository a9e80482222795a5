"""Profiling helpers (reference: Lightning profiler='simple' + the
cuda-synchronized `run_time` decorator, src/utils/bricks.py:7-19).

TPU equivalents: `run_time` blocks on JAX async dispatch and keeps running
averages; `trace` wraps jax.profiler for XPlane dumps; `named_scope` re-exports
jax.named_scope so hot sections are labeled in traces.
"""
from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Callable, Dict

import jax

named_scope = jax.named_scope

_TIMINGS: Dict[str, list] = defaultdict(lambda: [0.0, 0])


def run_time(name: str):
    """Decorator: block_until_ready + running-average timing (bricks.py:7-19)."""
    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            out = jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            acc = _TIMINGS[name]
            acc[0] += dt
            acc[1] += 1
            print(f'{name}: {dt * 1000:.1f}ms '
                  f'(avg {acc[0] / acc[1] * 1000:.1f}ms over {acc[1]})')
            return out
        return wrapped
    return deco


def timing_summary() -> Dict[str, float]:
    return {k: v[0] / max(v[1], 1) for k, v in _TIMINGS.items()}


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
