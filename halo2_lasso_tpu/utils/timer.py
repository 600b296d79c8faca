"""Hierarchical phase timers (equivalent of the reference's ark-std
print-trace timers, util/timer.rs:8-59, consumed by its plotter).

Enabled via HALO2_LASSO_TPU_TIMER=1 or `timed.enable()`. Emits the same
`name-k: ms` style lines so a plotter can group phase costs.
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
import time

_ENABLED = os.environ.get("HALO2_LASSO_TPU_TIMER", "0") == "1"
# HALO2_LASSO_TPU_PROFILE=<dir>: wrap top-level timed scopes (prove /
# preprocess / verify) in a jax.profiler trace written to <dir>, viewable
# in TensorBoard/XProf — device timeline + HLO cost attribution.
_PROFILE_DIR = os.environ.get("HALO2_LASSO_TPU_PROFILE", "")
_DEPTH = 0
_RECORDS: list = []


class timed:
    """Decorator + context-manager factory for phase timing."""

    def __init__(self, name: str):
        self.name = name

    def __call__(self, fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with timed.scope(self.name):
                return fn(*args, **kwargs)

        return wrapper

    @staticmethod
    def enable(flag: bool = True):
        global _ENABLED
        _ENABLED = flag

    @staticmethod
    def records():
        return list(_RECORDS)

    @staticmethod
    def clear():
        _RECORDS.clear()

    @staticmethod
    @contextlib.contextmanager
    def scope(name: str):
        global _DEPTH
        profiling = bool(_PROFILE_DIR) and _DEPTH == 0
        if profiling:
            import jax

            jax.profiler.start_trace(_PROFILE_DIR)
        start = time.perf_counter()
        _DEPTH += 1
        try:
            yield
        finally:
            _DEPTH -= 1
            ms = (time.perf_counter() - start) * 1e3
            _RECORDS.append((name, ms))
            if _ENABLED:
                print(f"{'·' * _DEPTH}{name}: {ms:.1f}ms", file=sys.stderr)
            if profiling:
                import jax

                jax.profiler.stop_trace()
