"""Per-op timing + profiling hooks.

The analog of the reference's global time_ops map + print_timers
(include/gnn/global.h:42-54, src/gnn/train.cpp:60-76) and its Timer
(include/timer.h): accumulate wall time per op tag, print a breakdown.
jax.profiler trace capture replaces nvprof/VTune hooks (common.mk:41-46).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

# stage tags for the jitted production path: inside one compiled step
# XLA fuses ops, so the honest per-run breakdown is per STAGE with a
# device sync at each boundary (train.cpp:60-76 prints per-op because
# every reference op is its own kernel launch; here `step` IS one launch)
OP_STEP = "step"          # fwd+bwd+optimizer, device-synced
OP_EVAL = "eval"          # full-graph inference + masked accuracy
OP_HALO = "halo"          # sharded halo all_to_all, when measured alone

# op tags mirroring OP_DENSEMM / OP_SPARSEMM / ... (global.h:42-54)
OP_DENSEMM = "dense_mm"
OP_SPARSEMM = "sparse_mm"
OP_RELU = "relu"
OP_DROPOUT = "dropout"
OP_LOSS = "loss"
OP_SCORE = "score"
OP_ATTN = "attention"
OP_TRANSPOSE = "transpose"
OP_NORM = "norm"
OP_SAMPLE = "sample"
OP_COPY = "copy"


class OpTimers:
    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def op(self, tag: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[tag] += time.perf_counter() - t0
            self.counts[tag] += 1

    def add(self, tag: str, seconds: float):
        self.times[tag] += seconds
        self.counts[tag] += 1

    def print_timers(self):
        total = sum(self.times.values())
        print("Per-op time breakdown:")
        for tag, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total else 0.0
            print(f"  {tag:12s} {t:10.4f} s ({pct:5.1f}%)  x{self.counts[tag]}")
        print(f"  {'total':12s} {total:10.4f} s")

    def reset(self):
        self.times.clear()
        self.counts.clear()


TIMERS = OpTimers()


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
