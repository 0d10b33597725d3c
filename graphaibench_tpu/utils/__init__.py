from graphaibench_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from graphaibench_tpu.utils.timers import TIMERS, OpTimers, profiler_trace  # noqa: F401
