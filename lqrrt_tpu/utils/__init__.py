"""Auxiliary subsystems (SURVEY.md section 5): tracing/profiling, structured
metrics, checkpoint/resume, and the replan watchdog."""
from . import cache, checkpoint, metrics, timing, watchdog  # noqa: F401
from .cache import enable_persistent_cache  # noqa: F401
from .checkpoint import load, save  # noqa: F401
from .metrics import BufferSink, JsonlSink, StdoutSink, attach  # noqa: F401
from .timing import PhaseTimer, device_trace, timed_call  # noqa: F401
from .watchdog import ReplanWatchdog  # noqa: F401
