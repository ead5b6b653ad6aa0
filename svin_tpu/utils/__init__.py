from . import timebase
from .timing import Timer, Timing, device_trace

__all__ = ["timebase", "Timer", "Timing", "device_trace"]
