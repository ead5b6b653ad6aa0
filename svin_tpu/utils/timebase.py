"""Timestamps as int64 nanoseconds.

Replaces ``okvis::Time/Duration`` (reference:
``okvis_time/include/okvis/Time.hpp``) with plain int64 ns — the natural
device-friendly representation (no sec/nsec struct pairs, no overflow
bookkeeping; arithmetic is ordinary integer math).
"""
from __future__ import annotations

import time as _time

NS_PER_S = 1_000_000_000


def from_sec(t: float) -> int:
    return int(round(t * NS_PER_S))


def to_sec(t_ns: int) -> float:
    return t_ns / NS_PER_S

def from_sec_nsec(sec: int, nsec: int) -> int:
    return int(sec) * NS_PER_S + int(nsec)


def now() -> int:
    return _time.time_ns()
