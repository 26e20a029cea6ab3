"""Framework utilities re-expressed from the reference's helpers.

- ``retry_call``     — RetryUtil.executeWithRetry (common/.../util/
                       RetryUtil.java:25-60): bounded retries with optional
                       exponential backoff. Used around sink commits; Ray
                       task retries cover everything else.
- ``TokenBucket``    — the Channel bps/tps flow control (core/.../transport/
                       channel/Channel.java:176-239) as an explicit token
                       bucket. Ray Data's streaming backpressure makes this
                       unnecessary for throughput; it exists for jobs that
                       must throttle against a rate-limited source/sink.
- ``split_range`` / ``split_ascii_range`` — RangeSplitUtil
                       (common/.../util/RangeSplitUtil.java:14-171): even
                       integer split and radix ASCII-string split, used for
                       key-range partitioned reads and synthetic splits.
- ``filter_paths``   — FilterUtil.filterByRegular (common/.../util/
                       FilterUtil.java:12-31): regex selection over a file
                       listing before the read.
"""

from __future__ import annotations

import re
import time
from typing import Callable, Iterable, TypeVar

T = TypeVar("T")


def retry_call(
    fn: Callable[[], T],
    *,
    retries: int = 3,
    sleep_s: float = 1.0,
    exponential: bool = True,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
) -> T:
    last: BaseException | None = None
    for attempt in range(retries):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203
            last = e
            if attempt == retries - 1:
                break
            delay = sleep_s * (2**attempt if exponential else 1)
            time.sleep(delay)
    raise last  # type: ignore[misc]


class TokenBucket:
    """Simple token bucket: ``acquire(n)`` blocks until n units fit under
    ``rate`` per second (burst up to ``burst`` units). Deficit model: an
    ``n`` larger than the burst capacity is still served in one call by
    sleeping off the debt — batches bigger than the burst must not
    deadlock (Channel.java:176-239 has the same whole-batch semantics)."""

    def __init__(self, rate: float, burst: float | None = None):
        self.rate = float(rate)
        self.capacity = float(burst if burst is not None else rate)
        self.tokens = self.capacity
        self.t_last = time.monotonic()

    def acquire(self, n: float = 1.0) -> float:
        """Returns seconds slept."""
        now = time.monotonic()
        self.tokens = min(self.capacity, self.tokens + (now - self.t_last) * self.rate)
        self.t_last = now
        self.tokens -= n
        if self.tokens >= 0:
            return 0.0
        need = -self.tokens / self.rate
        time.sleep(need)
        now = time.monotonic()
        self.tokens = min(self.capacity, self.tokens + (now - self.t_last) * self.rate)
        self.t_last = now
        return need


def split_range(lo: int, hi: int, n: int) -> list[tuple[int, int]]:
    """Even split of the inclusive integer range [lo, hi] into ≤n
    contiguous [start, end] chunks (RangeSplitUtil.doLongSplit)."""
    if lo > hi:
        raise ValueError(f"bad range [{lo}, {hi}]")
    n = max(1, min(n, hi - lo + 1))
    width, rem = divmod(hi - lo + 1, n)
    out = []
    start = lo
    for i in range(n):
        end = start + width - 1 + (1 if i < rem else 0)
        out.append((start, end))
        start = end + 1
    return out


def _ascii_to_int(s: str) -> int:
    v = 0
    for ch in s:
        v = v * 128 + ord(ch)
    return v


def _int_to_ascii(v: int, length: int) -> str:
    out = []
    for _ in range(length):
        v, d = divmod(v, 128)
        out.append(chr(d))
    return "".join(reversed(out))


def split_ascii_range(lo: str, hi: str, n: int, length: int | None = None) -> list[str]:
    """Radix-128 split points between two ASCII strings
    (RangeSplitUtil.doAsciiStringSplit): returns n+1 boundary strings
    lo, b1, ..., hi."""
    length = length or max(len(lo), len(hi))
    lo_p, hi_p = lo.ljust(length, "\0"), hi.ljust(length, "\0")
    a, b = _ascii_to_int(lo_p), _ascii_to_int(hi_p)
    if a > b:
        a, b = b, a
    bounds = [a + (b - a) * i // n for i in range(n + 1)]
    out = [_int_to_ascii(v, length).rstrip("\0") for v in bounds]
    out[0], out[-1] = lo, hi
    return out


def filter_paths(paths: Iterable[str], pattern: str | None) -> list[str]:
    """Regex (search) filter over a path listing; None keeps everything."""
    if not pattern:
        return list(paths)
    rx = re.compile(pattern)
    return [p for p in paths if rx.search(p)]
