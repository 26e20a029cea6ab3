"""Job-level flow control: ``job.setting.speed.{record,byte,channel}``.

DataX throttles per channel — every Channel.push/pull checks byte/record
token counters against ``job.setting.speed`` divided across channels
(core/.../transport/channel/Channel.java:176-239; introduction.md:103-113).
Ray Data has no channel object, so the global budget lives in ONE detached
limiter actor holding token buckets; a ``Throttle`` map_batches stage
acquires (rows, bytes) per batch before passing it through. Actor-call
serialization makes the limit global across all concurrent read/transform
tasks — equivalent to the reference's sum-over-channels budget without
having to guess task parallelism. ``speed.channel`` is accepted but
advisory only (the streaming executor owns parallelism).
"""

from __future__ import annotations

import pyarrow as pa

from datax_ray.util import TokenBucket


class _RateLimiter:
    def __init__(self, record_rate: float | None, byte_rate: float | None):
        self.rec = TokenBucket(record_rate) if record_rate else None
        self.byt = TokenBucket(byte_rate) if byte_rate else None

    def acquire(self, records: int, nbytes: int) -> float:
        slept = 0.0
        if self.rec is not None:
            slept += self.rec.acquire(records)
        if self.byt is not None:
            slept += self.byt.acquire(nbytes)
        return slept


class Throttle:
    """Per-batch throttle stage; holds a handle to the shared limiter actor."""

    def __init__(self, limiter):
        self.limiter = limiter

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        ray.get(self.limiter.acquire.remote(batch.num_rows, batch.nbytes))
        return batch


def make_throttle(speed: dict) -> Throttle:
    """Build the shared limiter actor + throttle stage from a job spec's
    ``setting.speed`` dict ({"record": tps, "byte": bps, "channel": n})."""
    import ray

    record = speed.get("record")
    byte = speed.get("byte")
    actor_cls = ray.remote(num_cpus=0)(_RateLimiter)
    limiter = actor_cls.remote(
        float(record) if record else None, float(byte) if byte else None
    )
    return Throttle(limiter)
