"""Transform-chain execution with dirty routing and counters.

Reproduces the reference execution contract (TransformerExchanger.java:
53-127): transforms run as a chain ahead of the shuffle/sink; a record that
errors becomes DIRTY and short-circuits the rest of the chain; a record a
filter matches is FILTERED (dropped, counted); per-transformer counters
TRANSFORMER_SUCCEED/FAILED/FILTER_RECORDS are kept — here per batch, summed
in a tiny metrics actor (the Communication-counters equivalent,
core/.../statistics/communication/Communication.java).

Dead letters are not a side samples-list (StdoutPluginCollector keeps ≤10
samples) but a first-class side output: dirty rows are written as parquet
into a dead-letter directory from inside the batch task, with the error
label attached — streaming, no driver round-trip, later inspectable and
countable for the error budget."""

from __future__ import annotations

import os
import uuid
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.transforms.dx import Transform


def _counter_actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class _Counters:
        def __init__(self):
            self.c = {"input": 0, "succeeded": 0, "filtered": 0, "dirty": 0}

        def add(self, input_: int, succeeded: int, filtered: int, dirty: int):
            self.c["input"] += input_
            self.c["succeeded"] += succeeded
            self.c["filtered"] += filtered
            self.c["dirty"] += dirty

        def totals(self):
            return dict(self.c)

    return _Counters


class Counters:
    """Driver-side handle for the metrics actor."""

    def __init__(self):
        self.actor = _counter_actor_cls().remote()

    def totals(self) -> dict:
        import ray

        return ray.get(self.actor.totals.remote())


class TransformChain:
    """Callable for ``map_batches``: applies the chain, routes dirty rows to
    the dead-letter dir, drops filtered rows, reports counters.

    Used as ``ds.map_batches(TransformChain(...), batch_format="pyarrow")``
    — a plain (stateless) task; all per-row state lives in the batch.
    """

    def __init__(
        self,
        transforms: Sequence[Transform],
        *,
        dead_letter_dir: str | None = None,
        counters: Counters | None = None,
    ):
        self.transforms = list(transforms)
        self.dead_letter_dir = dead_letter_dir
        self.counter_actor = counters.actor if counters is not None else None
        if dead_letter_dir:
            os.makedirs(dead_letter_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_in = batch.num_rows
        n_filtered = 0
        dirty_parts: list[pa.Table] = []
        for t in self.transforms:
            if batch.num_rows == 0:
                break
            dm = t.dirty_mask(batch)
            if dm is not None and pc.any(dm).as_py():
                bad = batch.filter(dm)
                bad = bad.append_column(
                    "_error", pa.array([t.error_label()] * bad.num_rows)
                )
                dirty_parts.append(bad)
                batch = batch.filter(pc.invert(dm))
            drop = t.drop_mask(batch)
            if drop is not None:
                n_before = batch.num_rows
                batch = batch.filter(pc.invert(drop))
                n_filtered += n_before - batch.num_rows
            batch = t.apply(batch)
        n_dirty = sum(p.num_rows for p in dirty_parts)
        if dirty_parts and self.dead_letter_dir:
            dead = pa.concat_tables(dirty_parts, promote_options="permissive")
            path = os.path.join(self.dead_letter_dir, f"dl-{uuid.uuid4().hex}.parquet")
            pq.write_table(dead, path)
        if self.counter_actor is not None:
            import ray

            # synchronous ack: pipeline completion must imply counter
            # visibility (a fire-and-forget .remote() can still be in the
            # actor's mailbox when the driver reads totals)
            ray.get(self.counter_actor.add.remote(
                n_in, batch.num_rows, n_filtered, n_dirty
            ))
        return batch


def read_dead_letters(dead_letter_dir: str) -> pa.Table | None:
    import glob

    files = sorted(glob.glob(os.path.join(dead_letter_dir, "dl-*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")
