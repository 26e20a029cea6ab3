"""Broadcast dimension-lookup enrichment for transform chains.

A CDC/copy pipeline routinely needs to decorate the stream with columns
from a small dimension table (user → segment, sku → category). DataX has
no join transformer — its chains are strictly per-record
(transformer.md:12-109) — so enrichment is pushed to the target DB. Here
it is a first-class chain stage built the scale-correct way:

- the dimension table is loaded ONCE on the driver and ``ray.put`` into
  the object store (``broadcast_lookup_specs``); every map task reads the
  same shared-memory copy zero-copy — never re-shipped per batch, never
  re-read per task;
- per batch, the join is an order-preserving vectorized hash probe
  (pandas ``Index.get_indexer`` over the key column) + one Arrow ``take``
  per added column — no shuffle, no sort, row order untouched (the chain
  contract requires stable row identity for dirty routing);
- unmatched keys left-join to null, or with ``required=True`` become
  DIRTY rows (dead-letter path), matching the reference's treatment of
  unresolvable records.

Job-spec usage::

    {"name": "lookup", "parameter": {
        "path": "/dims/users.parquet", "key": "user_id",
        "dimKey": "id", "columns": ["segment", "region"],
        "required": false}}
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.transforms.dx import Transform


class Lookup(Transform):
    """Enrich batches with columns from a broadcast dimension table.

    ``table`` may be a parquet path (each worker process reads it once,
    lazily), a ``pa.Table`` (small inline dims), or a Ray ``ObjectRef``
    produced by ``broadcast_lookup_specs`` (the 100 TB path: one
    object-store copy per node, zero-copy reads). The probe index is
    built once per process on first use, never per batch."""

    name = "lookup"

    def __init__(self, table, key: str, dim_key: str | None = None,
                 columns: list[str] | None = None, required: bool = False):
        self.key = key
        self.dim_key = dim_key or key
        self.columns = columns
        self.required = required
        self._src = table
        self._state = None  # lazy: (pd.Index, {name: pa.Array})

    def _resolve(self):
        if self._state is None:
            t = self._src
            if isinstance(t, str):
                t = pq.read_table(t)
            elif not isinstance(t, pa.Table):
                import ray

                t = ray.get(t)  # zero-copy from the local object store
            cols = self.columns or [c for c in t.column_names
                                    if c != self.dim_key]
            dup = [c for c in cols if c == self.key]
            if dup:
                raise ValueError(
                    f"lookup output column collides with the key: {dup}")
            idx = pd.Index(np.asarray(t[self.dim_key]))
            if idx.has_duplicates:
                raise ValueError(
                    f"lookup dim key '{self.dim_key}' is not unique")
            self._state = (idx, {c: t[c].combine_chunks() for c in cols})
        return self._state

    def _positions(self, batch: pa.Table) -> np.ndarray:
        idx, _ = self._resolve()
        return idx.get_indexer(np.asarray(batch[self.key]))

    def dirty_mask(self, batch: pa.Table):
        if not self.required:
            return None
        return pa.array(self._positions(batch) < 0)

    def apply(self, batch: pa.Table) -> pa.Table:
        _, cols = self._resolve()
        pos = self._positions(batch)
        hit = pos >= 0
        take = pa.array(np.where(hit, pos, 0).astype(np.int64))
        all_hit = bool(hit.all())
        hit_arr = None if all_hit else pa.array(hit)
        for name, arr in cols.items():
            joined = arr.take(take)
            if not all_hit:
                joined = pc.if_else(hit_arr, joined,
                                    pa.scalar(None, arr.type))
            batch = batch.append_column(name, joined)
        return batch


def broadcast_lookup_specs(specs):
    """Driver-side pre-pass over transform specs: load each lookup's
    dimension parquet ONCE, prune it to (dimKey + columns), and replace
    the path with a ``ray.put`` ObjectRef — so N map tasks × E epochs
    share one object-store copy instead of issuing N×E file reads.
    Non-lookup specs pass through untouched."""
    if not specs:
        return specs
    import ray

    out = []
    for s in specs:
        if s.get("name") == "lookup":
            p = dict(s.get("parameter", {}))
            src = p.pop("path", None) or p.pop("table", None)
            if isinstance(src, str):
                t = pq.read_table(src)
                cols = p.get("columns")
                dk = p.get("dimKey") or p.get("key")
                if cols:
                    t = t.select([dk] + [c for c in cols if c != dk])
                src = ray.put(t)
            if src is not None:
                p["table"] = src
            s = {**s, "parameter": p}
        out.append(s)
    return out
