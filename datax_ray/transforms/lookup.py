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

import weakref

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.transforms.dx import Transform

#: process-level probe-state cache. CDC chains are REBUILT per map task
#: from their specs, so per-instance state would rebuild the pd.Index
#: (seconds for millions of keys) in every task — measured 2× total
#: replay time at 64 M events / 1.28 M dims. Keyed by the broadcast
#: ObjectRef (or path), one index build per worker process.
_PROBE_CACHE: dict = {}


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
            if isinstance(t, pa.Table):
                # id(t) is only unique while t is alive — a weakref
                # finalizer evicts the entry when the table is collected
                # so a recycled id can never hit a stale index.
                key = (id(t), self.dim_key, tuple(self.columns or ()))
                if key not in _PROBE_CACHE:
                    weakref.finalize(t, _PROBE_CACHE.pop, key, None)
            else:
                key = (str(t), self.dim_key, tuple(self.columns or ()))
            cached = _PROBE_CACHE.get(key)
            if cached is not None:
                self._state = cached
                return self._state
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
            dim_keys = t[self.dim_key].combine_chunks()
            keys_np = np.asarray(dim_keys)
            if pd.Index(keys_np).has_duplicates:
                raise ValueError(
                    f"lookup dim key '{self.dim_key}' is not unique")
            # probe on 64-bit siphashes, not objects: int hash-table probes
            # are ~3.5× faster than object-string probes, and matches are
            # VERIFIED by string equality on the (small) distinct set, so
            # results stay exact even under a hash collision. If the dim
            # hashes themselves collide (≈2^-44 at 10^6 keys), fall back
            # to the exact object index.
            hidx = pd.Index(pd.util.hash_array(keys_np, categorize=False))
            if hidx.has_duplicates:
                hidx, dim_keys = pd.Index(keys_np), None
            self._state = (hidx, dim_keys,
                           {c: t[c].combine_chunks() for c in cols})
            _PROBE_CACHE[key] = self._state
        return self._state

    def _positions(self, batch: pa.Table) -> np.ndarray:
        """Dim positions per row; -1 = miss. Probes each batch's DISTINCT
        keys only (Arrow dictionary_encode — CDC batches repeat keys
        ~50×, so python-object conversion and hash probes shrink by the
        same factor), and probes 64-bit hashes instead of strings.
        Measured at 64 M events / 1.28 M-row dim: enrichment overhead on
        the full replay fell 111% → 20% across the three fixes
        (process-cached index, distinct-only probe, hashed probe); the
        residual is mostly the enriched rows being wider through the
        exchange and the sink."""
        idx, dim_keys, _ = self._resolve()
        enc = batch[self.key].combine_chunks().dictionary_encode()
        uniq_np = np.asarray(enc.dictionary)
        if dim_keys is not None:  # hashed probe + exact verification
            pos_u = idx.get_indexer(
                pd.util.hash_array(uniq_np, categorize=False))
            hit = np.flatnonzero(pos_u >= 0)
            if len(hit):
                cand = dim_keys.take(pa.array(pos_u[hit]))
                eq = np.asarray(
                    pc.equal(cand, enc.dictionary.take(pa.array(hit)))
                    .fill_null(False))
                pos_u[hit[~eq]] = -1  # hash collision with a foreign key
        else:  # dim hashes collided: exact object index
            pos_u = idx.get_indexer(uniq_np)
        di = enc.indices
        if di.null_count:
            di_np = np.asarray(di.fill_null(-1))
            return np.where(di_np >= 0, pos_u[di_np], -1)
        return pos_u[np.asarray(di)]

    def dirty_mask(self, batch: pa.Table):
        if not self.required:
            return None
        return pa.array(self._positions(batch) < 0)

    def apply(self, batch: pa.Table) -> pa.Table:
        _, _, cols = self._resolve()
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
