"""Exact grouped aggregates beyond Ray's built-ins.

- ``group_quantiles`` — EXACT per-group quantiles (linear interpolation,
  the SQL ``percentile_cont`` / DuckDB ``quantile_cont`` definition:
  ``h = (n−1)·q``; interpolate between ``x[⌊h⌋]`` and ``x[⌊h⌋+1]``).
  One hash shuffle of (key, value) rows, then one vectorized kernel per
  partition: a single sort by (key, value) + ``reduceat``-style gather at
  interpolation indices for ALL groups and quantiles at once — no
  per-group Python. The approximate, zero-shuffle alternative for wide
  scans is ``ops/sketch.py`` (KLL); this op is its exact counterpart when
  the grouped distribution itself is the deliverable.
- ``assemble_conversations`` — transcripts-native: fold each
  conversation's turns (ordered by turn_idx) into one document row
  (``string_agg`` analogue): per-partition sort + one Arrow
  ``binary_join`` over a run-length list array — no per-conv loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def group_quantiles(ds, *, key_col: str, value_col: str,
                    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
                    digits: int = 6, num_partitions: int = 16):
    """Exact per-group ``percentile_cont`` quantiles. Output one row per
    (key, q): (key_col, q, value). Nulls in ``value_col`` are excluded
    (SQL semantics); empty groups emit nothing."""
    from datax_ray.cdc.merge import stable_hash_partition

    qs = np.asarray(quantiles, dtype=np.float64)

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t[value_col]))
        part = stable_hash_partition(t[key_col], num_partitions)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], g.schema.field(key_col).type),
            "q": pa.array([], pa.float64()),
            "value": pa.array([], pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        g = g.sort_by([(key_col, "ascending"), (value_col, "ascending")])
        keys = np.asarray(g[key_col])
        vals = np.asarray(g[value_col]).astype(np.float64)
        starts = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1])))
        counts = np.diff(np.append(starts, len(keys))).astype(np.int64)
        n_g, n_q = len(starts), len(qs)
        # h = (n-1)q per (group, quantile), flattened group-major
        h = (counts[:, None] - 1) * qs[None, :]
        lo = np.floor(h).astype(np.int64)
        frac = h - lo
        base = np.repeat(starts, n_q)
        lo_idx = base + lo.ravel()
        hi_idx = np.minimum(lo_idx + 1,
                            np.repeat(starts + counts - 1, n_q))
        v = vals[lo_idx] + frac.ravel() * (vals[hi_idx] - vals[lo_idx])
        return pa.table({
            key_col: pa.array(np.repeat(keys[starts], n_q)),
            "q": pa.array(np.tile(qs, n_g)),
            "value": pa.array(np.round(v, digits)),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_part").map_groups(kernel, batch_format="pyarrow"))


def assemble_conversations(ds, *, conv_col: str = "conv_id",
                           order_col: str = "turn_idx",
                           text_col: str = "text", sep: str = "\n",
                           num_partitions: int = 16):
    """Fold each conversation's turns into one row:
    (conv_col, n_turns, full_text) with turns joined by ``sep`` in
    ``order_col`` order, null texts joined as empty strings (SQL
    ``string_agg(coalesce(text,''), sep ORDER BY order_col)``). One hash
    shuffle of (conv, order, text); per partition a single sort + one
    run-length ListArray + one Arrow ``binary_join``."""
    from datax_ray.cdc.merge import stable_hash_partition

    def add_part(t: pa.Table) -> pa.Table:
        part = stable_hash_partition(t[conv_col], num_partitions)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table({
            conv_col: pa.array([], g.schema.field(conv_col).type),
            "n_turns": pa.array([], pa.int64()),
            "full_text": pa.array([], pa.string()),
        })
        if g.num_rows == 0:
            return empty
        g = g.sort_by([(conv_col, "ascending"), (order_col, "ascending")])
        keys = np.asarray(g[conv_col])
        starts = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1])))
        counts = np.diff(np.append(starts, len(keys))).astype(np.int64)
        texts = pc.fill_null(g[text_col].combine_chunks(), "")
        off = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        lists = pa.ListArray.from_arrays(pa.array(off, pa.int32()), texts)
        return pa.table({
            conv_col: pa.array(keys[starts]),
            "n_turns": pa.array(counts),
            "full_text": pc.binary_join(lists, sep),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_part").map_groups(kernel, batch_format="pyarrow"))
