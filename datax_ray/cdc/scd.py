"""SCD Type-2 history from a change stream (validity-interval versioning).

The LWW merge (cdc/merge.py) keeps only the CURRENT row per key; warehouses
ingesting CDC typically also want the full slowly-changing-dimension
history: one row per VERSION with a ``[valid_from, valid_to)`` interval,
closed by the next change on the same key (an update supersedes, a delete
closes without opening). The reference expresses the same need as writer
modes replaying every change into a versioned store (otswriter UpdateRow
with per-cell timestamps, hbase versionColumn — hbase11xwriter/doc:
versionColumn; otswriter/.../model/OTSConst.java:17-24); here it is one
shuffle plus a vectorized interval kernel.

Plan (lazy, streaming):

  changelog → map_batches(add part = stable_hash(conv_id) % P)
            → groupby(part).map_groups(scd2_fold_group)

No combiner stage: unlike LWW, every version survives, so the shuffle
legitimately moves all rows — but only ONCE, and the per-partition kernel
is a single sort + shifted-compare (no per-key loop). At 100 TB the
output is the same order of size as the input, so the operator keeps
Dataset form end-to-end (write it straight to a partitioned sink; never
materialized).

Skew note: partitioning is by conv_id hash, so a pathologically hot
conversation lands in one group. Version intervals need the key's FULL
ordered run in one place, so salting cannot be applied blindly; the
standard mitigation is salting by (conv_id, turn_idx) — intervals are
computed per (conv_id, turn_idx) key, so routing by the full key spreads
hot conversations across partitions while keeping every key's run intact.
``salt_by_turn=True`` enables exactly that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.cdc.merge import _SORT_KEYS, add_partition_column, stable_hash
from datax_ray.schema import KEY_COLS


def scd2_fold_group(g: pa.Table) -> pa.Table:
    """Vectorized interval builder over one hash partition.

    Sort by (key, ts, lsn); row i's interval is closed by row i+1 iff
    row i+1 has the same key. Delete events close the previous version
    and are dropped from the output. is_current = version not superseded
    by ANY later event (update or delete) on its key.
    """
    n = g.num_rows
    if n == 0:
        return _empty_history(g.schema)
    t = g.take(pc.sort_indices(g, sort_keys=_SORT_KEYS)).combine_chunks()

    same_next = np.ones(n, dtype=bool)
    for k in KEY_COLS:
        col = np.asarray(t[k])
        same_next[:-1] &= col[1:] == col[:-1]
    same_next[-1] = False

    # valid_to[i] = ts[i+1] where the next row shares the key, else NULL.
    # pc.take with a masked (null) index yields null — no Python branch.
    nxt = np.arange(1, n + 1, dtype=np.int64)
    nxt[-1] = 0  # in-bounds placeholder; masked anyway
    idx = pa.array(nxt, type=pa.int64(), mask=~same_next)
    ts_col = t["ts"].combine_chunks()
    valid_to = pc.take(ts_col, idx)
    closed_by = pc.take(t["lsn"].combine_chunks(), idx)

    keep = pc.invert(pc.equal(t["op"], "D"))
    out = pa.table(
        {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "role": t["role"],
            "text": t["text"],
            "tool": t["tool"],
            "valid_from": t["ts"],
            "valid_to": valid_to,
            "version_lsn": t["lsn"],
            "closed_by_lsn": closed_by,
            "is_current": pa.array(~same_next),
        }
    )
    return out.filter(keep)


def _empty_history(src: pa.Schema) -> pa.Table:
    ts_t = src.field("ts").type
    return pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "valid_from": pa.array([], ts_t),
            "valid_to": pa.array([], ts_t),
            "version_lsn": pa.array([], pa.int64()),
            "closed_by_lsn": pa.array([], pa.int64()),
            "is_current": pa.array([], pa.bool_()),
        }
    )


def scd2_history(events, *, num_partitions: int = 64,
                 salt_by_turn: bool = False):
    """Changelog ``Dataset`` → SCD2 version-history ``Dataset``.

    ``salt_by_turn`` routes by hash(conv_id, turn_idx) instead of
    hash(conv_id) — exact for interval computation (intervals never span
    turn_idx values) and spreads Zipf-hot conversations.
    """

    def add_part(t: pa.Table) -> pa.Table:
        if not salt_by_turn:
            return add_partition_column(t, num_partitions)
        h = stable_hash(t["conv_id"]) ^ (
            stable_hash(t["turn_idx"]) * np.uint64(0x9E3779B97F4A7C15))
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("part", pa.array(part, type=pa.int32()))

    ds = events.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds.groupby("part").map_groups(
        lambda g: scd2_fold_group(g.drop_columns(["part"])),
        batch_format="pyarrow",
    )
