"""Key-partitioned last-writer-wins upsert merge — the heart of the engine.

DataX expresses upserts as *writer modes* pushed to the target database
(replace / ON DUPLICATE KEY UPDATE / MERGE INTO — reference:
plugin-rdbms-util/.../writer/util/WriterUtil.java:114-200; OTS row ops
PutRow/UpdateRow/DeleteRow — otswriter/.../model/OTSConst.java:17-24).
We re-express them natively: a change-event Dataset is hash-partitioned by
``conv_id`` and folded per key ``(conv_id, turn_idx)`` with
last-writer-wins ordered by ``(ts, lsn)`` — newer ``ts`` wins, ties broken
by ``lsn``; the latest op decides existence (``D`` ⇒ row absent).

Design for scale (the whole point):

1. **Combiner first** (``partial_lww_combiner``): every input batch is folded
   to ≤1 row per key *before* any shuffle, entirely vectorized in Arrow
   (sort + adjacent-key boundary mask). A changelog with many updates per key
   shrinks by orders of magnitude before it moves. This mirrors DataX's
   over-split-×5 skew strategy (ReaderSplitUtil.java:62-82) but as data
   reduction instead of task splitting.
2. **One shuffle**: ``groupby(part)`` over the combined partials, where
   ``part = stable_hash(conv_id) % P``. The fold inside each group is again
   the same vectorized kernel over the whole partition — NOT a per-key
   Python loop (``map_groups`` is called once per *partition*, with P ≈ a few
   × cores, so per-group overhead is amortized).
3. **Salted two-phase for hot keys** (``lww_merge(salt=...)``): a Zipf-hot
   ``conv_id`` would make one partition huge; phase 1 groups by
   ``(part, salt)`` with ``salt = stable_hash(turn_idx) % S`` (rows of the
   same key always share a salt ⇒ the fold stays correct), phase 2 re-merges
   partials by ``part``. The fold is associative, so any grouping that keeps
   a key within one group per phase is exact.

Duplicate delivery (replayed lsn ranges, cf. otsstreamreader's
ShardCheckpoint skipCount resume, .../model/ShardCheckpoint.java:14-19) is
idempotent by construction: duplicates are identical ``(ts, lsn)`` rows and
max-by-(ts, lsn) keeps one of them.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schema import KEY_COLS, VERSION_COLS, concat_aligned

# Sort spec used everywhere: key columns ascending, then version ascending —
# after this sort, the LAST row of each key run is the winner.
_SORT_KEYS = [(c, "ascending") for c in (*KEY_COLS, *VERSION_COLS)]


def stable_hash(values: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Deterministic (process-independent) uint64 hash of a column.

    Python's builtin ``hash`` is salted per process, so it can NOT be used
    to route keys to partitions across Ray workers. pandas' hash_array is a
    fixed-key siphash — stable across processes and vectorized.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = np.asarray(values)
    return pd.util.hash_array(values, categorize=False)


def add_partition_column(
    batch: pa.Table, num_partitions: int, col: str = "conv_id", out: str = "part"
) -> pa.Table:
    """Append ``part = stable_hash(col) % num_partitions`` (int32)."""
    part = (stable_hash(batch[col]) % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column(out, pa.array(part, type=pa.int32()))


def stable_hash_partition(values, num_partitions: int) -> np.ndarray:
    return (stable_hash(values) % np.uint64(num_partitions)).astype(np.int32)


def _last_per_key_mask(table: pa.Table, key_cols: Iterable[str]) -> pa.BooleanArray:
    """Boolean mask keeping the last row of each equal-key run.

    ``table`` must already be sorted by key. Fully vectorized: a row is a
    run-end iff any key column differs from the next row's.
    """
    n = table.num_rows
    if n == 0:
        return pa.array([], type=pa.bool_())
    neq = None
    for col in key_cols:
        arr = table[col].combine_chunks()
        d = pc.not_equal(arr.slice(0, n - 1), arr.slice(1, n - 1))
        # not_equal on null keys yields null; treat null==null as equal run
        d = pc.fill_null(d, False)
        neq = d if neq is None else pc.or_(neq, d)
    return pa.concat_arrays([neq, pa.array([True])])


#: Event-count weight column threaded through partial folds so raw-event
#: throughput metrics survive the combiner (a kept partial row carries the
#: number of raw events it collapsed).
EVENT_WEIGHT_COL = "_n"


def lww_fold_table(
    table: pa.Table,
    *,
    key_cols: Iterable[str] = KEY_COLS,
    version_cols: Iterable[str] = VERSION_COLS,
    drop_deletes: bool = False,
    op_col: str = "op",
    weight_col: str | None = None,
) -> pa.Table:
    """Fold a (partition of a) changelog to one winning row per key.

    Vectorized: one multi-column sort + one adjacent-inequality mask + one
    filter — no Python per-row/per-key loop. Associative: folding partial
    folds gives the same result as folding raw events, which is what makes
    the combiner and the salted two-phase merge exact.

    With ``drop_deletes=False`` delete events survive as tombstones (needed
    for partial folds — a D must still kill earlier rows from other
    batches/epochs). Only the final fold drops them.

    If ``weight_col`` names an existing int column, the kept row of each key
    run carries the SUM of the run's weights (segment-sum via cumsum — still
    vectorized), so event counts stay exact across any number of fold phases.
    """
    if table.num_rows == 0:
        return table
    sort_keys = [(c, "ascending") for c in (*key_cols, *version_cols)]
    table = table.sort_by(sort_keys)
    mask = _last_per_key_mask(table, key_cols)
    if weight_col and weight_col in table.column_names:
        w = np.asarray(table[weight_col].combine_chunks()).astype(np.int64)
        cs = np.cumsum(w)
        ends = np.flatnonzero(np.asarray(mask))
        seg = np.diff(np.concatenate([[0], cs[ends]]))
        table = table.filter(mask)
        table = table.set_column(
            table.schema.get_field_index(weight_col),
            pa.field(weight_col, pa.int64()),
            pa.array(seg, type=pa.int64()),
        )
    else:
        table = table.filter(mask)
    if drop_deletes and op_col in table.column_names:
        table = table.filter(pc.not_equal(table[op_col], pa.scalar("D")))
    return table


def partial_lww_combiner(batch: pa.Table, *, with_weights: bool = False) -> pa.Table:
    """Per-batch combiner: shrink a changelog batch to ≤1 row per key,
    tombstones retained. Runs before the shuffle."""
    if with_weights and EVENT_WEIGHT_COL not in batch.column_names:
        batch = batch.append_column(
            EVENT_WEIGHT_COL, pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )
    return lww_fold_table(
        batch,
        drop_deletes=False,
        weight_col=EVENT_WEIGHT_COL if with_weights else None,
    )


def final_fold_group(group: pa.Table) -> pa.Table:
    """Fold one hash partition to final state (tombstones dropped)."""
    return lww_fold_table(group, drop_deletes=True)


def partial_fold_group(group: pa.Table) -> pa.Table:
    return lww_fold_table(group, drop_deletes=False)


def lww_merge(
    events,
    *,
    num_partitions: int = 64,
    salt: int | None = None,
    drop_columns: tuple[str, ...] = ("op", "lsn", "part"),
    keep_ops: bool = False,
):
    """Merge a changelog ``Dataset`` into final table state.

    Stages (all lazy, streaming):
      events → map_batches(combiner)              # vectorized pre-reduce
             → map_batches(add part [, salt])     # stable hash routing
             → groupby(part[, salt]).map_groups(fold)   # THE shuffle
             [→ groupby(part).map_groups(fold)]   # salted re-merge pass
             → drop tombstones + bookkeeping cols

    ``salt=None`` is the default single-shuffle plan. ``salt=S`` enables the
    hot-key two-phase plan from the north rule: phase 1 folds on
    ``(part, salt_of_turn_idx)`` so a hot conv_id spreads over S groups,
    phase 2 re-merges partials by part.
    """
    import ray.data  # noqa: F401  (Dataset type, lazy import keeps module light)

    ds = events.map_batches(
        partial_lww_combiner, batch_format="pyarrow", zero_copy_batch=True
    )

    if salt is None:
        ds = ds.map_batches(
            lambda t: add_partition_column(t, num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = ds.groupby("part").map_groups(
            final_fold_group if not keep_ops else partial_fold_group,
            batch_format="pyarrow",
        )
    else:

        def add_part_and_salt(t: pa.Table) -> pa.Table:
            t = add_partition_column(t, num_partitions)
            s = (stable_hash(t["turn_idx"]) % np.uint64(salt)).astype(np.int32)
            return t.append_column("salt", pa.array(s, type=pa.int32()))

        ds = ds.map_batches(add_part_and_salt, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.groupby(["part", "salt"]).map_groups(
            partial_fold_group, batch_format="pyarrow"
        )
        ds = ds.groupby("part").map_groups(
            final_fold_group if not keep_ops else partial_fold_group,
            batch_format="pyarrow",
        )
        drop_columns = tuple(drop_columns) + ("salt",)

    def cleanup(t: pa.Table) -> pa.Table:
        drop = [c for c in drop_columns if c in t.column_names and not (keep_ops and c in ("op", "lsn"))]
        return t.drop_columns(drop) if drop else t

    return ds.map_batches(cleanup, batch_format="pyarrow", zero_copy_batch=True)


def lww_fold_chain(tables: list[pa.Table], *, drop_deletes: bool) -> pa.Table:
    """Fold a list of (schema-evolving) tables in order — used by the lake
    reader to fold base snapshot + epoch deltas for one partition."""
    merged = concat_aligned(tables)
    return lww_fold_table(merged, drop_deletes=drop_deletes)
