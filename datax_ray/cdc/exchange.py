"""Raw-Ray hash exchange for the epoch merge — the fast path.

Ray Data's ``groupby(part)`` is a sort-based shuffle: it samples, sorts and
range-partitions every batch, which costs ~20s of fixed overhead per epoch
at bench scale (measured via ds.stats(): the Sort operator dominated an
epoch 20.8s/24.9s). The merge doesn't need a sort — it needs *hash
co-location*, which a two-stage map/reduce over raw Ray tasks expresses
directly (the canonical Ray-core shuffle pattern from the public Ray docs):

  map (one task per changelog file):
      read file (lsn-range pushed to parquet row-group pruning)
      → vectorized partial LWW combine (tombstones + event-count weights)
      → ONE argsort by part + searchsorted boundaries
      → return P zero-copy table slices  (``num_returns=P``)
  reduce (one task per partition):
      fetch its P-th slice of every map output (at multi-node this is the
      1/P-per-mapper pull a real shuffle does) → concat (schema-aligned)
      → vectorized LWW fold → atomic delta write → metrics row

No sampling, no sort of unrelated columns, no barrier besides the natural
map→reduce dependency; Ray schedules reduces as their inputs complete.
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.cdc.merge import (
    EVENT_WEIGHT_COL,
    lww_fold_table,
    partial_lww_combiner,
    stable_hash_partition,
)
from datax_ray.schema import align_to_schema, concat_aligned
from datax_ray.sinks.lake import atomic_write_parquet, delta_path


def split_by_partition(t: pa.Table, num_partitions: int) -> list[pa.Table]:
    """Partition a table into P zero-copy slices by stable hash of conv_id:
    one argsort + searchsorted, no per-partition filter passes."""
    part = stable_hash_partition(t["conv_id"], num_partitions)
    order = np.argsort(part, kind="stable")
    sorted_t = t.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(num_partitions + 1))
    return [
        sorted_t.slice(bounds[p], bounds[p + 1] - bounds[p])
        for p in range(num_partitions)
    ]


def validate_events(t: pa.Table, dead_letter_dir: str | None,
                    tag: str | None = None) -> pa.Table:
    """Route malformed change events (unknown op, null key/lsn) to the
    dead-letter side channel — the CDC equivalent of the reference's
    dirty-record collection (TaskPluginCollector).

    ``tag`` makes the dead-letter filename DETERMINISTIC per work unit
    (task inputs + epoch range): a crashed epoch's re-run overwrites the
    identical file instead of stacking a second uuid-named copy, so
    resume never double-counts dirty rows against the error budget."""
    ok = pc.is_in(t["op"], value_set=pa.array(["I", "U", "D"]))
    for col in ("conv_id", "turn_idx", "lsn", "ts"):
        ok = pc.and_(ok, pc.is_valid(t[col]))
    ok_np = np.asarray(pc.fill_null(ok, False))
    if ok_np.all():
        return t
    if dead_letter_dir:
        import uuid

        os.makedirs(dead_letter_dir, exist_ok=True)
        bad = t.filter(pa.array(~ok_np)).append_column(
            "_error", pa.array(["invalid_event"] * int((~ok_np).sum()))
        )
        name = f"dl-{tag or uuid.uuid4().hex}.parquet"
        path = os.path.join(dead_letter_dir, name)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(bad, tmp)
        os.replace(tmp, path)
    return t.filter(pa.array(ok_np))


def _pin_worker_threads():
    """Cap per-task Arrow thread pools so parallelism is governed by Ray's
    CPU accounting, not hidden intra-task threads — otherwise a
    'num_cpus=8' session quietly uses idle cores through pyarrow's IO/
    compute pools and scaling comparisons lie. Set once per worker."""
    global _PINNED
    if not _PINNED:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        _PINNED = True


_PINNED = False


def _map_split_impl(
    paths: list[str],
    lsn_lo: int,
    lsn_hi: int,
    num_partitions: int,
    schema: pa.Schema | None,
    window: tuple | None,
    transform_specs: list | None = None,
    dead_letter_dir: str | None = None,
):
    _pin_worker_threads()
    tables = []
    for path in paths:
        t = pq.read_table(
            path, filters=[("lsn", ">=", lsn_lo), ("lsn", "<", lsn_hi)]
        )
        if window is not None:
            lo, hi = window
            t = t.filter(
                pc.and_(
                    pc.greater_equal(t["ts"], pa.scalar(lo)),
                    pc.less(t["ts"], pa.scalar(hi)),
                )
            )
        if schema is not None and not t.schema.equals(schema):
            t = align_to_schema(t, schema)
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        tables.append(t)
    t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
    if dead_letter_dir:
        import hashlib

        # lsn range goes in the name in the clear: the driver attributes
        # dirty rows to the epochs THIS run executed (resume-safe error
        # budget, see replay.dead_letter_rows_for_ranges) by parsing it
        tag = (
            f"{lsn_lo}-{lsn_hi}-"
            + hashlib.md5("|".join(paths).encode()).hexdigest()
        )
    else:
        tag = None
    t = validate_events(t, dead_letter_dir, tag=tag)
    if transform_specs:
        # transformers run reader-side before the exchange, exactly like the
        # reference chain ahead of the channel (TaskGroupContainer.java:481-485)
        from datax_ray.transforms import TransformChain, build_transform

        chain = TransformChain([build_transform(s) for s in transform_specs])
        t = chain(t)
    t = partial_lww_combiner(t, with_weights=True)
    if num_partitions == 1:
        return t  # num_returns=1: a bare table, not a 1-tuple
    return tuple(split_by_partition(t, num_partitions))


def _reduce_apply_impl(lake_dir: str, epoch: int, part: int, *tables: pa.Table):
    _pin_worker_threads()
    t0 = time.perf_counter()
    tables = [t for t in tables if t is not None and t.num_rows > 0]
    if not tables:
        return None
    merged = concat_aligned(list(tables))
    events = int(pc.sum(merged[EVENT_WEIGHT_COL]).as_py() or 0)
    folded = lww_fold_table(merged, drop_deletes=False)
    folded = folded.drop_columns([EVENT_WEIGHT_COL])
    path = delta_path(lake_dir, part, epoch)
    size = atomic_write_parquet(folded, path)
    max_lsn = pc.max(folded["lsn"]).as_py()
    unit = folded["ts"].type.unit
    scale = {"s": 1000, "ms": 1, "us": 1 / 1000, "ns": 1 / 1_000_000}[unit]
    mts = pc.max(folded["ts"].cast(pa.int64())).as_py()
    return {
        "part": part,
        "file": path,
        "rows": folded.num_rows,
        "events": events,
        "bytes": size,
        "secs": time.perf_counter() - t0,
        "max_lsn": max_lsn if max_lsn is not None else -1,
        "max_ts_ms": int(mts * scale) if mts is not None else 0,
    }


_REMOTES: dict[int, Any] = {}


def _get_remotes(num_partitions: int):
    """ray.remote bindings memoized per partition count (num_returns is
    static per remote function)."""
    import ray

    if num_partitions not in _REMOTES:
        _REMOTES[num_partitions] = (
            ray.remote(num_returns=num_partitions)(_map_split_impl),
            ray.remote(_reduce_apply_impl),
        )
    return _REMOTES[num_partitions]


def file_lsn_ranges(files: list[str]) -> dict[str, tuple[int, int] | None]:
    """(min, max) lsn per file from parquet footer stats — computed ONCE per
    replay and reused by every epoch (at 10^10 scale re-reading them per
    epoch would dominate). Footers are fetched by a thread pool:
    ``pq.read_metadata`` is IO-bound and releases the GIL, and a serial
    scan over thousands of changelog files is exactly the kind of fixed
    driver-side term that caps scaling efficiency on short replays."""

    def one(f: str) -> tuple[int, int] | None:
        md = pq.read_metadata(f)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(_lsn_index(md))
            st = col.statistics
            if st is None:
                return None
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        return None if fmin is None else (fmin, fmax)

    if len(files) <= 4:
        return {f: one(f) for f in files}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(16, len(files))) as ex:
        return dict(zip(files, ex.map(one, files)))


def files_overlapping(
    files: list[str], lsn_lo: int, lsn_hi: int,
    ranges: dict[str, tuple[int, int] | None] | None = None,
) -> list[str]:
    """Prune whole files via (cached) footer min/max stats on lsn."""
    ranges = ranges if ranges is not None else file_lsn_ranges(files)
    keep = []
    for f in files:
        r = ranges.get(f)
        if r is None or (r[0] < lsn_hi and r[1] >= lsn_lo):
            keep.append(f)
    return keep


def _lsn_index(md) -> int:
    for i in range(md.num_columns):
        if md.row_group(0).column(i).path_in_schema == "lsn":
            return i
    raise KeyError("no lsn column in changelog file")


def exchange_epoch(
    files: list[str],
    *,
    lake_dir: str,
    epoch: int,
    lsn_lo: int,
    lsn_hi: int,
    num_partitions: int,
    schema: pa.Schema | None = None,
    window: tuple | None = None,
    max_map_tasks: int = 64,
    lsn_ranges: dict | None = None,
    sync: bool = True,
    transform_specs: list | None = None,
    dead_letter_dir: str | None = None,
):
    """Run one epoch's map→reduce exchange; returns per-partition metrics
    rows (same shape the manifest commit expects).

    Files are grouped into at most ``max_map_tasks`` map tasks — a FIXED
    task topology independent of cluster size, so shuffle-object count
    (map_tasks × P) stays bounded and two cluster sizes run identical
    plans (the scaling-efficiency comparison stays apples-to-apples)."""
    import ray

    map_split, reduce_apply = _get_remotes(num_partitions)
    use = files_overlapping(files, lsn_lo, lsn_hi, ranges=lsn_ranges)
    if not use:
        return []
    gsize = max(1, -(-len(use) // max_map_tasks))
    groups = [use[i : i + gsize] for i in range(0, len(use), gsize)]
    maps = [
        map_split.remote(g, lsn_lo, lsn_hi, num_partitions, schema, window,
                         transform_specs, dead_letter_dir)
        for g in groups
    ]
    if num_partitions == 1:
        maps = [[m] for m in maps]
    reduces = [
        reduce_apply.remote(lake_dir, epoch, p, *[m[p] for m in maps])
        for p in range(num_partitions)
    ]
    if not sync:
        return reduces  # caller ray.get()s in commit order (pipelined epochs)
    return [r for r in ray.get(reduces) if r is not None]
