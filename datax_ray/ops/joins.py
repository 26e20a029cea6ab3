"""Joins and lookups — the patterns DataX itself never had (its topology is
strictly 1 reader : 1 writer) but any real pipeline needs.

- ``broadcast_join``  — small side (dimension table) is ``ray.put`` ONCE on
  the driver as an Arrow table and joined per batch with the zero-copy
  ``pa.Table.join`` hash join inside ``map_batches``: no shuffle, no
  pandas round-trip; the canonical dimension-lookup at 100 TB.
- ``semi_filter`` / ``anti_filter`` — broadcast the key set and mask inside
  ``map_batches``.
- ``asof_join`` — backward as-of join (each left row matched with the
  LATEST right row of the same key with ``right.on <= left.on``): both
  sides hash-partitioned by key via a tagged union, then ONE vectorized
  kernel pass per partition (sort + grouped maximum-accumulate forward
  fill — no per-key Python loop). ``asof_join_broadcast`` is the
  small-right-side variant (sorted right table ships once via ``ray.put``,
  each batch binary-searches it).
- ``interval_join_broadcast`` / ``interval_join_bucketed`` — range join:
  each row joined to EVERY interval with ``lo <= ts < hi`` (intervals may
  overlap; output one row per match). Broadcast = intervals ship once,
  per-batch sort + one searchsorted pair per interval + flat gather.
  Bucketed = the large-interval-set scale path: intervals replicated to
  each time bucket they overlap, rows bucketed by ``ts // bucket``, same
  kernel per partition with clamped bounds — partitioning assumption:
  time buckets spread ~evenly mod P, and each interval overlaps a bounded
  number of buckets (pick ``bucket_us`` ≳ the typical interval length).
- ``hash_join`` — the generic large-large equi-join: both sides tagged
  and hash-partitioned by key in ONE exchange (the tagged-union pattern —
  measurably faster than respawning ``Dataset.join``'s aggregator pools,
  and it reuses the engine's one partitioning function), then a zero-copy
  ``pa.Table.join`` per partition. inner/left/right/full/semi/anti.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def broadcast_join(ds, small: "pd.DataFrame | pa.Table", *,
                   on: str | list[str], how: str = "inner",
                   suffix: str = "_r"):
    import ray

    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    ref = ray.put(small.combine_chunks())
    keys = [on] if isinstance(on, str) else list(on)
    join_type = _JOIN_TYPES.get(how, how)

    def merge(batch: pa.Table) -> pa.Table:
        rhs = ray.get(ref)  # zero-copy read from the local object store
        return batch.join(rhs, keys=keys, join_type=join_type,
                          right_suffix=suffix)

    return ds.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


def semi_filter(ds, keys, *, on: str):
    """Keep rows whose ``on`` value is in ``keys`` (broadcast key set,
    converted to an Arrow value_set ONCE — not per batch; unsorted so
    None/mixed-type key sets stay legal)."""
    import ray

    ref = ray.put(pa.array(list(set(keys))))

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch[on], value_set=ray.get(ref)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _ts_int64(arr: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Timestamp/date/int column → int64 numpy (kernel time axis)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_timestamp(a.type) or pa.types.is_date(a.type):
        a = a.cast(pa.int64())
    return np.asarray(a, dtype=np.int64)


def asof_join(left, right, *, by: str, on: str,
              right_cols: list[str], suffix: str = "_r", how: str = "left",
              tolerance: int | None = None, num_partitions: int = 64):
    """Backward as-of join: for each left row, the latest right row with the
    same ``by`` key and ``right.on <= left.on`` (inclusive — a right row at
    the exact same time matches, DuckDB ``ASOF JOIN ... ON l.on >= r.on``
    semantics).

    Scale shape: tag both sides, union, hash-partition by ``by`` (one
    shuffle moves key+time+payload, nothing else), then one vectorized
    kernel per partition: sort by (key, time, side) with right rows before
    left rows at equal time, then a grouped forward-fill of the last-seen
    right row via ``np.maximum.accumulate`` over group-offset codes — no
    per-key Python loop, O(n log n) per partition.

    ``right_cols`` are emitted with ``suffix``; the matched right ``on``
    value is emitted as ``{on}{suffix}``. ``how`` is 'left' (unmatched left
    rows kept with nulls) or 'inner'. ``tolerance`` (int, units of the
    ``on`` column's int64 representation, e.g. microseconds for
    timestamp[us]) drops matches older than ``left.on - tolerance``.
    """
    from datax_ray.cdc.merge import stable_hash_partition

    if how not in ("left", "inner"):
        raise ValueError(f"asof_join how must be left|inner, got {how!r}")
    left_types = dict(zip(left.schema().names, left.schema().types))
    right_types = dict(zip(right.schema().names, right.schema().types))
    left_names = list(left_types)
    out_right = [(c, f"{c}{suffix}") for c in [on] + list(right_cols)]
    inv = {o: c for c, o in out_right}  # {out_name: right_col}
    union_fields = (
        [(n, left_types[n]) for n in left_names]
        + [(o, right_types[c]) for c, o in out_right]
        + [("_side", pa.int8()), ("_part", pa.int32())]
    )
    union_schema = pa.schema(union_fields)

    def _aligned(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        part = stable_hash_partition(t[by], num_partitions)
        cols = []
        for name, typ in union_fields[:-2]:
            if side == 1:  # left row: right payload stays null
                cols.append(t[name].combine_chunks()
                            if name in t.column_names
                            else pa.nulls(n, type=typ))
            elif name in (by, on):  # right row: key/time for the kernel
                cols.append(t[name].combine_chunks())
            elif name in inv:       # right payload under its out name
                cols.append(t[inv[name]].combine_chunks())
            else:                   # left payload stays null
                cols.append(pa.nulls(n, type=typ))
        cols.append(pa.array(np.full(n, side, dtype=np.int8)))
        cols.append(pa.array(part, type=pa.int32()))
        return pa.Table.from_arrays(cols, schema=union_schema)

    def tag_left(t: pa.Table) -> pa.Table:
        return _aligned(t, 1)

    def tag_right(t: pa.Table) -> pa.Table:
        return _aligned(t, 0)

    out_names = left_names + [o for _, o in out_right]
    out_schema = pa.schema([(n, union_schema.field(n).type)
                            for n in out_names])

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.sort_by([(by, "ascending"), (on, "ascending"),
                       ("_side", "ascending")])
        key = np.asarray(g[by].combine_chunks())
        ts = _ts_int64(g[on])
        side = np.asarray(g["_side"].combine_chunks())
        n = len(side)
        rmask = side == 0
        r_total = int(rmask.sum())
        # dense group ids along the sorted order
        gid = np.zeros(n, dtype=np.int64)
        gid[1:] = np.cumsum(key[1:] != key[:-1])
        base = gid * (r_total + 1)
        rr = np.cumsum(rmask) - 1          # index among right rows
        val = np.where(rmask, base + rr + 1, base)
        acc = np.maximum.accumulate(val)
        lpos = np.flatnonzero(~rmask)
        code = acc[lpos] - base[lpos]
        matched = code > 0
        rpos_all = np.flatnonzero(rmask)
        # right sorted-row position per left row (clip keeps takes legal)
        rpos = rpos_all[np.clip(code - 1, 0, None)] if r_total else \
            np.zeros(len(lpos), dtype=np.int64)
        if tolerance is not None:
            matched &= (ts[lpos] - ts[rpos]) <= tolerance
        if how == "inner":
            lpos, rpos = lpos[matched], rpos[matched]
            matched = np.ones(len(lpos), dtype=bool)
        lidx = pa.array(lpos)
        ridx = pa.array(rpos, mask=~matched)
        cols = [g[nm].take(lidx) for nm in left_names]
        cols += [g[o].take(ridx) for _, o in out_right]
        return pa.Table.from_arrays(cols, schema=out_schema)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    return tagged.groupby("_part").map_groups(kernel, batch_format="pyarrow")


def hash_join(left, right, *, on: "str | list[str]",
              how: str = "inner", suffix: str = "_r",
              num_partitions: int = 64):
    """Large-large equi-join: neither side needs to fit anywhere. Both
    sides are tagged and hash-partitioned by the join key in ONE exchange
    (tagged union — same partitioning function as every other shuffle in
    the engine), then each partition runs one zero-copy ``pa.Table.join``
    hash join. ``how`` ∈ inner/left/right/outer/semi/anti (reference
    writeMode-style names mapped to Arrow join types).

    Join keys must share names on both sides (TPC-H-style distinct
    payload names); right payload columns colliding with left names are
    emitted with ``suffix``. Skewed keys follow the engine's standard
    story: pre-aggregate or salt upstream — a single hot key lands in one
    partition here, exactly like the LWW merge."""
    keys = [on] if isinstance(on, str) else list(on)
    join_type = _JOIN_TYPES.get(how, how)
    lt = dict(zip(left.schema().names, left.schema().types))
    rt = dict(zip(right.schema().names, right.schema().types))
    for k in keys:
        if k not in lt or k not in rt:
            raise ValueError(f"join key {k!r} missing from a side")
    left_names = list(lt)
    # right payload columns colliding with a left name are pre-renamed with
    # ``suffix`` in the union schema (the per-partition join then never
    # collides); {union_name: right_name}
    r_out = {(c if c not in lt else f"{c}{suffix}"): c
             for c in rt if c not in keys}
    right_payload = list(r_out)
    union_fields = (
        [(n, lt[n]) for n in left_names]
        + [(o, rt[c]) for o, c in r_out.items()]
        + [("_side", pa.int8()), ("_part", pa.int32())]
    )
    union_schema = pa.schema(union_fields)

    def _part_of(t: pa.Table) -> np.ndarray:
        from datax_ray.cdc.merge import stable_hash

        h = stable_hash(t[keys[0]])
        for k in keys[1:]:  # mix multi-key hashes (commutative-safe fold)
            with np.errstate(over="ignore"):
                h = h * np.uint64(0x100000001B3) ^ stable_hash(t[k])
        return (h % np.uint64(num_partitions)).astype(np.int32)

    def _tag(side: int):
        # union name -> source column name in this side's batches
        src = {n: n for n in left_names} if side == 1 else \
            {**{k: k for k in keys}, **r_out}
        own = set(src) if side == 1 else set(keys) | set(right_payload)

        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for name, typ in union_fields[:-2]:
                cols.append(t[src[name]].combine_chunks()
                            if name in own else pa.nulls(n, type=typ))
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            cols.append(pa.array(_part_of(t), type=pa.int32()))
            return pa.Table.from_arrays(cols, schema=union_schema)
        return f

    def kernel(g: pa.Table) -> pa.Table:
        side = g["_side"]
        l_tbl = g.filter(pc.equal(side, 1)).select(left_names)
        r_tbl = g.filter(pc.equal(side, 0)).select(keys + right_payload)
        return l_tbl.join(r_tbl, keys=keys, join_type=join_type,
                          right_suffix=suffix)

    tagged = left.map_batches(_tag(1), batch_format="pyarrow").union(
        right.map_batches(_tag(0), batch_format="pyarrow"))
    return tagged.groupby("_part").map_groups(kernel, batch_format="pyarrow")


def asof_join_broadcast(ds, right: "pa.Table | pd.DataFrame", *,
                        by: str, on: str, right_cols: list[str],
                        suffix: str = "_r", how: str = "left",
                        tolerance: int | None = None):
    """As-of join against a SMALL right side: the right table is sorted by
    (by, on) once on the driver and shipped once via ``ray.put``; each
    batch finds its match with one structured-array ``np.searchsorted``
    (no shuffle at all). Semantics identical to :func:`asof_join`
    (backward, inclusive). ``by`` must be integer-typed and ``on``
    integer/timestamp (the composite binary-search key)."""
    import ray

    if isinstance(right, pd.DataFrame):
        right = pa.Table.from_pandas(right, preserve_index=False)
    right = right.sort_by([(by, "ascending"), (on, "ascending")])
    ref = ray.put(right.combine_chunks())
    cache: dict = {}

    def lookup(batch: pa.Table) -> pa.Table:
        if "r" not in cache:
            rt = ray.get(ref)
            comp = np.empty(rt.num_rows,
                            dtype=[("k", np.int64), ("t", np.int64)])
            comp["k"] = np.asarray(rt[by], dtype=np.int64)
            comp["t"] = _ts_int64(rt[on])
            cache["r"] = (rt, comp)
        rt, comp = cache["r"]
        n = batch.num_rows
        lcomp = np.empty(n, dtype=comp.dtype)
        lcomp["k"] = np.asarray(batch[by].combine_chunks(), dtype=np.int64)
        lcomp["t"] = _ts_int64(batch[on])
        idx = np.searchsorted(comp, lcomp, side="right") - 1
        matched = idx >= 0
        safe = np.clip(idx, 0, None)
        matched &= comp["k"][safe] == lcomp["k"]
        if tolerance is not None:
            matched &= (lcomp["t"] - comp["t"][safe]) <= tolerance
        ridx = pa.array(safe, mask=~matched)
        cols = list(batch.columns)
        names = list(batch.column_names)
        for c in [on] + list(right_cols):
            cols.append(rt[c].take(ridx))
            names.append(f"{c}{suffix}")
        out = pa.table(dict(zip(names, cols)))
        if how == "inner":
            out = out.filter(pa.array(matched))
        return out

    return ds.map_batches(lookup, batch_format="pyarrow",
                          zero_copy_batch=True)


def _interval_gather(batch: pa.Table, ts: np.ndarray, lo: np.ndarray,
                     hi: np.ndarray, iv_tbl: pa.Table,
                     iv_rows: np.ndarray) -> pa.Table:
    """Shared range-join kernel: sort batch rows by ts, one searchsorted
    pair per interval, flat gather of (row, interval) matches."""
    order = np.argsort(ts, kind="stable")
    tss = ts[order]
    a = np.searchsorted(tss, lo, side="left")
    b = np.searchsorted(tss, hi, side="left")   # lo <= ts < hi
    counts = b - a
    total = int(counts.sum())
    if total == 0:
        return pa.schema(
            list(zip(batch.schema.names, batch.schema.types))
            + list(zip(iv_tbl.schema.names, iv_tbl.schema.types))
        ).empty_table()
    ends = np.cumsum(counts)
    flat = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
    row_sel = order[flat + np.repeat(a, counts)]
    iv_sel = np.repeat(iv_rows, counts)
    out = batch.take(pa.array(row_sel))
    for name in iv_tbl.column_names:
        out = out.append_column(name, iv_tbl[name].take(pa.array(iv_sel)))
    return out


def interval_join_broadcast(ds, intervals: "pa.Table | pd.DataFrame", *,
                            ts_col: str, lo_col: str = "lo",
                            hi_col: str = "hi"):
    """Range join against a small interval table: every input row joined to
    EVERY interval with ``lo <= ts < hi`` (overlapping intervals → one
    output row per match). Intervals ship once via ``ray.put``; per batch:
    one sort + one searchsorted pair per interval + one flat gather —
    O(I·log n + matches), no per-row loop, no shuffle."""
    import ray

    if isinstance(intervals, pd.DataFrame):
        intervals = pa.Table.from_pandas(intervals, preserve_index=False)
    ref = ray.put(intervals.combine_chunks())
    cache: dict = {}

    def join(batch: pa.Table) -> pa.Table:
        if "iv" not in cache:
            iv = ray.get(ref)
            cache["iv"] = (iv, _ts_int64(iv[lo_col]), _ts_int64(iv[hi_col]))
        iv, lo, hi = cache["iv"]
        ts = _ts_int64(batch[ts_col])
        return _interval_gather(batch, ts, lo, hi, iv,
                                np.arange(iv.num_rows, dtype=np.int64))

    return ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)


def interval_join_bucketed(ds, intervals: "pa.Table | pd.DataFrame", *,
                           ts_col: str, lo_col: str = "lo",
                           hi_col: str = "hi", bucket: int,
                           num_partitions: int = 64):
    """Range-join scale path for interval sets too big to broadcast: time
    is bucketed (``bucket`` in the ts column's int64 units, e.g. µs);
    each interval is replicated to every bucket it overlaps (driver-side
    vectorized repeat — pick ``bucket`` ≳ typical interval length so the
    replication factor stays ~2), rows route to ``bucket_id % P``, and the
    per-partition kernel is the same searchsorted gather with the interval
    bounds CLAMPED to the replica's bucket span (each match is produced by
    exactly one replica, so the result is exact and duplicate-free even
    for intervals spanning many buckets)."""
    if isinstance(intervals, pd.DataFrame):
        intervals = pa.Table.from_pandas(intervals, preserve_index=False)
    intervals = intervals.combine_chunks()
    lo = _ts_int64(intervals[lo_col])
    hi = _ts_int64(intervals[hi_col])
    first = lo // bucket
    # hi is exclusive: an interval touching bucket boundary exactly does
    # not overlap the next bucket
    last = np.maximum(first, (hi - 1) // bucket)
    reps = (last - first + 1).astype(np.int64)
    iv_rows = np.repeat(np.arange(len(lo), dtype=np.int64), reps)
    ends = np.cumsum(reps)
    off = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(
        ends - reps, reps)
    bucket_ids = first[iv_rows] + off
    clamp_lo = np.maximum(lo[iv_rows], bucket_ids * bucket)
    clamp_hi = np.minimum(hi[iv_rows], (bucket_ids + 1) * bucket)
    parts = (bucket_ids % num_partitions).astype(np.int32)
    by_part: dict[int, tuple] = {}
    for p in np.unique(parts):
        m = parts == p
        by_part[int(p)] = (iv_rows[m], clamp_lo[m], clamp_hi[m])

    import ray
    ref = ray.put((intervals, by_part))
    cache: dict = {}

    def add_part(t: pa.Table) -> pa.Table:
        ts = _ts_int64(t[ts_col])
        part = ((ts // bucket) % num_partitions).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def kernel(g: pa.Table) -> pa.Table:
        if "iv" not in cache:
            cache["iv"] = ray.get(ref)
        iv, parts_map = cache["iv"]
        empty = pa.schema(
            [(n, t) for n, t in zip(g.schema.names, g.schema.types)
             if n != "_part"]
            + list(zip(iv.schema.names, iv.schema.types))
        ).empty_table()
        if g.num_rows == 0:
            return empty
        p = int(g["_part"][0].as_py())
        if p not in parts_map:
            return empty
        iv_rows, clo, chi = parts_map[p]
        g = g.drop_columns(["_part"])
        return _interval_gather(g, _ts_int64(g[ts_col]), clo, chi, iv,
                                iv_rows)

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_part").map_groups(kernel, batch_format="pyarrow"))


def anti_filter(ds, keys, *, on: str):
    import ray

    ref = ray.put(pa.array(list(set(keys))))

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.invert(pc.is_in(batch[on], value_set=ray.get(ref)))
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
