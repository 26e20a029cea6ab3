"""Distributed prefix sum (scan) + sequence packing.

Ray Data has no running-total primitive; this is the classic two-phase
scan, expressed Dataset-first:

1. range-bucket rows by the order key (``key // bucket`` — contiguous key
   ranges stay together, so within-partition order is recoverable by a
   local sort);
2. phase 1: per-batch PARTIAL sums per bucket (a combiner — only
   (bucket, partial_sum) rows move), folded into per-bucket totals whose
   exclusive cumsum = each bucket's global starting offset (driver-side:
   n_buckets values, tiny by construction);
3. phase 2: one ``map_groups`` per bucket — local sort + local cumsum +
   broadcast bucket offset = the EXACT global running total, no
   sequential pass over the dataset anywhere.

Partitioning assumption (stated): the order key is roughly uniform over
its range so ``bucket_size`` splits the scan into ~even buckets; at 100 TB
pick buckets ≈ a few million keys so the driver's offset table stays tiny
while each bucket still fits a task.

``assign_pack_bins`` builds greedy sequence packing on top: bin =
``running_total_before_doc // budget`` — the concatenate-then-split
packing LLM training prep uses (a doc may straddle two bins' boundary;
the bin a doc STARTS in is its bin). Deterministic, order-defined,
SQL-oracle-able (a window cumsum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _bucket_totals(ds, *, key_col: str, value_col: str,
                   bucket_size: int) -> dict[int, int]:
    """Phase 1: per-bucket value totals via per-batch combiners; returns
    {bucket: exclusive_global_offset} (driver holds n_buckets ints)."""

    def partials(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col]).astype(np.int64) // bucket_size
        v = np.asarray(t[value_col]).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        sums = np.add.reduceat(v, starts) if len(v) else np.zeros(0, np.int64)
        return pa.table({"bucket": pa.array(k[starts]),
                         "partial": pa.array(sums)})

    parts = ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    totals = parts.groupby("bucket")["partial"].sum().sort_index()
    offsets = totals.cumsum().shift(fill_value=0)
    return {int(b): int(o) for b, o in offsets.items()}


def prefix_sum(ds, *, key_col: str, value_col: str,
               out_col: str = "running_total", bucket_size: int = 1024,
               exclusive: bool = True):
    """Global running total of ``value_col`` in ``key_col`` order (keys
    must be unique integers — e.g. doc_id): two-phase distributed scan,
    one shuffle, no sequential stage. ``exclusive`` (default) = sum of
    all STRICTLY-earlier rows (the offset where this row starts);
    inclusive otherwise."""
    import ray

    offsets = _bucket_totals(ds, key_col=key_col, value_col=value_col,
                             bucket_size=bucket_size)
    ref = ray.put(offsets)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t[key_col]).astype(np.int64) // bucket_size
        # _bucket stays int64: an int32 cast would wrap keys >= 2^31 *
        # bucket_size into buckets the int64-keyed offsets dict never saw
        # (off.get -> 0), silently corrupting running totals at scale.
        return t.append_column("_bucket", pa.array(b))

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["_bucket"]).append_column(
                out_col, pa.array([], pa.int64()))
        off = ray.get(ref)
        g = g.sort_by([(key_col, "ascending")])
        v = np.asarray(g[value_col]).astype(np.int64)
        csum = np.cumsum(v)
        run = (csum - v) if exclusive else csum
        b = int(g["_bucket"][0].as_py())
        run += off.get(b, 0)
        return g.drop_columns(["_bucket"]).append_column(
            out_col, pa.array(run))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_bucket").map_groups(scan, batch_format="pyarrow"))


def assign_pack_bins(ds, *, key_col: str, value_col: str, budget: int,
                     bucket_size: int = 1024):
    """Greedy concatenate-then-split sequence packing: documents in
    ``key_col`` order are packed into bins of ``budget`` tokens; a doc's
    bin is where its running offset starts (``offset // budget``) and
    ``bin_offset`` is its position inside the bin. One distributed scan +
    one vectorized map — no sequential pass."""
    scanned = prefix_sum(ds, key_col=key_col, value_col=value_col,
                         out_col="_offset", bucket_size=bucket_size,
                         exclusive=True)

    def bins(t: pa.Table) -> pa.Table:
        off = np.asarray(t["_offset"]).astype(np.int64)
        return (t.append_column("bin_id", pa.array(off // budget))
                 .append_column("bin_offset", pa.array(off % budget))
                 .drop_columns(["_offset"]))

    return scanned.map_batches(bins, batch_format="pyarrow",
                               zero_copy_batch=True)


def take_within_budget(ds, *, key_col: str, value_col: str, budget: int,
                       out_col: str = "running_total",
                       bucket_size: int = 1024):
    """Budget-bounded head: keep the prefix of rows (in ``key_col``
    order) whose INCLUSIVE running total of ``value_col`` stays within
    ``budget`` — "fill a 1B-token training budget from the front of the
    corpus". One distributed scan + a stateless filter; rows keep their
    running total so downstream can see exactly where the budget landed."""
    import pyarrow.compute as pc

    scanned = prefix_sum(ds, key_col=key_col, value_col=value_col,
                         out_col=out_col, bucket_size=bucket_size,
                         exclusive=False)

    def head(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t[out_col], budget))

    return scanned.map_batches(head, batch_format="pyarrow",
                               zero_copy_batch=True)


_NEG_INF = np.int64(np.iinfo(np.int64).min)


def prefix_max(ds, *, key_col: str, value_col: str,
               out_col: str = "running_max", bucket_size: int = 1024,
               exclusive: bool = True):
    """Global running MAX of ``value_col`` in ``key_col`` order — the
    same two-phase scan as ``prefix_sum`` with (max, -inf) instead of
    (+, 0). ``exclusive`` rows with no earlier row carry int64-min (the
    identity); callers must treat it as "no watermark yet"."""
    import ray

    def partials(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col]).astype(np.int64) // bucket_size
        v = np.asarray(t[value_col]).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        maxs = (np.maximum.reduceat(v, starts) if len(v)
                else np.zeros(0, np.int64))
        return pa.table({"bucket": pa.array(k[starts]),
                         "partial": pa.array(maxs)})

    parts = ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    totals = parts.groupby("bucket")["partial"].max().sort_index()
    offsets = totals.cummax().shift(fill_value=_NEG_INF)
    off_map = {int(b): np.int64(o) for b, o in offsets.items()}
    ref = ray.put(off_map)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t[key_col]).astype(np.int64) // bucket_size
        # _bucket stays int64: an int32 cast would wrap keys >= 2^31 *
        # bucket_size into buckets the int64-keyed offsets dict never saw
        # (off.get -> 0), silently corrupting running totals at scale.
        return t.append_column("_bucket", pa.array(b))

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["_bucket"]).append_column(
                out_col, pa.array([], pa.int64()))
        off = ray.get(ref)
        g = g.sort_by([(key_col, "ascending")])
        v = np.asarray(g[value_col]).astype(np.int64)
        cmax = np.maximum.accumulate(v)
        if exclusive:
            run = np.empty_like(cmax)
            run[0] = _NEG_INF
            run[1:] = cmax[:-1]
        else:
            run = cmax
        b = int(g["_bucket"][0].as_py())
        run = np.maximum(run, off.get(b, _NEG_INF))
        return g.drop_columns(["_bucket"]).append_column(
            out_col, pa.array(run))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_bucket").map_groups(scan, batch_format="pyarrow"))


def route_late_events(ds, *, ts_col: str = "ts", order_col: str = "lsn",
                      allowed_lateness_ms: int, out_col: str = "is_late",
                      bucket_size: int = 1024):
    """Streaming-style watermark routing in batch form: an event is LATE
    iff its event time falls more than ``allowed_lateness_ms`` behind the
    watermark at its ARRIVAL — the running max event time over all
    strictly-earlier arrivals (``order_col`` = arrival order, e.g. lsn).
    The running max is the distributed ``prefix_max`` scan, so nothing is
    sequential; the first arrival is never late. Downstream splits on
    ``is_late`` to feed the on-time window aggregate and the late-side
    correction path (the Flink allowed-lateness contract, expressed as
    two Dataset filters)."""
    def to_int(t: pa.Table) -> pa.Table:
        # normalize to µs INSIDE the batch (timestamp-unit cast rescales):
        # probing ds.schema() on the driver would trigger a whole extra
        # execution of the upstream pipeline just to learn the unit
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return t.append_column("_ts_i", us)

    delay = np.int64(allowed_lateness_ms) * 1000  # µs

    scanned = prefix_max(
        ds.map_batches(to_int, batch_format="pyarrow", zero_copy_batch=True),
        key_col=order_col, value_col="_ts_i", out_col="_wm_raw",
        bucket_size=bucket_size)

    def flag(t: pa.Table) -> pa.Table:
        wm = np.asarray(t["_wm_raw"])
        ts = np.asarray(t["_ts_i"])
        late = (wm != _NEG_INF) & (ts < wm - delay)
        return (t.drop_columns(["_ts_i", "_wm_raw"])
                 .append_column(out_col, pa.array(late)))

    return scanned.map_batches(flag, batch_format="pyarrow",
                               zero_copy_batch=True)
