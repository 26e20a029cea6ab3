"""Streaming-shaped operators over the ``events`` table: tumbling-window
aggregation and gap-based sessionization.

Ray Data has no event-time windows; per the engine's design (SURVEY.md
§2.5) windows are expressed as: derive the window key vectorized →
``groupby`` aggregate (tumbling), or ``groupby(key).map_groups`` over the
per-key ts-sorted group (sessions). Ordering assumption: all events of one
key fit one group (Ray's groupby guarantees key co-location)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_tumbling_window(batch: pa.Table, *, ts_col: str = "ts",
                        every_ms: int = 3_600_000, out: str = "window") -> pa.Table:
    """window = floor(ts / every) as a timestamp — matches SQL
    date_trunc for hour/minute/day when ``every`` divides them."""
    unit = batch[ts_col].type.unit
    per_ms = {"s": 1 / 1000, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
    raw = batch[ts_col].cast(pa.int64())
    every = int(every_ms * per_ms)
    win = pc.multiply(pc.divide(raw, every), every)  # int division floors
    return batch.append_column(out, win.cast(batch[ts_col].type))


def _combine_counts_sums(t: pa.Table, keys: list[str],
                         value_col: str | None) -> pa.Table:
    """Per-batch combiner: collapse a batch to one (count, sum) row per
    key tuple BEFORE the exchange — the shuffle then moves
    O(keys × windows-per-batch) rows instead of every event. Rename by
    NAME (TableGroupBy's output order varies across pyarrow versions)."""
    aggs = [([], "count_all")]
    if value_col:
        aggs.append((value_col, "sum"))
    g = t.select(keys + ([value_col] if value_col else [])) \
         .group_by(keys).aggregate(aggs)
    ren = {"count_all": "_n", f"{value_col}_sum": "_vs"}
    return g.rename_columns([ren.get(c, c) for c in g.column_names])


def tumbling_agg(ds, *, key_col: str = "event_type", ts_col: str = "ts",
                 every_ms: int = 3_600_000, value_col: str = "value",
                 digits: int = 4):
    """count + sum(value) per (key, window): per-batch combiner first
    (each batch shrinks to its distinct (key, window) rows), then ONE
    groupby over combiner output — the exchange moves partial aggregates,
    never events."""
    from ray.data.aggregate import Sum

    ds = ds.map_batches(
        lambda t: _combine_counts_sums(
            add_tumbling_window(t, ts_col=ts_col, every_ms=every_ms),
            [key_col, "window"], value_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ds.groupby([key_col, "window"]).aggregate(
        Sum("_n", alias_name="n"), Sum("_vs", alias_name="sum_value")
    )

    def post(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("sum_value"),
            "sum_value",
            pc.round(t["sum_value"], ndigits=digits),
        )
        # emit window as timestamp[us] — the unit SQL date_trunc produces —
        # so oracle comparisons are representation-exact
        return t.set_column(
            t.schema.get_field_index("window"),
            "window",
            t["window"].cast(pa.timestamp("us")),
        )

    return out.map_batches(post, batch_format="pyarrow")


def sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               gap_ms: int = 1_800_000, num_partitions: int = 64):
    """Gap-based sessions per key: events sorted by ts; a gap > gap_ms
    starts a new session. Output one row per session:
    (key, session_start, session_end, n_events).

    Scale shape: hash-partition by key (all rows of one key co-located),
    then ONE vectorized kernel pass per partition — sort by (key, ts),
    boundary mask where the key changes or the gap exceeds gap_ms, sessions
    = the segments between boundaries. P partition calls total, not one
    Python call per key (millions of keys would drown in per-group
    overhead)."""
    from datax_ray.cdc.merge import stable_hash_partition

    def add_part(t: pa.Table) -> pa.Table:
        part = stable_hash_partition(t[key_col], num_partitions)
        return t.append_column("part", pa.array(part, type=pa.int32()))

    def sessions_partition(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                (key_col, g.schema.field(key_col).type),
                ("session_start", g.schema.field(ts_col).type),
                ("session_end", g.schema.field(ts_col).type),
                ("n_events", pa.int64()),
            ]
        )
        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        g = g.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        key = np.asarray(g[key_col])
        raw = np.asarray(g[ts_col].combine_chunks().cast(pa.int64()))
        per_ms = {"s": 0.001, "ms": 1, "us": 1000, "ns": 1_000_000}[
            g[ts_col].type.unit
        ]
        gap_units = gap_ms * per_ms
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (key[1:] != key[:-1]) | ((raw[1:] - raw[:-1]) > gap_units)
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]]) - 1
        idx_s = pa.array(starts)
        ts_arr = g[ts_col].combine_chunks()
        return pa.table(
            {
                key_col: g[key_col].take(idx_s),
                "session_start": ts_arr.take(idx_s),
                "session_end": ts_arr.take(pa.array(ends)),
                "n_events": pa.array(
                    np.diff(np.concatenate([starts, [n]])).astype(np.int64)
                ),
            },
            schema=out_schema,
        )

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("part").map_groups(sessions_partition, batch_format="pyarrow")


def sliding_agg(ds, *, key_col: str = "event_type", ts_col: str = "ts",
                size_ms: int = 7_200_000, step_ms: int = 3_600_000,
                value_col: str | None = None):
    """Sliding (hopping) window aggregate: each event lands in
    ``size/step`` windows — replicated vectorized with shifted window
    starts (valid by construction when step divides size), then ONE
    groupby. Window key is int64 epoch-us of the window start (kept
    integral so SQL oracles compare exactly)."""
    from ray.data.aggregate import Sum

    k = size_ms // step_ms
    assert k * step_ms == size_ms, "step must divide size"

    def explode(t: pa.Table) -> pa.Table:
        unit = t[ts_col].type.unit
        to_us = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1 / 1000}[unit]
        raw = np.asarray(t[ts_col].cast(pa.int64())) * to_us
        step_us = int(step_ms * 1000)
        aligned = (raw // step_us) * step_us
        parts = []
        for i in range(k):
            w = aligned - i * step_us
            parts.append(
                t.append_column("window_us", pa.array(w.astype(np.int64)))
            )
        # combine BEFORE the exchange: the k-way replication never leaves
        # the batch — the shuffle carries (key, window, n, sum) partials
        return _combine_counts_sums(pa.concat_tables(parts),
                                    [key_col, "window_us"], value_col)

    ds = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum("_n", alias_name="n")]
    if value_col:
        aggs.append(Sum("_vs", alias_name="sum_value"))
    return ds.groupby([key_col, "window_us"]).aggregate(*aggs)
