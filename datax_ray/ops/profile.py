"""One-pass column profiler — data-quality statistics without a shuffle.

Ingest pipelines gate on source health before replaying into the lake
(the reference's preCheck phase, Engine.java:122-172, validates
connectivity/permissions; its dirty-record machinery assumes per-column
sanity). This operator produces the per-column profile those gates need —
row/null counts, lexicographic/numeric min-max, total string length —
as per-batch partial rows folded on the driver: #blocks × #columns tiny
rows move, the data never does.

All statistics are exactly SQL-expressible (count / sum CASE / min / max
/ sum(length)), so the profile is DuckDB-oracle-able bit-for-bit; values
are rendered as strings (ints via str(), matching CAST(x AS VARCHAR)) so
one schema covers heterogeneous columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _partial_rows(t: pa.Table, columns: list[str]) -> pa.Table:
    cols, n_rows, n_nulls, mins, maxs, len_sums = [], [], [], [], [], []
    for c in columns:
        arr = t[c]
        cols.append(c)
        n_rows.append(t.num_rows)
        n_nulls.append(arr.null_count)
        if t.num_rows == arr.null_count:
            mins.append(None)
            maxs.append(None)
        else:
            mm = pc.min_max(arr)
            mins.append(_as_str(mm["min"]))
            maxs.append(_as_str(mm["max"]))
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            len_sums.append(pc.sum(pc.utf8_length(arr)).as_py() or 0)
        else:
            len_sums.append(None)
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "n_rows": pa.array(n_rows, pa.int64()),
        "n_nulls": pa.array(n_nulls, pa.int64()),
        "min_value": pa.array(mins, pa.string()),
        "max_value": pa.array(maxs, pa.string()),
        "len_sum": pa.array(len_sums, pa.int64()),
    })


def _as_str(scalar: pa.Scalar) -> str | None:
    v = scalar.as_py()
    if v is None:
        return None
    return v if isinstance(v, str) else str(v)


def profile_columns(ds, columns: list[str]) -> pa.Table:
    """Profile ``columns`` of a Dataset in one streaming pass.

    Returns an Arrow table with one row per column:
    (column, n_rows, n_nulls, min_value, max_value, len_sum) —
    ``min_value``/``max_value`` stringified (lexicographic for strings,
    numeric order for numbers), ``len_sum`` only for string columns.
    The fold runs on the driver over #blocks × #columns partial rows.
    """
    schema = ds.schema()  # ray.data Schema: parallel .names / .types
    types = dict(zip(schema.names, schema.types))
    integral = {c for c in columns if pa.types.is_integer(types[c])}
    floating = {c for c in columns if pa.types.is_floating(types[c])}
    parts = ds.map_batches(
        lambda t: _partial_rows(t, columns),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    acc: dict[str, dict] = {c: {
        "n_rows": 0, "n_nulls": 0, "min_value": None, "max_value": None,
        "len_sum": None,
    } for c in columns}
    for r in parts:
        a = acc[r["column"]]
        a["n_rows"] += r["n_rows"]
        a["n_nulls"] += r["n_nulls"]
        for key, keep in (("min_value", min), ("max_value", max)):
            if r[key] is not None:
                # numeric partials must fold in NUMERIC order ("10" < "9"
                # lexicographically); re-typed BY COLUMN TYPE (not string
                # shape — float str() may be '1e-05'/'inf'/'nan'), then
                # stringified at the end
                v = r[key]
                if r["column"] in floating:
                    v = float(v)
                elif r["column"] in integral:
                    v = int(v)
                a[key] = v if a[key] is None else keep(a[key], v)
        if r["len_sum"] is not None:
            a["len_sum"] = (a["len_sum"] or 0) + r["len_sum"]
    for c in columns:
        for key in ("min_value", "max_value"):
            if acc[c][key] is not None and not isinstance(acc[c][key], str):
                acc[c][key] = str(acc[c][key])
    return pa.table({
        "column": pa.array(columns, pa.string()),
        "n_rows": pa.array([acc[c]["n_rows"] for c in columns], pa.int64()),
        "n_nulls": pa.array([acc[c]["n_nulls"] for c in columns], pa.int64()),
        "min_value": pa.array([acc[c]["min_value"] for c in columns],
                              pa.string()),
        "max_value": pa.array([acc[c]["max_value"] for c in columns],
                              pa.string()),
        "len_sum": pa.array([acc[c]["len_sum"] for c in columns], pa.int64()),
    })
