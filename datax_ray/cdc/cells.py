"""Cell-version changelog: the otsstreamreader MULTI_VERSION analogue.

The reference's stream reader has two export modes
(otsstreamreader/README.md:84-127): SINGLE_VERSION_AND_UPDATE_ONLY emits
row-shaped events (the engine's native changelog shape), MULTI_VERSION
emits one record per written CELL version — (pk..., columnName,
timestamp, columnValue) plus delete markers. Here:

- ``explode_cells``       — row events → cell-version events, fully
  vectorized (one column-slice table per value column, concatenated; no
  per-row loop). Null cells of an upsert are "not written" (OTS
  semantics) and emit nothing; a delete emits one row-delete marker
  (cell_op='DR', the reference's DELETE_ROW) with null col_name.
- ``assemble_cells``      — the reader side: fold the latest version per
  (key, col_name) with the SAME LWW kernel the row merge uses (the fold
  is key-generic), then pivot the surviving cells back to row shape.
  Partitioning assumption: all cells of one conv_id are co-located
  (hash-partition by conv_id before folding), identical to the row merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.cdc.merge import lww_fold_table, stable_hash_partition

#: value columns of the transcript schema that carry cell versions
DEFAULT_VALUE_COLS = ("role", "text", "tool")

CELL_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("col_name", pa.string()),
        ("col_value", pa.string()),
        ("ts", pa.timestamp("us")),
        ("lsn", pa.int64()),
        ("cell_op", pa.string()),  # 'U' (put cell) | 'DR' (delete row)
    ]
)


def explode_cells(t: pa.Table, value_cols=DEFAULT_VALUE_COLS) -> pa.Table:
    """Row-shaped change events → cell-version events (vectorized)."""
    ts_type = t["ts"].type
    schema = pa.schema(
        [f if f.name != "ts" else pa.field("ts", ts_type) for f in CELL_SCHEMA]
    )
    if t.num_rows == 0:
        return schema.empty_table()
    # null-op rows are malformed and emit NOTHING (matching the SQL
    # oracle's op <> 'D' three-valued logic) — they must not be mistaken
    # for upserts
    valid = pc.is_valid(t["op"])
    is_del = pc.fill_null(pc.equal(t["op"], pa.scalar("D")), False)
    ups = t.filter(pc.and_(valid, pc.invert(is_del)))
    dels = t.filter(is_del)
    parts = []
    for c in value_cols:
        written = ups.filter(pc.is_valid(ups[c]))
        parts.append(
            pa.table(
                {
                    "conv_id": written["conv_id"],
                    "turn_idx": written["turn_idx"].cast(pa.int32()),
                    "col_name": pa.array([c] * written.num_rows, pa.string()),
                    "col_value": written[c].cast(pa.string()),
                    "ts": written["ts"],
                    "lsn": written["lsn"],
                    "cell_op": pa.array(["U"] * written.num_rows, pa.string()),
                },
                schema=schema,
            )
        )
    parts.append(
        pa.table(
            {
                "conv_id": dels["conv_id"],
                "turn_idx": dels["turn_idx"].cast(pa.int32()),
                "col_name": pa.nulls(dels.num_rows, pa.string()),
                "col_value": pa.nulls(dels.num_rows, pa.string()),
                "ts": dels["ts"],
                "lsn": dels["lsn"],
                "cell_op": pa.array(["DR"] * dels.num_rows, pa.string()),
            },
            schema=schema,
        )
    )
    return pa.concat_tables(parts)


def cell_changelog(events_ds, value_cols=DEFAULT_VALUE_COLS):
    """Dataset wrapper: map_batches explode over a row-shaped changelog."""
    return events_ds.map_batches(
        lambda t: explode_cells(t, value_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _assemble_partition(g: pa.Table, value_cols) -> pa.Table:
    """One partition's cells → final rows. Two LWW folds + a pivot:

    1. fold per (conv_id, turn_idx) over row-level ops (cell puts = 'I',
       row deletes = 'D') to decide which keys still EXIST;
    2. fold per (conv_id, turn_idx, col_name) to pick each cell's winning
       version — a delete marker also wins cells older than it;
    3. pivot surviving cells to columns via hash joins on the key.
    """
    ts_type = g["ts"].type
    out_fields = [("conv_id", pa.string()), ("turn_idx", pa.int32())]
    out_fields += [(c, pa.string()) for c in value_cols]
    out_fields += [("ts", ts_type), ("lsn", pa.int64())]
    out_schema = pa.schema(out_fields)
    if g.num_rows == 0:
        return out_schema.empty_table()

    # (1) row existence: latest (ts, lsn) op per key decides life/death
    rowops = g.append_column(
        "op",
        pc.if_else(pc.equal(g["cell_op"], pa.scalar("DR")),
                   pa.scalar("D"), pa.scalar("I")),
    )
    alive = lww_fold_table(
        rowops, key_cols=("conv_id", "turn_idx"), drop_deletes=True
    ).select(["conv_id", "turn_idx", "ts", "lsn"])

    # (2) winning version per cell: a row delete at ts_d kills every cell
    # version older than ts_d even if a later put resurrects the row, so
    # replicate each 'DR' marker into every value column's (key, col) group
    # before the fold (markers carry col_name=NULL and would otherwise
    # never meet the cells they must kill)
    puts = rowops.filter(pc.equal(rowops["cell_op"], pa.scalar("U")))
    markers = rowops.filter(pc.equal(rowops["cell_op"], pa.scalar("DR")))
    fold_input = [puts]
    for c in value_cols:
        fold_input.append(
            markers.set_column(
                markers.schema.get_field_index("col_name"),
                "col_name",
                pa.array([c] * markers.num_rows, pa.string()),
            )
        )
    won = lww_fold_table(
        pa.concat_tables(fold_input),
        key_cols=("conv_id", "turn_idx", "col_name"),
        drop_deletes=True,
    )

    # (3) pivot: one join per value column against the alive key set
    out = alive
    for c in value_cols:
        side = won.filter(pc.equal(won["col_name"], pa.scalar(c))).select(
            ["conv_id", "turn_idx", "col_value"]
        )
        side = side.rename_columns(["conv_id", "turn_idx", c])
        out = out.join(side, keys=["conv_id", "turn_idx"], join_type="left outer")
    cols = ["conv_id", "turn_idx"] + list(value_cols) + ["ts", "lsn"]
    return out.select(cols).cast(out_schema).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


def assemble_cells(cells_ds, *, value_cols=DEFAULT_VALUE_COLS,
                   num_partitions: int = 64):
    """Cell-version changelog → final row-shaped table state (Dataset)."""

    def add_part(t: pa.Table) -> pa.Table:
        part = stable_hash_partition(t["conv_id"], num_partitions)
        return t.append_column("part", pa.array(part, pa.int32()))

    return (
        cells_ds.map_batches(add_part, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: _assemble_partition(g.drop_columns(["part"]), value_cols),
            batch_format="pyarrow",
        )
    )
