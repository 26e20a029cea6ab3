"""Canonical Arrow schemas and schema-evolution helpers.

DataX has *no* schema system — each Record carries its own column list
(reference: common/.../element/Record.java:7-23, DefaultRecord.java:19-118);
schema is implied by the job JSON. We go the other way: every Dataset has an
explicit ``pyarrow.Schema``, and schema evolution (column add, integer widen
— required by the north rule, no DataX equivalent) is handled by
``pa.unify_schemas`` + null-fill at the merge stage.

The transcripts table shape is fixed by BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``. Change events add ``op ∈ {I,U,D}`` and ``lsn:int64``
(modeled on otsstreamreader's op-typed events,
otsstreamreader/README.md:98-127, flattened to row ops like otswriter
PutRow/UpdateRow/DeleteRow, otswriter/.../model/OTSConst.java:17-24).
"""

from __future__ import annotations

import pyarrow as pa

# Timestamps are stored as timestamp[ms] naive (UTC by convention). The
# reference's ColumnCast default timezone is GMT+8 (ColumnCast.java:50); we
# keep everything naive so Arrow / DuckDB / pandas comparisons are stable.
TS_TYPE = pa.timestamp("ms")

TRANSCRIPT_FIELDS = [
    pa.field("conv_id", pa.string()),
    pa.field("turn_idx", pa.int32()),
    pa.field("role", pa.string()),
    pa.field("text", pa.string()),
    pa.field("tool", pa.string()),
    pa.field("ts", TS_TYPE),
]
TRANSCRIPT_SCHEMA = pa.schema(TRANSCRIPT_FIELDS)

CHANGELOG_SCHEMA = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string())] + TRANSCRIPT_FIELDS
)

#: Primary key of the lake table; LWW merge is keyed on this.
KEY_COLS = ("conv_id", "turn_idx")
#: Version columns; larger wins (ties on ts broken by lsn).
VERSION_COLS = ("ts", "lsn")

OPS = ("I", "U", "D")


def is_integer_widening(src: pa.DataType, dst: pa.DataType) -> bool:
    """True if ``src -> dst`` is a lossless integer widen (e.g. int32→int64)."""
    return (
        pa.types.is_integer(src)
        and pa.types.is_integer(dst)
        and dst.bit_width >= src.bit_width
        and pa.types.is_signed_integer(src) == pa.types.is_signed_integer(dst)
    )


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify evolved schemas: union of columns, integers widened.

    Column order: first-seen order (so historical column order is stable and
    new columns append at the end — matches what a lake reader expects).
    """
    seen: dict[str, pa.Field] = {}
    order: list[str] = []
    for schema in schemas:
        for field in schema:
            prev = seen.get(field.name)
            if prev is None:
                seen[field.name] = field
                order.append(field.name)
            elif not prev.type.equals(field.type):
                if is_integer_widening(prev.type, field.type):
                    seen[field.name] = field.with_nullable(True)
                elif is_integer_widening(field.type, prev.type):
                    pass  # already the wider one
                else:
                    # fall back to Arrow's own unification for other promotions
                    unified = pa.unify_schemas(
                        [pa.schema([prev]), pa.schema([field])],
                        promote_options="permissive",
                    )
                    seen[field.name] = unified.field(field.name)
    return pa.schema([seen[name] for name in order])


def align_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``schema``: missing columns → null-filled,
    narrower integers → cast wider, column order normalized.

    This is the merge-stage half of schema evolution: old committed lake
    files keep their old schema; readers unify on read.
    """
    n = table.num_rows
    cols = []
    for field in schema:
        idx = table.schema.get_field_index(field.name)
        if idx == -1:
            cols.append(pa.nulls(n, type=field.type))
        else:
            col = table.column(idx)
            if not col.type.equals(field.type):
                col = col.cast(field.type)
            cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def concat_aligned(tables: list[pa.Table]) -> pa.Table:
    """Concatenate tables with possibly-evolved schemas into one table on the
    unified schema (deterministic input order ⇒ deterministic output)."""
    tables = [t for t in tables if t is not None and t.num_rows >= 0]
    if not tables:
        raise ValueError("concat_aligned: no tables")
    if len(tables) == 1:
        return tables[0]
    unified = unify_schemas([t.schema for t in tables])
    return pa.concat_tables([align_to_schema(t, unified) for t in tables])
