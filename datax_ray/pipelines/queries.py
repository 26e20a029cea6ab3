"""Driver-contract query pipelines: every operator from SURVEY.md §2 as a
callable over an sf_dir of testdata parquet, each paired with an ANSI-SQL
oracle in ``ORACLES`` (run by the driver through DuckDB on the same
tables). Column names and value precision match the SQL exactly — integer
cents for money sums (float sum association differs between engines),
fixed rounding everywhere else.

The CDC queries derive a changelog from the ``events`` table with a pure
deterministic row-wise mapping (expressed identically in SQL), then run
the REAL engine merge — so the driver's value-hash check covers the whole
merge path (combiner → hash shuffle → vectorized LWW fold → tombstone
drop), not a reimplementation."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.cdc.merge import lww_merge
from datax_ray.ops.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    simhash_candidates,
)
from datax_ray.ops.joins import broadcast_join
from datax_ray.ops.lsh_fixture import (
    MINHASH_PARAMS as _MH,
    NEARDUP_PARAMS as _ND,
    SIMHASH_MAX_HAMMING as _SH_HAM,
    lsh_fixture_dir as _lsh_fixture_dir,
    planes_fixture_path as _planes_path,
)
from datax_ray.ops.multimodal import MEDIA_FIXTURE_DIR as _MEDIA_DIR
from datax_ray.ops.similarity import knn_bruteforce
from datax_ray.ops.text import (
    add_fingerprint,
    add_lang_id,
    add_quality,
    add_token_counts,
)
from datax_ray.ops.window import sessionize, tumbling_agg
from datax_ray.transforms import DxFilter, DxPad, DxReplace, DxSubstr, TransformChain

_ROLES = np.array(["system", "user", "assistant", "tool"], dtype=object)


def _rd():
    import ray.data as rd

    return rd


def _read(sf_dir: str, table: str, columns=None, filter=None, num_blocks=8):
    # explicit metadata-free schema: stray pandas metadata in the testdata
    # footers defeats Ray's block-schema hashing (worker "Failed to hash
    # the schemas" warnings) and bloats every block's schema payload.
    # num_blocks (default 8): the testdata tables are single-row-group
    # single parquet files → ONE input block, which serializes EVERY
    # downstream stage (measured 3× on the merge queries); real corpora
    # arrive in many files/row-groups, so the explicit split just
    # restores the normal execution shape
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    return _rd().read_parquet(path, schema=schema, columns=columns,
                              filter=filter, **kw)


# --------------------------------------------------------------- CDC core
#: SQL fragment deriving the changelog from events — keep in lockstep with
#: ``derive_changelog_batch`` below.
CHANGELOG_CTE = """
changelog AS (
  SELECT
    event_id AS lsn,
    CASE WHEN event_id % 10 < 6 THEN 'I'
         WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END AS op,
    'conv_' || CAST(user_id % 50 AS VARCHAR) AS conv_id,
    CAST(event_id % 8 AS INTEGER) AS turn_idx,
    CASE WHEN event_id % 10 >= 9 THEN NULL ELSE
      CASE CAST(event_id % 4 AS INTEGER)
        WHEN 0 THEN 'system' WHEN 1 THEN 'user'
        WHEN 2 THEN 'assistant' ELSE 'tool' END END AS role,
    CASE WHEN event_id % 10 >= 9 THEN NULL ELSE props END AS text,
    CASE WHEN event_id % 10 >= 9 OR event_id % 3 <> 0 THEN NULL
         ELSE event_type END AS tool,
    ts
  FROM events)
"""

LWW_FOLD_SQL = """
SELECT conv_id, turn_idx, role, text, tool, ts FROM (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM {src})
WHERE rn = 1 AND op <> 'D'
"""


def derive_changelog_batch(t: pa.Table) -> pa.Table:
    """Vectorized event→change-event mapping (numpy; no row loops)."""
    eid = np.asarray(t["event_id"])
    uid = np.asarray(t["user_id"])
    m10 = eid % 10
    op = np.full(len(eid), "U", dtype=object)
    op[m10 < 6] = "I"
    op[m10 >= 9] = "D"
    conv = np.char.add("conv_", (uid % 50).astype("U20")).astype(object)
    turn = (eid % 8).astype(np.int32)
    role = _ROLES[eid % 4].copy()
    text = np.asarray(t["props"], dtype=object).copy()
    tool = np.where(eid % 3 == 0, np.asarray(t["event_type"], dtype=object), None)
    is_d = m10 >= 9
    role[is_d] = None
    text[is_d] = None
    tool[is_d] = None
    return pa.table(
        {
            "lsn": pa.array(eid.astype(np.int64)),
            "op": pa.array(op, pa.string()),
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": t["ts"],
        }
    )


_EVENT_COLS = ["event_id", "user_id", "event_type", "props", "ts"]


def _changelog(sf_dir: str, filter=None):
    return _read(sf_dir, "events", columns=_EVENT_COLS, filter=filter).map_batches(
        derive_changelog_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _final_cols(ds):
    return ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_cdc_lww_merge(sf_dir: str):
    return _final_cols(lww_merge(_changelog(sf_dir), num_partitions=16))


def q_cdc_lww_merge_salted(sf_dir: str):
    return _final_cols(lww_merge(_changelog(sf_dir), num_partitions=16, salt=4))


def q_cdc_dup_redelivery(sf_dir: str):
    """Source re-delivery: events with lsn % 7 == 0 delivered twice; the
    fold must be idempotent (same result as the clean replay)."""
    import numpy as np  # noqa: F811

    clean = _changelog(sf_dir)
    dup = _changelog(sf_dir).map_batches(
        lambda t: t.filter(pa.array(np.asarray(t["lsn"]) % 7 == 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _final_cols(lww_merge(clean.union(dup), num_partitions=16))


_WINDOW = ("2024-01-08 00:00:00", "2024-01-24 00:00:00")


def q_cdc_window(sf_dir: str):
    import datetime as dt

    lo = dt.datetime.fromisoformat(_WINDOW[0])
    hi = dt.datetime.fromisoformat(_WINDOW[1])
    ds = _read(
        sf_dir, "events", columns=_EVENT_COLS,
        filter=((pc.field("ts") >= lo) & (pc.field("ts") < hi)),
    ).map_batches(derive_changelog_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _final_cols(lww_merge(ds, num_partitions=16))


def q_cdc_op_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return _changelog(sf_dir).groupby("op").aggregate(Count(alias_name="n"))


def q_cdc_scd2_history(sf_dir: str):
    """SCD Type-2 version history (cdc/scd.py): every I/U change becomes
    a version row with a [valid_from, valid_to) interval closed by the
    next change on its (conv_id, turn_idx) key; deletes close without
    opening. One shuffle + a vectorized sort/shifted-compare kernel per
    partition. Oracle: lead() window over the same changelog."""
    from datax_ray.cdc.scd import scd2_history

    return scd2_history(_changelog(sf_dir), num_partitions=16,
                        salt_by_turn=True)


# ------------------------------------------------------------- transforms
def _rename(ds, mapping: dict[str, str]):
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_dx_substr(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(
        TransformChain([DxSubstr("text", 5, 20)]), batch_format="pyarrow"
    )
    return _rename(ds, {"text": "text_sub"})


def q_dx_pad(sf_dir: str):
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    ds = ds.map_batches(
        TransformChain([DxPad("p_brand", "r", 10, "*")]), batch_format="pyarrow"
    )
    return _rename(ds, {"p_brand": "brand_pad"})


def q_dx_replace(sf_dir: str):
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    ds = ds.map_batches(
        TransformChain([DxReplace("p_type", 4, 3, "XYZ")]), batch_format="pyarrow"
    )
    return _rename(ds, {"p_type": "type_repl"})


def q_dx_filter_like(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        TransformChain([DxFilter("text", "like", "the.*")]), batch_format="pyarrow"
    )


def q_transform_chain(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    chain = TransformChain(
        [
            DxSubstr("text", 0, 40),
            DxFilter("text", "like", ".*data.*"),
            DxPad("text", "r", 40, "_"),
        ]
    )
    ds = ds.map_batches(chain, batch_format="pyarrow")
    return _rename(ds, {"text": "text_out"})


# ---------------------------------------------------------- copy pipeline
def q_copy_project_filter(sf_dir: str):
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    return ds.map_batches(
        TransformChain([DxFilter("l_quantity", ">=", "25")]), batch_format="pyarrow"
    )


def q_csv_roundtrip(sf_dir: str):
    """reader→writer round-trip: parquet → typed CSV → typed read-back."""
    from datax_ray.sinks.csvsink import list_output_files, write_csv
    from datax_ray.sources.csvsource import read_csv

    out = f"/tmp/datax_ray_q/csv_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"])
    write_csv(ds, out, write_mode="truncate")
    back = read_csv(
        list_output_files(out),
        columns=[
            {"index": 0, "type": "long", "name": "l_orderkey"},
            {"index": 1, "type": "long", "name": "l_linenumber"},
            {"index": 2, "type": "string", "name": "l_returnflag"},
            {"index": 3, "type": "date", "format": "yyyy-MM-dd HH:mm:ss",
             "name": "l_shipdate"},
        ],
    )
    # oracle reads the parquet directly (timestamp[us]); the CSV source's
    # DataX 'date' type is ms — align the representation at the query edge
    return back.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("l_shipdate"), "l_shipdate",
            t["l_shipdate"].cast(pa.timestamp("us")),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_csv_snappy_roundtrip(sf_dir: str):
    """reader→writer round-trip through snappy-framed CSV
    (UnstructuredStorageReaderUtil.java:144-154 hadoop-snappy /
    framing-snappy dispatch): write framing-snappy, read back via
    ``.snappy`` auto-detection."""
    from datax_ray.sinks.csvsink import list_output_files, write_csv
    from datax_ray.sources.csvsource import read_csv

    out = ("/tmp/datax_ray_q/csv_snappy_roundtrip_"
           f"{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    write_csv(ds, out, write_mode="truncate", compress="framing-snappy")
    return read_csv(
        list_output_files(out),
        columns=[
            {"index": 0, "type": "long", "name": "s_suppkey"},
            {"index": 1, "type": "string", "name": "s_name"},
            {"index": 2, "type": "long", "name": "s_nationkey"},
        ],
    )


def q_csv_lzo_roundtrip(sf_dir: str):
    """reader→writer round-trip through the lzop container
    (UnstructuredStorageReaderUtil.java:124-133 ``lzo`` dispatch):
    write .lzo, read back via extension detection."""
    from datax_ray.sinks.csvsink import list_output_files, write_csv
    from datax_ray.sources.csvsource import read_csv

    out = ("/tmp/datax_ray_q/csv_lzo_roundtrip_"
           f"{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    write_csv(ds, out, write_mode="truncate", compress="lzo")
    return read_csv(
        list_output_files(out),
        columns=[
            {"index": 0, "type": "long", "name": "n_nationkey"},
            {"index": 1, "type": "string", "name": "n_name"},
        ],
    )


def q_seq_roundtrip(sf_dir: str):
    """reader→writer round-trip through Hadoop SequenceFiles
    (DFSUtil.java:214-242 fileType=SEQ: Text values are CSV lines):
    write record-deflate SEQ, read back through the pure-Python
    container (sources/seqfile.py)."""
    from datax_ray.sources.seqfile import DEFAULT_CODEC, read_seq_csv, write_seq_csv

    out = ("/tmp/datax_ray_q/seq_roundtrip_"
           f"{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "region", columns=["r_regionkey", "r_name"])
    write_seq_csv(ds, out, write_mode="truncate", codec=DEFAULT_CODEC)
    return read_seq_csv(
        out + "/*.seq",
        columns=[
            {"index": 0, "type": "long", "name": "r_regionkey"},
            {"index": 1, "type": "string", "name": "r_name"},
        ],
    )


def q_rc_roundtrip(sf_dir: str):
    """reader→writer round-trip through Hive RCFiles
    (DFSUtil.java:244-291 fileType=RC: row cells as strings through the
    typed projection): write DefaultCodec-compressed columnar row
    groups, read back through the pure-Python container
    (sources/rcfile.py)."""
    from datax_ray.sources.rcfile import read_rc_csv, write_rc

    out = ("/tmp/datax_ray_q/rc_roundtrip_"
           f"{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_mktsegment"])
    write_rc(ds, out, write_mode="truncate")
    return read_rc_csv(
        out + "/*.rc",
        columns=[
            {"index": 0, "type": "long", "name": "c_custkey"},
            {"index": 1, "type": "string", "name": "c_name"},
            {"index": 2, "type": "string", "name": "c_mktsegment"},
        ],
    )


def q_querysql_read(sf_dir: str):
    """querySql-mode reader (ReaderSplitUtil.java:92-102 analogue): the
    user supplies raw SQL slices as the split contract — two DuckDB
    slices over the orders parquet here — and Ray combines them with a
    grouped aggregate downstream."""
    from ray.data.aggregate import Count, Sum

    from datax_ray.sources.duckdbsource import read_sql

    path = os.path.join(sf_dir, "orders.parquet")
    slices = [
        "SELECT o_orderpriority, o_totalprice FROM orders "
        f"WHERE o_orderkey % 2 = {i}"
        for i in (0, 1)
    ]
    ds = read_sql(slices, views={"orders": path})

    def cents(t: pa.Table) -> pa.Table:
        c = pc.round(
            pc.multiply(t["o_totalprice"], 100.0),
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        return pa.table({"o_orderpriority": t["o_orderpriority"], "cents": c})

    return (
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
    )


def q_orc_roundtrip(sf_dir: str):
    """writer→reader ORC round trip (hdfswriter ORC mode analogue):
    parquet → distributed ORC part files → ORC read-back."""
    from datax_ray.sinks.orcsink import list_output_files, write_orc
    from datax_ray.sources.files import read_orc

    out = f"/tmp/datax_ray_q/orc_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal"])
    write_orc(ds, out, write_mode="truncate")
    return read_orc(list_output_files(out))


def q_stream_constants(sf_dir: str):
    """streamreader self-check analogue: typed constant rows × slices."""
    from datax_ray.sources.stream import stream_dataset

    ds = stream_dataset(
        [
            {"type": "string", "value": "hello", "name": "c_str"},
            {"type": "long", "value": 42, "name": "c_long"},
            {"type": "double", "value": 3.14, "name": "c_double"},
            {"type": "bool", "value": "true", "name": "c_bool"},
            {"type": "date", "value": "2024-01-01 00:00:00", "name": "c_date"},
        ],
        rows_per_slice=250,
        n_slices=4,
    )
    # DuckDB TIMESTAMP is us; the stream 'date' type is ms — align
    return ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("c_date"), "c_date",
            t["c_date"].cast(pa.timestamp("us")),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# -------------------------------------------------------------- aggregates
def q_agg_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate; money summed as integer cents so
    the result is association-order-independent and matches SQL exactly."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].cast(pa.int64())
        base_c = pc.round(
            pc.multiply(t["l_extendedprice"], 100.0),
            round_mode="half_towards_infinity",   # SQL round() = half away from zero
        ).cast(pa.int64())
        disc = pc.multiply(
            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
        )
        disc_c = pc.round(
            pc.multiply(disc, 100.0), round_mode="half_towards_infinity"
        ).cast(pa.int64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "base_cents": base_c,
                "disc_cents": disc_c,
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        # batch-level partial aggregation: ≤ |groups| rows leave each
        # batch, so the groupby shuffles combiner output, not the table
        g = prep(t).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"),
             ("disc_cents", "sum"), ("qty", "count")]
        )
        # rename by NAME, not position: pyarrow's aggregate column order
        # (keys-first vs aggregates-first) varies across versions
        out_names = {"qty_sum": "qty_sum", "base_cents_sum": "base_sum",
                     "disc_cents_sum": "disc_sum", "qty_count": "n"}
        g = g.rename_columns([out_names.get(c, c) for c in g.column_names])
        return g.select(["l_returnflag", "l_linestatus",
                         "qty_sum", "base_sum", "disc_sum", "n"])

    out = (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_sum", alias_name="sum_qty"),
            Sum("base_sum", alias_name="sum_base_cents"),
            Sum("disc_sum", alias_name="sum_disc_cents"),
            Sum("n", alias_name="count_order"),
        )
    )

    def post(t: pa.Table) -> pa.Table:
        avg = pc.round(
            pc.divide(t["sum_qty"].cast(pa.float64()),
                      t["count_order"].cast(pa.float64())),
            ndigits=6,
        )
        return t.append_column("avg_qty", avg)

    return out.map_batches(post, batch_format="pyarrow")


def q_events_windowed_agg(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(t["value"], 100.0), round_mode="half_towards_infinity"
        ).cast(pa.int64())
        return t.set_column(t.schema.get_field_index("value"), "value", v)

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    out = tumbling_agg(ds, key_col="event_type", ts_col="ts",
                       every_ms=3_600_000, value_col="value")
    return _rename(out, {"sum_value": "sum_value_cents"})


def q_events_sliding_agg(sf_dir: str):
    """Hopping window (2h size, 1h step): every event counted in 2
    windows; window key = int64 epoch-us of window start."""
    from datax_ray.ops.window import sliding_agg

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(t["value"], 100.0), round_mode="half_towards_infinity"
        ).cast(pa.int64())
        return t.set_column(t.schema.get_field_index("value"), "value", v)

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    out = sliding_agg(ds, key_col="event_type", ts_col="ts",
                      size_ms=7_200_000, step_ms=3_600_000, value_col="value")
    return _rename(out, {"sum_value": "sum_value_cents"})


def q_events_sessionize(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return sessionize(ds, key_col="user_id", ts_col="ts", gap_ms=1_800_000)


def q_topk_orders(sf_dir: str):
    """Top-10 without a global sort: per-block argpartition top-k, then one
    tiny (k × blocks rows) reduce — ops/topk.py."""
    from datax_ray.ops.topk import topk

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return topk(ds, ["o_totalprice", "o_orderkey"],
                descending=[True, False], k=10)


def q_curation_pipeline(sf_dir: str):
    """The flagship training-data curation chain END TO END — language
    gate (keep 'en') → quality gate (prose thresholds) → exact dedup
    (min doc_id per canonical fingerprint) → context-window chunking
    (32-token windows, stride 24). Stages 1/2/4 are map-only batch
    transforms; the single shuffle in the whole pipeline is the dedup's
    fingerprint hash exchange. Each stage is individually oracled
    elsewhere; this query pins the COMPOSITION against one nested SQL."""
    from datax_ray.ops.dedup import exact_dedup
    from datax_ray.ops.text import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gates(t: pa.Table) -> pa.Table:
        t = add_lang_id(t)
        t = t.filter(pc.equal(t["lang_pred"], "en"))
        t = add_quality(t.select(["doc_id", "text"]))
        m = pc.and_(
            pc.and_(pc.less(t["punct_ratio"], 0.1),
                    pc.greater(t["stopword_ratio"], 0.05)),
            pc.less(t["mean_token_len"], 12.0),
        )
        return t.filter(m).select(["doc_id", "text"])

    ds = ds.map_batches(gates, batch_format="pyarrow", zero_copy_batch=True)
    ds = exact_dedup(ds, num_partitions=8)
    return ds.map_batches(
        lambda t: chunk_documents(t, chunk_tokens=32, overlap=8),
        batch_format="pyarrow", zero_copy_batch=True)


def q_lookup_enrich(sf_dir: str):
    """Chained broadcast dimension enrichment inside a TransformChain
    (transforms/lookup.py): orders → +customer(c_mktsegment, c_nationkey)
    → +nation(n_name). Each dim table ray.put ONCE
    (broadcast_lookup_specs) and probed per batch with an
    order-preserving vectorized hash lookup — no shuffle. Oracle: two
    LEFT JOINs."""
    from datax_ray.transforms import TransformChain, build_transform
    from datax_ray.transforms.lookup import broadcast_lookup_specs

    specs = broadcast_lookup_specs([
        {"name": "lookup", "parameter": {
            "path": os.path.join(sf_dir, "customer.parquet"),
            "key": "o_custkey", "dimKey": "c_custkey",
            "columns": ["c_mktsegment", "c_nationkey"]}},
        {"name": "lookup", "parameter": {
            "path": os.path.join(sf_dir, "nation.parquet"),
            "key": "c_nationkey", "dimKey": "n_nationkey",
            "columns": ["n_name"]}},
    ])
    chain = TransformChain([build_transform(s) for s in specs])
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return ds.map_batches(chain, batch_format="pyarrow")


def q_grouped_topk_orders(sf_dir: str):
    """Top-3 orders per priority class (ops/rank.grouped_topk): every
    block is pruned to ≤3 rows per group BEFORE the shuffle, so the
    exchange moves O(k·groups·blocks) candidates — the grouped analogue
    of topk_orders. Oracle: row_number() OVER (PARTITION BY ...) <= 3."""
    from datax_ray.ops.rank import grouped_topk

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    return grouped_topk(ds, group_cols="o_orderpriority",
                        order_cols=["o_totalprice", "o_orderkey"],
                        descending=[True, False], k=3, num_partitions=8)


def q_window_user_activity(sf_dir: str):
    """SQL window functions in one sorted kernel pass per hash partition
    (ops/rank.window_funcs): row_number / rank-with-ties / lag / lead /
    cumulative sum / moving average over PARTITION BY user_id. The
    analysis value is computed over an exact INTEGER measure
    (event_id % 97) so running sums are bit-reproducible in SQL —
    float running sums would differ from DuckDB's segment-tree window
    aggregation in the last bit."""
    from datax_ray.ops.rank import window_funcs

    def derive(t: pa.Table) -> pa.Table:
        vi = np.asarray(t["event_id"]) % 97
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "vi": pa.array(vi, pa.int64())})

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True)
    return window_funcs(
        ds, partition_cols="user_id", order_cols=["vi", "event_id"],
        funcs={
            "rn": ("row_number",),
            "rk": ("rank", ["vi"]),
            "dr": ("dense_rank", ["vi"]),
            "nt": ("ntile", 4),
            "pr": ("percent_rank", ["vi"]),
            "cd": ("cume_dist", ["vi"]),
            "prev_vi": ("lag", "vi", 1),
            "next_vi": ("lead", "vi", 1),
            "cum_vi": ("cumsum", "vi"),
            "mv4": ("moving_avg", "vi", 4),
        }, num_partitions=32)


def q_sample_hash(sf_dir: str):
    """Deterministic Bernoulli-by-key sample (ops/sample.py): md5 mode
    ONLY because the oracle reproduces the keep/drop decision in SQL —
    pipelines use the vectorized siphash 'fast' mode."""
    from datax_ray.ops.sample import hash_sample

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return hash_sample(ds, key_col="o_orderkey", fraction=0.1, mode="md5")


def q_stratified_sample(sf_dir: str):
    """Per-key cap sample (≤3 orders per customer): md5 rank mode ONLY so
    the oracle reproduces the exact selection; pipelines use 'fast'."""
    from datax_ray.ops.sample import stratified_sample

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    return stratified_sample(ds, key_col="o_custkey", id_col="o_orderkey",
                             k=3, mode="md5")


def q_distinct_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "customer", columns=["c_mktsegment"])
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"))
    )


def q_join_orders_mktsegment(sf_dir: str):
    """Broadcast dimension join (customer is the small side)."""
    cust = (
        pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
        .rename(columns={"c_custkey": "o_custkey"})
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return broadcast_join(orders, cust, on="o_custkey", how="inner")


def _building_custkeys(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey", "c_mktsegment"])
    return t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))["c_custkey"]


def q_semi_join_orders(sf_dir: str):
    """Broadcast semi-join: orders whose customer is in the BUILDING
    segment — the key set ships once via ray.put, each batch filters with
    one vectorized is_in."""
    from datax_ray.ops.joins import semi_filter

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return semi_filter(ds, _building_custkeys(sf_dir), on="o_custkey")


def q_anti_join_orders(sf_dir: str):
    """Broadcast anti-join: orders from customers OUTSIDE the BUILDING
    segment (same shipped-once key set, inverted membership)."""
    from datax_ray.ops.joins import anti_filter

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return anti_filter(ds, _building_custkeys(sf_dir), on="o_custkey")


def q_hash_join_lineitem(sf_dir: str):
    """Large-large equi-join, the no-broadcast path: lineitem ⋈ orders on
    the order key — both sides hash-partition in ONE tagged-union
    exchange, each partition runs a zero-copy ``pa.Table.join``
    (ops/joins.hash_join). The shape that still works when NEITHER side
    fits a node."""
    from datax_ray.ops.joins import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["l_orderkey", "o_custkey", "o_totalprice"])

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"]
                   ).map_batches(rekey, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return hash_join(li, orders, on="l_orderkey", how="inner",
                     num_partitions=16)


def q_asof_clicks_views(sf_dir: str):
    """As-of join, shuffle path: each click event matched to the LATEST
    prior (or simultaneous) view event by the same user — tagged union +
    one hash-partition exchange + one vectorized kernel per partition
    (ops/joins.asof_join). The sessionization sibling of DuckDB's
    ``ASOF JOIN``."""
    from datax_ray.ops.joins import asof_join

    cols = ["event_id", "ts", "user_id", "event_type"]
    clicks = _read(sf_dir, "events", columns=cols,
                   filter=pc.field("event_type") == "click")
    views = _read(sf_dir, "events", columns=cols,
                  filter=pc.field("event_type") == "view")
    out = asof_join(clicks.drop_columns(["event_type"]),
                    views, by="user_id", on="ts",
                    right_cols=["event_id"], suffix="_v", how="left",
                    num_partitions=16)
    return out


def q_asof_tolerance_broadcast(sf_dir: str):
    """As-of join, broadcast path with a 1-hour tolerance: the view-side
    table ships once via ray.put (sorted), each batch resolves its match
    with one composite-key binary search — zero shuffle. Matches older
    than 1 hour are dropped (nulled) like merge_asof's ``tolerance``."""
    from datax_ray.ops.joins import asof_join_broadcast

    cols = ["event_id", "ts", "user_id", "event_type"]
    clicks = _read(sf_dir, "events", columns=cols,
                   filter=pc.field("event_type") == "click")
    views_tbl = pa.concat_tables(
        ray_get_blocks(_read(sf_dir, "events", columns=cols,
                             filter=pc.field("event_type") == "view")))
    return asof_join_broadcast(
        clicks.drop_columns(["event_type"]),
        views_tbl.drop_columns(["event_type"]),
        by="user_id", on="ts", right_cols=["event_id"], suffix="_v",
        how="left", tolerance=3_600_000_000)


def ray_get_blocks(ds):
    import ray

    return [ray.get(ref) for ref in ds.to_arrow_refs()]


#: Deterministic campaign windows over the events month — campaign ``i``
#: runs [2024-01-01 + 33·i hours, +24 + (7·i mod 48) hours). Kept in
#: lockstep with the SQL oracle's ``range(20)`` CTE.
_N_CAMPAIGNS = 20


def _campaign_intervals() -> pa.Table:
    i = np.arange(_N_CAMPAIGNS, dtype=np.int64)
    hour_us = 3_600_000_000
    base = 1_704_067_200_000_000  # epoch µs of 2024-01-01 00:00:00
    lo = base + 33 * i * hour_us
    hi = lo + (24 + (7 * i) % 48) * hour_us
    return pa.table({
        "campaign_id": pa.array(i),
        "lo": pa.array(lo, type=pa.timestamp("us")),
        "hi": pa.array(hi, type=pa.timestamp("us")),
    })


def q_interval_join_campaigns(sf_dir: str):
    """Range join, bucketed scale path: every event joined to every
    campaign window containing its ts (windows overlap → one row per
    match). Intervals are replicated to the 24-hour time buckets they
    overlap with clamped bounds (exact, duplicate-free); rows route by
    ``ts // bucket`` — the large-interval-set shape that still works when
    the interval table itself is too big to broadcast."""
    from datax_ray.ops.joins import interval_join_bucketed

    ev = _read(sf_dir, "events", columns=["event_id", "ts"])
    out = interval_join_bucketed(ev, _campaign_intervals(), ts_col="ts",
                                 bucket=24 * 3_600_000_000,
                                 num_partitions=16)
    return out.map_batches(
        lambda t: t.select(["event_id", "campaign_id", "lo", "hi"]),
        batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------- dedup / text / sim
def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard near-dup pairs via the distributed inverted
    index (ops/dedup.ngram_jaccard_pairs): postings shuffle once by gram,
    pairs fold once by pair key — no all-pairs stage, SQL-oracle-able
    end-to-end (unlike the probabilistic MinHash path it backstops)."""
    from datax_ray.ops.dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, n=3, threshold=0.1, num_partitions=16)


def q_group_quantiles(sf_dir: str):
    """Exact per-group percentile_cont quantiles (ops/agg.group_quantiles):
    one hash shuffle of (key, value), one vectorized sort+gather kernel
    per partition for all groups × quantiles at once — the exact
    counterpart of the KLL sketch."""
    from datax_ray.ops.agg import group_quantiles

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    return group_quantiles(ds, key_col="o_orderpriority",
                           value_col="o_totalprice",
                           quantiles=(0.25, 0.5, 0.75), num_partitions=8)


def q_assemble_conversations(sf_dir: str):
    """Transcripts-native: LWW-merge the derived changelog, then fold each
    conversation's turns into one document row (turns joined by newline in
    turn_idx order) — the merge → assemble composition a transcript corpus
    pipeline runs before text analysis."""
    from datax_ray.ops.agg import assemble_conversations

    state = lww_merge(_changelog(sf_dir), num_partitions=16)
    return assemble_conversations(state, num_partitions=8)


def q_ivm_conv_stats(sf_dir: str):
    """Incrementally-maintained aggregate view (cdc/ivm.py): replay the
    derived changelog into a 4-epoch lake, materialize the per-conv stats
    view AS OF epoch 1, then advance it to the current epoch — the
    advance recomputes ONLY conversations touched by epochs 2-3 (cost ∝
    changed groups, zero shuffle). Oracle: plain GROUP BY over the final
    LWW state — incremental must equal full recompute."""
    from datax_ray.cdc.ivm import read_view, refresh_view
    from datax_ray.cdc.replay import replay_files

    meta = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
    n = meta.num_rows
    work = f"/tmp/datax_ray_q/ivm_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(work, ignore_errors=True)
    cl_dir = os.path.join(work, "cl")
    lake = os.path.join(work, "lake")
    _changelog(sf_dir).write_parquet(cl_dir)
    replay_files(cl_dir, lake_dir=lake, max_lsn_exclusive=n,
                 num_partitions=8, epoch_size=(n + 3) // 4, compact_every=0)
    view_dir = os.path.join(work, "view")
    refresh_view(lake, view_dir, to_epoch=1)   # snapshot view at epoch 1
    refresh_view(lake, view_dir)               # incremental advance
    return read_view(view_dir)


def q_pack_documents(sf_dir: str):
    """Greedy sequence packing (concatenate-then-split, the LLM training
    prep rule): documents in doc_id order packed into 256-token bins via
    the distributed two-phase scan (ops/scan.prefix_sum — per-bucket
    combiners, driver folds only n_buckets offsets, no sequential pass)."""
    from datax_ray.ops.scan import assign_pack_bins

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    with_counts = ds.map_batches(
        lambda t: add_token_counts(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return assign_pack_bins(with_counts, key_col="doc_id",
                            value_col="n_tokens", budget=256,
                            bucket_size=128)


def q_chunk_documents(sf_dir: str):
    """Context-window chunking (training prep): each document exploded
    into overlapping 32-token windows (stride 24) — one vectorized Arrow
    split + flat gather + binary_join per batch, map-only (no shuffle)."""
    from datax_ray.ops.text import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: chunk_documents(t, chunk_tokens=32, overlap=8),
        batch_format="pyarrow", zero_copy_batch=True)


def q_token_budget_head(sf_dir: str):
    """Fill a token budget from the front of the corpus
    (ops/scan.take_within_budget): whitespace-token counts per document,
    inclusive running total in doc_id order via the two-phase distributed
    scan, keep rows while the total stays ≤ 20 000 tokens. Oracle:
    SUM() OVER (ORDER BY doc_id) <= budget."""
    from datax_ray.ops.scan import take_within_budget

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        t = add_token_counts(t)
        return t.select(["doc_id", "n_tokens"])

    ds = ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    return take_within_budget(ds, key_col="doc_id", value_col="n_tokens",
                              budget=20_000, bucket_size=256)


def q_late_events(sf_dir: str):
    """Watermark / allowed-lateness routing (ops/scan.route_late_events):
    event time = ts jittered back ((lsn*17) % 64 minutes) so arrival order
    (lsn) and event time disagree; the watermark is the distributed
    prefix-max of event time over arrival order (two-phase scan, no
    sequential pass) and an event is late iff it trails the watermark at
    its arrival by > 10 min. Oracle: max() OVER (ORDER BY lsn ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)."""
    from datax_ray.ops.scan import route_late_events

    def jitter(t: pa.Table) -> pa.Table:
        lsn = np.asarray(t["lsn"])
        ts_i = np.asarray(t["ts"].cast(pa.int64()))
        ev = ts_i - ((lsn * 17) % 64) * 60_000_000  # minutes in µs
        return pa.table({
            "lsn": t["lsn"],
            "ev_ts": pa.array(ev).cast(pa.timestamp("us")),
        })

    ds = _changelog(sf_dir).map_batches(jitter, batch_format="pyarrow",
                                        zero_copy_batch=True)
    return route_late_events(ds, ts_col="ev_ts", order_col="lsn",
                             allowed_lateness_ms=600_000,
                             bucket_size=4096)


_KMEANS_K = 8


def q_kmeans_embeddings(sf_dir: str):
    """Distributed k-means (ops/clustering.py): 2 Lloyd iterations from
    the k smallest-id vectors, each iteration ONE streaming pass emitting
    k×D partial sums per batch (no shuffle, nothing materialized), then a
    map-only assignment. Oracle: the same two iterations unrolled in SQL
    (arg_min over list_distance, avg per (cluster, dim))."""
    from datax_ray.ops.clustering import kmeans

    init = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _KMEANS_K)],
    ).sort_by("vec_id")
    init_c = np.stack(init["embedding"].to_numpy(zero_copy_only=False))
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assignments, _cents = kmeans(ds, init_c, iters=2)
    return assignments


def q_profile_documents(sf_dir: str):
    """One-pass column profiler (ops/profile.py): per-column row/null
    counts, typed min/max, total string length — per-batch partial rows
    folded on the driver; the data never shuffles."""
    from datax_ray.ops.profile import profile_columns

    ds = _read(sf_dir, "documents")
    return profile_columns(ds, ["doc_id", "text", "lang", "source",
                                "n_chars"])


def q_bm25_scores(sf_dir: str):
    """BM25 relevance of every document against a fixed keyword query
    (ops/ranking.py): pass 1 folds (N, avgdl, per-term df) from one
    partial row per batch — no shuffle, no vocabulary; pass 2 scores
    each batch with RE2-vectorized tf/dl counts. Arithmetic is ordered
    identically to the SQL oracle so doubles match bit-for-bit."""
    from datax_ray.ops.ranking import bm25_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_scores(ds, ["table", "scan", "merge"])


def q_incremental_dedup(sf_dir: str):
    """Streaming dedup against the sharded fingerprint index
    (ops/incdedup.py): three ordered epochs — the corpus, then two
    derived re-upload waves carrying duplicate texts under new ids —
    each flagged with ONE epoch-rows-only shuffle + one actor probe per
    partition; the index persists across epochs. Oracle: global
    min-doc_id-per-fingerprint (epochs are id-ordered, so first-arrival
    == global min)."""
    from datax_ray.ops.incdedup import incremental_dedup

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def make_wave(offset: int, mod: int):
        def f(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"])
            sub = t.filter(pa.array(ids % mod == 0))
            return pa.table({
                "doc_id": pa.array(
                    (np.asarray(sub["doc_id"]) + offset).astype(np.int64)),
                "text": sub["text"],
            })
        return f

    epochs = [
        base,
        base.map_batches(make_wave(1_000_000, 5), batch_format="pyarrow",
                         zero_copy_batch=True),
        base.map_batches(make_wave(2_000_000, 10), batch_format="pyarrow",
                         zero_copy_batch=True),
    ]
    return incremental_dedup(epochs, num_shards=8)


def q_dedup_exact(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(ds, num_partitions=8)


def q_text_tokens(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_token_counts(t).select(["doc_id", "n_tokens", "n_bpe_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_redact_pii(sf_dir: str):
    """PII scrub for training data (ops/text.redact_pii): the synthetic
    documents carry no real PII, so both sides deterministically append
    a contact blurb derived from doc_id (email, phone, ssn, ip), then
    redact — exercising the full RE2 pattern set with an exact SQL
    mirror (DuckDB also runs RE2)."""
    import pyarrow.compute as pc

    from datax_ray.ops.text import redact_pii

    def augment_and_redact(t):
        import numpy as np

        ids = np.asarray(t["doc_id"])
        did = pc.cast(t["doc_id"], pa.string())
        phone = pc.utf8_lpad(pa.array((ids % 10000).astype("U")), 4, "0")
        octet = pa.array((ids % 250).astype("U"))
        aug = pc.binary_join_element_wise(
            t["text"], " contact user", did, "@mail.example.com tel +1-555-",
            phone, " ssn 123-45-6789 ip 10.0.0.", octet, "")
        out = pa.table({"doc_id": t["doc_id"], "text": aug})
        return redact_pii(out).rename_columns(["doc_id", "redacted"])

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(augment_and_redact, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_repetition_ratio(sf_dir: str):
    """Gopher-style repeated-token fraction per document
    (ops/text.add_repetition): exact distinct counting via
    dictionary-encode, one kernel pass per batch, no shuffle."""
    from datax_ray.ops.text import add_repetition

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_repetition(t).select(["doc_id", "rep_ratio"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_text_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_quality(t).select(
            ["doc_id", "punct_ratio", "stopword_ratio", "mean_token_len"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_quality_filter(sf_dir: str):
    """The canonical curation pipeline: score every document, keep ones
    passing quality thresholds (enough alphabetic text, sane punctuation,
    some stopwords — i.e. prose, not boilerplate)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keep(t: pa.Table) -> pa.Table:
        t = add_quality(t)
        m = pc.and_(
            pc.and_(pc.less(t["punct_ratio"], 0.1),
                    pc.greater(t["stopword_ratio"], 0.05)),
            pc.less(t["mean_token_len"], 12.0),
        )
        return t.filter(m).select(["doc_id", "text"])

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def q_text_langid(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_lang_id(t).select(["doc_id", "lang_pred"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_text_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        # mode='md5' ONLY here: the oracle compares fingerprint VALUES
        # (everywhere else the default vectorized 'fast' mode is used)
        lambda t: add_fingerprint(t, mode="md5").select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_text_winnow(sf_dir: str):
    """Winnowing (rolling-hash) fingerprints; md5 mode ONLY because the
    oracle reproduces the per-gram hashes in SQL — pipelines use the
    vectorized 'fast' mode."""
    from datax_ray.ops.text import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: winnow_fingerprints(t, mode="md5"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_KNN_Q = 8
_KNN_K = 5


def q_knn_bruteforce(sf_dir: str):
    qtab = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _KNN_Q)],
    )
    qids = np.asarray(qtab["vec_id"])
    qmat = np.stack(qtab["embedding"].to_numpy(zero_copy_only=False))
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_bruteforce(ds, qids, qmat, k=_KNN_K)


_IVF_NC = 16
_IVF_NPROBE = 4


def q_knn_ivf(sf_dir: str):
    """IVF ANN with deterministic centroids (the vectors with vec_id <
    _IVF_NC): assignment, probe order and in-bucket scan are all
    closed-form over the embeddings table (rounded cosine, ties to the
    lowest centroid index), so the oracle replays the whole index in SQL."""
    from datax_ray.ops.similarity import knn_ivf

    path = os.path.join(sf_dir, "embeddings.parquet")
    qtab = pq.read_table(path, columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", _KNN_Q)])
    ctab = pq.read_table(path, columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", _IVF_NC)]).sort_by("vec_id")
    qids = np.asarray(qtab["vec_id"])
    qmat = np.stack(qtab["embedding"].to_numpy(zero_copy_only=False))
    cmat = np.stack(ctab["embedding"].to_numpy(zero_copy_only=False))
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_ivf(ds, qids, qmat, k=_KNN_K, n_probe=_IVF_NPROBE,
                   centroids=cmat)


_KLL_QS = (0.1, 0.25, 0.5, 0.75, 0.9)
_KLL_EPS = 0.02  # KLL k=256 rank error ~1.7/k ≈ 0.0067; 3× headroom


def q_sketch_quantiles(sf_dir: str):
    """KLL quantile-sketch accuracy gate. The sketch's approx values are
    compaction-randomized (deterministic per pipeline, but not SQL-
    reproducible), so the STABLE output is the contract: for each q the
    exact rank of the sketch's answer must sit within eps·n of q·n —
    asserted in-pipeline with one extra vectorized counting pass; the
    oracle states the bound (q, TRUE). A bound violation flips ok=false
    and hash-mismatches."""
    import ray

    from datax_ray.ops.sketch import distributed_quantiles

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    approx = np.asarray(distributed_quantiles(ds, "o_totalprice",
                                              list(_KLL_QS), k=256))
    vref = ray.put(approx)

    def count_le(t: pa.Table) -> pa.Table:
        x = np.asarray(t["o_totalprice"])
        v = ray.get(vref)
        le = (x[:, None] <= v[None, :]).sum(axis=0).astype(np.int64)
        return pa.table(
            {**{f"le_{i}": pa.array([le[i]]) for i in range(len(v))},
             "n": pa.array([len(x)], pa.int64())}
        )

    cols = [f"le_{i}" for i in range(len(_KLL_QS))] + ["n"]
    sums = _read(sf_dir, "orders", columns=["o_totalprice"]).map_batches(
        count_le, batch_format="pyarrow", zero_copy_batch=True
    ).sum(cols)
    n = sums["sum(n)"]
    ok = [
        abs(sums[f"sum(le_{i})"] - q * n) <= _KLL_EPS * n
        for i, q in enumerate(_KLL_QS)
    ]
    return pa.table({"q": pa.array(_KLL_QS, pa.float64()),
                     "ok": pa.array(ok, pa.bool_())})


def q_hll_distinct(sf_dir: str):
    """HLL distinct-count accuracy gate: the one-pass zero-shuffle HLL
    (p=12, σ≈1.6%) must land within 5% of the exact distinct count, which
    the engine computes independently (groupby row count) and the oracle
    recomputes in SQL — so the exact path is hash-checked AND the sketch
    bound is enforced in-pipeline."""
    from datax_ray.ops.sketch import distributed_distinct_count

    est = distributed_distinct_count(
        _read(sf_dir, "events", columns=["user_id"]), "user_id", p=12
    )
    exact = (
        _read(sf_dir, "events", columns=["user_id"])
        .groupby("user_id").count().count()
    )
    ok = abs(est - exact) <= 0.05 * exact
    return pa.table({"col": pa.array(["user_id"], pa.string()),
                     "n_distinct": pa.array([exact], pa.int64()),
                     "ok": pa.array([ok], pa.bool_())})


_RSV_K = 100


def q_reservoir_sample(sf_dir: str):
    """Fixed-k uniform reservoir sample gate. The selection depends on
    block content (seeded per-block keys), so it is not SQL-reproducible;
    the oracled contract is: exactly k rows, all distinct, all present in
    the source key set (membership checked against the small key column
    here; at scale this check is the broadcast semi-join,
    ops/joins.semi_filter)."""
    from datax_ray.ops.sample import reservoir_sample

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])
    t = reservoir_sample(ds, k=_RSV_K, seed=4)
    keys = np.asarray(t["o_orderkey"]) if t is not None else np.array([])
    src = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_orderkey"])["o_orderkey"]
    ok = (
        len(keys) == _RSV_K
        and len(np.unique(keys)) == _RSV_K
        and bool(np.isin(keys, np.asarray(src)).all())
    )
    return pa.table({"k": pa.array([_RSV_K], pa.int64()),
                     "n": pa.array([len(keys)], pa.int64()),
                     "ok": pa.array([ok], pa.bool_())})


def q_connected_components(sf_dir: str):
    """Distributed min-label connected components (pointer-jumping label
    propagation, ops/dedup.py:connected_components_distributed) over the
    exact near-dup pair set — the 'keep one per near-dup cluster'
    primitive. Oracle: DuckDB WITH RECURSIVE transitive closure, component
    = min reachable id."""
    from datax_ray.ops.dedup import connected_components_distributed

    return connected_components_distributed(
        q_embedding_neardup_exact(sf_dir), num_partitions=8
    )


# LSH pipelines — oracled via engine-signature fixtures (ops/lsh_fixture):
# the query runs the FULL text→signature→band→bucket→verify pipeline over
# sf documents; the oracle replays band→bucket→pair→verify in SQL over the
# fixture parquet holding the same deterministic signatures. The raw
# signature kernels stay pytest-covered (they're not SQL-expressible).
def q_minhash_lsh_pairs(sf_dir: str):
    from datax_ray.ops.lsh_fixture import MINHASH_PARAMS, ensure_lsh_fixture

    ensure_lsh_fixture(sf_dir)  # for the oracle side; marker-cached
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=8)
    p = MINHASH_PARAMS
    return minhash_lsh_candidates(
        ds, num_perm=p["num_perm"], bands=p["bands"],
        shingle_k=p["shingle_k"], threshold=p["threshold"], seed=p["seed"],
    )


def q_simhash_pairs(sf_dir: str):
    from datax_ray.ops.lsh_fixture import SIMHASH_MAX_HAMMING, ensure_lsh_fixture

    ensure_lsh_fixture(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=8)
    return simhash_candidates(ds, max_hamming=SIMHASH_MAX_HAMMING)


def q_embedding_neardup(sf_dir: str):
    # threshold sits inside the data's actual cosine range (synthetic
    # embeddings top out ~0.51 pairwise) so the LSH+verify path is
    # exercised non-degenerately; n_bits low → decent recall at this θ
    from datax_ray.ops.lsh_fixture import NEARDUP_PARAMS, ensure_planes_fixture

    ensure_planes_fixture()  # hyperplane table for the oracle side
    p = NEARDUP_PARAMS
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               num_blocks=8)
    return embedding_neardup_pairs(ds, dim=p["dim"], n_bits=p["n_bits"],
                                   threshold=p["threshold"], seed=p["seed"])


def _media_read(name: str, n_blocks: int):
    """Read one media fixture parquet as a Dataset with enough input blocks
    to feed the stage's actor pool (silences Ray's min-actors>inputs
    warning at tiny scale; at real scale the reader produces many blocks
    naturally)."""
    from datax_ray.ops.multimodal import ensure_media_fixture

    d = ensure_media_fixture()
    return _rd().read_parquet(os.path.join(d, name),
                              override_num_blocks=n_blocks)


_NDUP_N = 256
_NDUP_T = 0.40


def q_embedding_neardup_exact(sf_dir: str):
    """Exact all-pairs cosine near-dup on a bounded id slice — the
    brute-force baseline the LSH path approximates (and the oracle for
    the cosine math itself). The slice matrix is broadcast once
    (ray.put); each batch emits only its own ids' pairs (id_a < id_b), so
    every pair surfaces exactly once with no shuffle."""
    import ray

    from datax_ray.ops.similarity import _as_matrix, _unit

    qtab = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"], filters=[("vec_id", "<", _NDUP_N)],
    )
    all_ids = np.asarray(qtab["vec_id"])
    all_unit = _unit(_as_matrix(qtab["embedding"]))
    ref = ray.put((all_ids, all_unit))

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        ids_b, unit_all = ray.get(ref)
        my_ids = np.asarray(t["vec_id"])
        my_unit = _unit(_as_matrix(t["embedding"]))
        cos = np.round(my_unit @ unit_all.T, 6)
        ia, ib = np.nonzero((my_ids[:, None] < ids_b[None, :])
                            & (cos >= _NDUP_T))
        if len(ia) == 0:
            return empty
        return pa.table(
            {"id_a": pa.array(my_ids[ia]), "id_b": pa.array(ids_b[ib]),
             "cosine": pa.array(cos[ia, ib])}
        )

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               filter=pc.field("vec_id") < _NDUP_N)
    return ds.map_batches(pairs, batch_format="pyarrow")


def q_multimodal_features(sf_dir: str):
    """Image actor-pool stage over the deterministic fixture parquet.
    The feature vectors themselves are non-SQL (stub codec) — the oracled
    projection is the metadata the stage derives (payload byte length)."""
    from datax_ray.ops.multimodal import extract_image_features

    out = extract_image_features(_media_read("media.parquet", 4),
                                 feature_dim=8, concurrency=2, batch_size=64)
    return out.map_batches(
        lambda t: t.select(["media_id", "mime", "n_bytes"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_multimodal_audio(sf_dir: str):
    """Audio actor-pool stage; oracled on (media_id, mime, duration_s) —
    duration is n_samples / sample_rate rounded half-away to 6 digits,
    which DuckDB reproduces exactly over the same fixture parquet."""
    from datax_ray.ops.multimodal import extract_audio_features

    out = extract_audio_features(_media_read("audio.parquet", 4),
                                 feature_dim=8, concurrency=2, batch_size=64)
    return out.map_batches(
        lambda t: t.select(["media_id", "mime", "duration_s"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_multimodal_frames(sf_dir: str):
    """Video frame-sampling explode; oracled on (media_id, frame_idx,
    ts_ms) — the integer pick rule i*(nf-1)//(k'-1) and floor(ts) are
    closed-form over (n_frames, fps), replicated in SQL."""
    from datax_ray.ops.multimodal import sample_video_frames

    out = sample_video_frames(_media_read("video.parquet", 4),
                              k=4, concurrency=2, batch_size=32)
    return out.map_batches(
        lambda t: t.select(["media_id", "frame_idx", "ts_ms"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_cdc_schema_evolution(sf_dir: str):
    """Schema evolution through the real merge: events past the midpoint
    carry a new nullable column; result keeps evolved schema with
    null-filled history (engine-verified; rows-only driver check)."""
    meta = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
    mid = meta.num_rows // 2  # evolution point scales with the data

    def evolve(t: pa.Table) -> pa.Table:
        t = derive_changelog_batch(t)
        lsn = np.asarray(t["lsn"])
        extra = np.where(
            (lsn >= mid) & np.asarray(pc.is_valid(t["role"])),
            np.char.add("arg_", lsn.astype("U20")).astype(object),
            None,
        )
        return t.append_column("tool_args", pa.array(extra, pa.string()))

    ds = _read(sf_dir, "events", columns=_EVENT_COLS).map_batches(
        evolve, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = lww_merge(ds, num_partitions=16)
    return merged.map_batches(
        lambda t: t.select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_args"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_cdc_bootstrap_tail(sf_dir: str):
    """The classic DataX deployment: full batch copy then incremental tail.
    Base = LWW fold of the first half of the changelog written as a
    transcripts table; bootstrap_lake loads it as partition base files
    (op='I', lsn=-1); replay_files applies the second half on top; the lake
    read folds base+deltas. Oracle: fold of (base rows at lsn=-1 ∪ tail
    events) — base rows keep their ORIGINAL ts, so an out-of-order tail
    event older than the base row correctly loses LWW."""
    from datax_ray.cdc.bootstrap import bootstrap_lake
    from datax_ray.cdc.replay import replay_files
    from datax_ray.sinks.lake import read_lake_table

    meta = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
    n = meta.num_rows
    mid = n // 2
    work = f"/tmp/datax_ray_q/bootstrap_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(work, ignore_errors=True)
    base_dir = os.path.join(work, "base")
    tail_dir = os.path.join(work, "tail")
    lake = os.path.join(work, "lake")

    first = _changelog(sf_dir).filter(expr=f"lsn < {mid}")
    lww_merge(first, num_partitions=8).write_parquet(base_dir)
    _changelog(sf_dir).filter(expr=f"lsn >= {mid}").write_parquet(tail_dir)

    bootstrap_lake(base_dir, lake, num_partitions=8)
    replay_files(tail_dir, lake_dir=lake, max_lsn_exclusive=n,
                 num_partitions=8, compact_every=0)
    out = read_lake_table(lake).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return out


def q_cdc_time_travel(sf_dir: str):
    """Snapshot-as-of-epoch read: replay the derived changelog into a lake
    in 4 committed epochs, then read the state AS OF epoch 1 (the first
    half of the log) — the manifest's offset→epoch→files lineage IS the
    snapshot index. Oracle: LWW fold of events with lsn < n/2."""
    from datax_ray.cdc.replay import replay_files
    from datax_ray.sinks.lake import read_lake_table

    meta = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
    n = meta.num_rows
    work = f"/tmp/datax_ray_q/timetravel_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(work, ignore_errors=True)
    cl_dir = os.path.join(work, "cl")
    lake = os.path.join(work, "lake")
    _changelog(sf_dir).write_parquet(cl_dir)
    replay_files(cl_dir, lake_dir=lake, max_lsn_exclusive=n,
                 num_partitions=8, epoch_size=(n + 3) // 4, compact_every=0)
    out = read_lake_table(lake, as_of_epoch=1).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return out


def q_cdc_backfill(sf_dir: str):
    """Partition-parallel lake BACKFILL (sinks/lake.backfill): replay the
    derived changelog into a lake, then patch a derived column
    (text_len) onto every live row in place — one fold+rewrite task per
    partition, per-partition manifest commits (the resume unit),
    tombstones retained. Oracle: the LWW fold plus length(text)."""
    from datax_ray.cdc.replay import replay_files
    from datax_ray.sinks.lake import backfill, read_lake_table

    meta = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
    n = meta.num_rows
    work = f"/tmp/datax_ray_q/backfill_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(work, ignore_errors=True)
    cl_dir = os.path.join(work, "cl")
    lake = os.path.join(work, "lake")
    _changelog(sf_dir).write_parquet(cl_dir)
    replay_files(cl_dir, lake_dir=lake, max_lsn_exclusive=n,
                 num_partitions=8, epoch_size=(n + 1) // 2, compact_every=0)

    def add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "text_len", pc.cast(pc.utf8_length(t["text"]), pa.int64()))

    backfill(lake, add_len, tag="textlen")
    return read_lake_table(lake).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts", "text_len"])


def q_cdc_table_changes(sf_dir: str):
    """Change-data-feed OUT of the lake (sinks/lake.table_changes): replay
    the derived changelog in 4 committed epochs, then emit the I/U/D set
    that takes the epoch-1 snapshot to the final state — the Delta-CDF
    analogue, one full-outer key join per partition, no shuffle. Oracle:
    full join of the two LWW-folded states classified by winner (ts, lsn)
    change."""
    from datax_ray.cdc.replay import replay_files
    from datax_ray.sinks.lake import table_changes

    meta = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
    n = meta.num_rows
    work = f"/tmp/datax_ray_q/tablechanges_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(work, ignore_errors=True)
    cl_dir = os.path.join(work, "cl")
    lake = os.path.join(work, "lake")
    _changelog(sf_dir).write_parquet(cl_dir)
    replay_files(cl_dir, lake_dir=lake, max_lsn_exclusive=n,
                 num_partitions=8, epoch_size=(n + 3) // 4, compact_every=0)
    out = table_changes(lake, from_epoch=1, to_epoch=None)
    return out.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "change_op", "role",
                            "text", "tool", "ts", "lsn"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_time_travel_retained(sf_dir: str):
    """Time travel SURVIVING compaction: replay in 8 epochs with
    compaction every 4 foldable deltas and ``keep_epochs=3`` retention
    (the Iceberg/Delta snapshot-expiry contract), then read AS OF epoch 5.
    Compaction folds epochs ≤ 3 into a base, but the retained window keeps
    the requested snapshot reconstructable (base-3 + delta-4 + delta-5).
    Oracle: LWW fold of the first 6/8 of the log."""
    from datax_ray.cdc.replay import replay_files
    from datax_ray.sinks.lake import read_lake_table

    meta = pq.read_metadata(os.path.join(sf_dir, "events.parquet"))
    n = meta.num_rows
    work = f"/tmp/datax_ray_q/ttret_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(work, ignore_errors=True)
    cl_dir = os.path.join(work, "cl")
    lake = os.path.join(work, "lake")
    _changelog(sf_dir).write_parquet(cl_dir)
    replay_files(cl_dir, lake_dir=lake, max_lsn_exclusive=n,
                 num_partitions=8, epoch_size=(n + 7) // 8,
                 compact_every=4, keep_epochs=3)
    return read_lake_table(lake, as_of_epoch=5).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_cdc_cell_versions(sf_dir: str):
    """MULTI_VERSION export (otsstreamreader README.md:84-127): row events
    exploded into per-cell version records + row-delete markers."""
    from datax_ray.cdc.cells import cell_changelog

    return cell_changelog(_changelog(sf_dir))


def q_cdc_cell_assemble(sf_dir: str):
    """Cell-version round trip: explode to cells, then reassemble final row
    state with cell-granularity LWW (a row delete kills only cell versions
    older than it; later puts resurrect the row cell-by-cell)."""
    from datax_ray.cdc.cells import assemble_cells, cell_changelog

    return assemble_cells(cell_changelog(_changelog(sf_dir)), num_partitions=16)


# ------------------------------------------------------------------ oracle
_Q1_SQL = """
WITH {cte}
{fold}
""".strip()


def _fold_sql(extra_cte: str = "", src: str = "changelog", where: str = "") -> str:
    cte = CHANGELOG_CTE + extra_cte
    fold = LWW_FOLD_SQL.format(src=src)
    if where:
        fold = fold.replace("FROM {0})".format(src), f"FROM {src} WHERE {where})")
    return "WITH " + cte.strip() + "\n" + fold


#: SQL twin of cells.explode_cells over the derived changelog — per-cell
#: puts for each non-null written column + one DR marker per row delete
_CELLS_CTE = """
 cells AS (
   SELECT conv_id, turn_idx, 'role' AS col_name, role AS col_value,
          ts, lsn, 'U' AS cell_op
   FROM changelog WHERE op <> 'D' AND role IS NOT NULL
   UNION ALL
   SELECT conv_id, turn_idx, 'text', text, ts, lsn, 'U'
   FROM changelog WHERE op <> 'D' AND text IS NOT NULL
   UNION ALL
   SELECT conv_id, turn_idx, 'tool', tool, ts, lsn, 'U'
   FROM changelog WHERE op <> 'D' AND tool IS NOT NULL
   UNION ALL
   SELECT conv_id, turn_idx, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
          ts, lsn, 'DR'
   FROM changelog WHERE op = 'D')"""

#: exact all-pairs near-dup SQL — shared by embedding_neardup_exact and the
#: connected_components oracle (whose edges are exactly this pair set)
_NDUP_EXACT_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < {_NDUP_N} AND b.vec_id < {_NDUP_N}
  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6)
      >= {_NDUP_T}
""".strip()

ORACLES: dict[str, str] = {
    "cdc_lww_merge": _fold_sql(),
    "cdc_lww_merge_salted": _fold_sql(),
    "cdc_dup_redelivery": _fold_sql(
        extra_cte=""",
 with_dups AS (
   SELECT * FROM changelog
   UNION ALL SELECT * FROM changelog WHERE lsn % 7 = 0)""",
        src="with_dups",
    ),
    "cdc_window": _fold_sql(
        where=(
            f"ts >= TIMESTAMP '{_WINDOW[0]}' AND ts < TIMESTAMP '{_WINDOW[1]}'"
        )
    ),
    "cdc_backfill": ("WITH " + CHANGELOG_CTE.strip() + """
SELECT conv_id, turn_idx, role, text, tool, ts,
       CAST(length(text) AS BIGINT) AS text_len FROM (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM changelog)
WHERE rn = 1 AND op <> 'D'
"""),
    "cdc_op_counts": (
        "WITH " + CHANGELOG_CTE.strip()
        + "\nSELECT op, count(*) AS n FROM changelog GROUP BY op"
    ),
    "cdc_scd2_history": (
        "WITH " + CHANGELOG_CTE.strip() + """,
ordered AS (
  SELECT *,
    lead(ts)  OVER w AS valid_to,
    lead(lsn) OVER w AS closed_by_lsn
  FROM changelog
  WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY ts, lsn))
SELECT conv_id, turn_idx, role, text, tool,
  ts AS valid_from, valid_to, lsn AS version_lsn, closed_by_lsn,
  (valid_to IS NULL) AS is_current
FROM ordered WHERE op <> 'D'
"""
    ),
    # evolution point = num_rows // 2 (q_cdc_schema_evolution), tool_args is
    # a CASE over (lsn, role); fold then keeps the winner's evolved columns
    "cdc_schema_evolution": (
        "WITH " + CHANGELOG_CTE.strip() + """,
 evolved AS (
   SELECT *, CASE WHEN lsn >= (SELECT count(*) // 2 FROM events)
                   AND role IS NOT NULL
              THEN 'arg_' || CAST(lsn AS VARCHAR) END AS tool_args
   FROM changelog)
SELECT conv_id, turn_idx, role, text, tool, ts, tool_args FROM (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM evolved)
WHERE rn = 1 AND op <> 'D'
"""
    ),
    "cdc_bootstrap_tail": (
        "WITH " + CHANGELOG_CTE.strip() + """,
 base AS (
   SELECT conv_id, turn_idx, role, text, tool, ts FROM (
     SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                  ORDER BY ts DESC, lsn DESC) AS rn
     FROM changelog WHERE lsn < (SELECT count(*) // 2 FROM events))
   WHERE rn = 1 AND op <> 'D'),
 combined AS (
   SELECT 'I' AS op, conv_id, turn_idx, role, text, tool, ts,
          CAST(-1 AS BIGINT) AS lsn FROM base
   UNION ALL
   SELECT op, conv_id, turn_idx, role, text, tool, ts, lsn
   FROM changelog WHERE lsn >= (SELECT count(*) // 2 FROM events))
SELECT conv_id, turn_idx, role, text, tool, ts FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM combined)
WHERE rn = 1 AND op <> 'D'
"""
    ),
    "cdc_time_travel": (
        "WITH " + CHANGELOG_CTE.strip() + """
SELECT conv_id, turn_idx, role, text, tool, ts FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM changelog
  WHERE lsn < 2 * (((SELECT count(*) FROM events) + 3) // 4))
WHERE rn = 1 AND op <> 'D'
"""
    ),
    "cdc_table_changes": (
        "WITH " + CHANGELOG_CTE.strip() + """,
es AS (SELECT (((SELECT count(*) FROM events) + 3) // 4) AS sz),
sa AS (
  SELECT conv_id, turn_idx, ts, lsn FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY ts DESC, lsn DESC) AS rn
    FROM changelog WHERE lsn < 2 * (SELECT sz FROM es))
  WHERE rn = 1 AND op <> 'D'),
sb AS (
  SELECT conv_id, turn_idx, role, text, tool, ts, lsn FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY ts DESC, lsn DESC) AS rn
    FROM changelog)
  WHERE rn = 1 AND op <> 'D')
SELECT coalesce(b.conv_id, a.conv_id) AS conv_id,
       coalesce(b.turn_idx, a.turn_idx) AS turn_idx,
       CASE WHEN a.lsn IS NULL THEN 'I'
            WHEN b.lsn IS NULL THEN 'D' ELSE 'U' END AS change_op,
       b.role, b.text, b.tool, b.ts, b.lsn
FROM sb b FULL JOIN sa a
  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
WHERE a.lsn IS NULL OR b.lsn IS NULL
   OR a.lsn <> b.lsn OR a.ts <> b.ts
"""
    ),
    "cdc_time_travel_retained": (
        "WITH " + CHANGELOG_CTE.strip() + """
SELECT conv_id, turn_idx, role, text, tool, ts FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM changelog
  WHERE lsn < 6 * (((SELECT count(*) FROM events) + 7) // 8))
WHERE rn = 1 AND op <> 'D'
"""
    ),
    "cdc_cell_versions": (
        "WITH " + CHANGELOG_CTE.strip() + "," + _CELLS_CTE
        + "\nSELECT * FROM cells"
    ),
    "cdc_cell_assemble": (
        "WITH " + CHANGELOG_CTE.strip() + "," + _CELLS_CTE + """,
 rowops AS (
   SELECT conv_id, turn_idx, ts, lsn,
          CASE WHEN cell_op = 'DR' THEN 'D' ELSE 'I' END AS op FROM cells),
 alive AS (
   SELECT conv_id, turn_idx, ts, lsn FROM (
     SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                  ORDER BY ts DESC, lsn DESC) AS rn
     FROM rowops)
   WHERE rn = 1 AND op <> 'D'),
 marked AS (
   SELECT conv_id, turn_idx, col_name, col_value, ts, lsn, 'I' AS op
   FROM cells WHERE cell_op = 'U'
   UNION ALL
   SELECT c.conv_id, c.turn_idx, v.col_name, CAST(NULL AS VARCHAR),
          c.ts, c.lsn, 'D'
   FROM cells c CROSS JOIN
        (SELECT unnest(['role', 'text', 'tool']) AS col_name) v
   WHERE c.cell_op = 'DR'),
 won AS (
   SELECT conv_id, turn_idx, col_name, col_value FROM (
     SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx, col_name
                                  ORDER BY ts DESC, lsn DESC) AS rn
     FROM marked)
   WHERE rn = 1 AND op <> 'D')
SELECT a.conv_id, a.turn_idx,
       r.col_value AS role, t.col_value AS text, tl.col_value AS tool,
       a.ts, a.lsn
FROM alive a
LEFT JOIN won r  ON r.conv_id = a.conv_id AND r.turn_idx = a.turn_idx
               AND r.col_name = 'role'
LEFT JOIN won t  ON t.conv_id = a.conv_id AND t.turn_idx = a.turn_idx
               AND t.col_name = 'text'
LEFT JOIN won tl ON tl.conv_id = a.conv_id AND tl.turn_idx = a.turn_idx
               AND tl.col_name = 'tool'
"""
    ),
    "dx_substr": (
        "SELECT doc_id, substr(text, 6, 20) AS text_sub "
        "FROM documents WHERE length(text) >= 5"
    ),
    "dx_pad": "SELECT p_partkey, rpad(p_brand, 10, '*') AS brand_pad FROM part",
    "dx_replace": (
        "SELECT p_partkey, substr(p_type, 1, 4) || 'XYZ' || substr(p_type, 8) "
        "AS type_repl FROM part WHERE length(p_type) >= 4"
    ),
    "dx_filter_like": (
        "SELECT doc_id, text FROM documents "
        "WHERE NOT regexp_full_match(text, 'the.*')"
    ),
    "transform_chain": (
        "WITH s AS (SELECT doc_id, substr(text, 1, 40) AS t FROM documents) "
        "SELECT doc_id, rpad(t, 40, '_') AS text_out FROM s "
        "WHERE NOT regexp_full_match(t, '.*data.*')"
    ),
    "copy_project_filter": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
        "FROM lineitem WHERE NOT (l_quantity >= 25)"
    ),
    "csv_roundtrip": (
        # l_linenumber CAST: the CSV 'long' type reads back int64 while the
        # raw parquet column is int32
        "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
        "l_returnflag, l_shipdate FROM lineitem"
    ),
    "csv_snappy_roundtrip": (
        "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, "
        "CAST(s_nationkey AS BIGINT) AS s_nationkey FROM supplier"
    ),
    "csv_lzo_roundtrip": (
        "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name "
        "FROM nation"
    ),
    "seq_roundtrip": (
        "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name "
        "FROM region"
    ),
    "rc_roundtrip": (
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, "
        "c_mktsegment FROM customer"
    ),
    "querysql_read": """
SELECT o_orderpriority, count(*) AS n,
  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders GROUP BY o_orderpriority
""".strip(),
    "orc_roundtrip": (
        "SELECT s_suppkey, s_name, s_acctbal FROM supplier"
    ),
    "stream_constants": (
        "SELECT 'hello' AS c_str, CAST(42 AS BIGINT) AS c_long, "
        "3.14 AS c_double, TRUE AS c_bool, "
        "TIMESTAMP '2024-01-01 00:00:00' AS c_date FROM range(1000)"
    ),
    # NOTE: DuckDB sum(BIGINT) returns HUGEINT (→ float64 in pandas); every
    # sum below is CAST back to BIGINT so dtypes match the engine's int64.
    "agg_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
      AS sum_base_cents,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
      AS BIGINT) AS sum_disc_cents,
  count(*) AS count_order,
  round(sum(CAST(l_quantity AS BIGINT)) / CAST(count(*) AS DOUBLE), 6) AS avg_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
""".strip(),
    "events_windowed_agg": """
SELECT event_type, date_trunc('hour', ts) AS window, count(*) AS n,
  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type, date_trunc('hour', ts)
""".strip(),
    "events_sliding_agg": """
SELECT event_type,
  (epoch_us(ts) // 3600000000) * 3600000000 - i.i * 3600000000 AS window_us,
  count(*) AS n,
  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) i
GROUP BY 1, 2
""".strip(),
    "events_sessionize": """
WITH d AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id, ts,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
      FROM d)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
""".strip(),
    "topk_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "curation_pipeline": r"""
WITH lang AS (
  SELECT doc_id, text,
    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|mit|für)\b')) AS de,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|with)\b')) AS en,
    len(regexp_extract_all(lower(text), '\b(el|la|los|y|es|una|para|con|que)\b')) AS es,
    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|pour|dans|que)\b')) AS fr
  FROM documents),
en_docs AS (
  SELECT doc_id, text FROM lang
  WHERE NOT (de = 0 AND en = 0 AND es = 0 AND fr = 0)
    AND NOT (de >= en AND de >= es AND de >= fr)
    AND (en >= es AND en >= fr)),
q AS (
  SELECT doc_id, text,
    round(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]'))
          / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
    round(len(regexp_extract_all(lower(text),
          '\b(the|and|of|to|in|is|that|for|with)\b'))
          / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0), 6)
          AS stopword_ratio,
    round(CAST(length(text) AS DOUBLE)
          / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0), 6)
          AS mean_token_len
  FROM en_docs),
kept AS (
  SELECT doc_id, text FROM q
  WHERE punct_ratio < 0.1 AND stopword_ratio > 0.05 AND mean_token_len < 12.0),
fp AS (
  SELECT doc_id, text,
    md5(regexp_replace(regexp_replace(lower(text), '\s+', ' ', 'g'),
        '^ | $', '', 'g')) AS f
  FROM kept),
deduped AS (
  SELECT doc_id, text FROM fp
  WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
w AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks FROM deduped
), c AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks) = 0 THEN 0
         WHEN len(toks) <= 32 THEN 1
         ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1 END AS nc
  FROM w), x AS (
  SELECT doc_id, toks, n, unnest(range(nc)) AS i FROM c)
SELECT doc_id, i AS chunk_idx,
  least(i * 24 + 32, n) - i * 24 AS n_tokens,
  array_to_string(toks[i * 24 + 1 : least(i * 24 + 32, n)], ' ')
    AS chunk_text
FROM x
""".strip(),
    "lookup_enrich": """
SELECT o_orderkey, o_custkey, c_mktsegment, c_nationkey, n_name
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
""".strip(),
    "grouped_topk_orders": """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""".strip(),
    "window_user_activity": """
SELECT user_id, event_id, event_id % 97 AS vi,
  row_number() OVER w AS rn,
  rank() OVER (PARTITION BY user_id ORDER BY event_id % 97) AS rk,
  dense_rank() OVER (PARTITION BY user_id ORDER BY event_id % 97) AS dr,
  ntile(4) OVER w AS nt,
  percent_rank() OVER (PARTITION BY user_id ORDER BY event_id % 97) AS pr,
  cume_dist() OVER (PARTITION BY user_id ORDER BY event_id % 97) AS cd,
  lag(event_id % 97, 1) OVER w AS prev_vi,
  lead(event_id % 97, 1) OVER w AS next_vi,
  CAST(sum(event_id % 97) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS DOUBLE) AS cum_vi,
  avg(event_id % 97) OVER (w ROWS BETWEEN 3 PRECEDING
                           AND CURRENT ROW) AS mv4
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id % 97, event_id)
""".strip(),
    "sample_hash": (
        "SELECT o_orderkey, o_totalprice FROM orders WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < '19999999'"
    ),
    "stratified_sample": """
SELECT o_custkey, o_orderkey FROM (
  SELECT o_custkey, o_orderkey, row_number() OVER (
    PARTITION BY o_custkey
    ORDER BY md5(CAST(o_custkey AS VARCHAR) || '|' ||
                 CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""".strip(),
    "distinct_counts": (
        "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment"
    ),
    "join_orders_mktsegment": (
        "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders "
        "JOIN customer ON o_custkey = c_custkey"
    ),
    "semi_join_orders": (
        "SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
    ),
    "anti_join_orders": (
        "SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
    ),
    "hash_join_lineitem": (
        "SELECT l_orderkey, l_linenumber, l_quantity, o_custkey, "
        "o_totalprice FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ),
    "asof_clicks_views": """
SELECT l.event_id, l.ts, l.user_id, r.ts AS ts_v, r.event_id AS event_id_v
FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT event_id, ts, user_id FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""".strip(),
    "asof_tolerance_broadcast": """
SELECT l.event_id, l.ts, l.user_id,
  CASE WHEN r.ts >= l.ts - INTERVAL 1 HOUR THEN r.ts END AS ts_v,
  CASE WHEN r.ts >= l.ts - INTERVAL 1 HOUR THEN r.event_id END AS event_id_v
FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT event_id, ts, user_id FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""".strip(),
    "interval_join_campaigns": """
WITH c AS (
  SELECT i AS campaign_id,
         TIMESTAMP '2024-01-01' + to_hours(33 * i) AS lo,
         TIMESTAMP '2024-01-01' + to_hours(33 * i + 24 + (7 * i) % 48) AS hi
  FROM range(20) t(i))
SELECT e.event_id, c.campaign_id, c.lo, c.hi
FROM events e JOIN c ON e.ts >= c.lo AND e.ts < c.hi
""".strip(),
    "group_quantiles": """
SELECT o_orderpriority, unnest([0.25, 0.5, 0.75]) AS q,
  round(unnest(quantile_cont(o_totalprice, [0.25, 0.5, 0.75])), 6) AS value
FROM orders GROUP BY o_orderpriority
""".strip(),
    "assemble_conversations": (
        "WITH " + CHANGELOG_CTE.strip() + """,
won AS (
  SELECT conv_id, turn_idx, text FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY ts DESC, lsn DESC) AS rn
    FROM changelog)
  WHERE rn = 1 AND op <> 'D')
SELECT conv_id, count(*) AS n_turns,
  string_agg(coalesce(text, ''), chr(10) ORDER BY turn_idx) AS full_text
FROM won GROUP BY conv_id
"""
    ),
    "ivm_conv_stats": (
        "WITH " + CHANGELOG_CTE.strip() + """,
won AS (
  SELECT conv_id, role, text, ts FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY ts DESC, lsn DESC) AS rn
    FROM changelog)
  WHERE rn = 1 AND op <> 'D')
SELECT conv_id, count(*) AS n_turns,
  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
  CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS text_chars,
  max(ts) AS last_ts
FROM won GROUP BY conv_id
"""
    ),
    "pack_documents": r"""
WITH t AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t)
SELECT doc_id, n_tokens,
  CAST(off // 256 AS BIGINT) AS bin_id,
  CAST(off % 256 AS BIGINT) AS bin_offset
FROM s
""".strip(),
    "chunk_documents": r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks FROM documents
), c AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks) = 0 THEN 0
         WHEN len(toks) <= 32 THEN 1
         ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1 END AS nc
  FROM w), x AS (
  SELECT doc_id, toks, n, unnest(range(nc)) AS i FROM c)
SELECT doc_id, i AS chunk_idx,
  least(i * 24 + 32, n) - i * 24 AS n_tokens,
  array_to_string(toks[i * 24 + 1 : least(i * 24 + 32, n)], ' ')
    AS chunk_text
FROM x
""".strip(),
    "ngram_jaccard_pairs": r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks FROM documents
), g AS (
  SELECT doc_id,
    CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')])
         ELSE list_distinct(list_transform(range(1, len(toks) - 1),
              i -> array_to_string(toks[i:i+2], ' ')))
    END AS grams
  FROM w WHERE len(toks) > 0
), e AS (
  SELECT doc_id, unnest(grams) AS gram, len(grams) AS sz FROM g
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(count(*) / CAST(a.sz + b.sz - count(*) AS DOUBLE), 6) AS jaccard
FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
HAVING count(*) / CAST(a.sz + b.sz - count(*) AS DOUBLE) >= 0.1
""".strip(),
    "token_budget_head": r"""
WITH tok AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents),
run AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
  FROM tok)
SELECT doc_id, n_tokens, CAST(running_total AS BIGINT) AS running_total
FROM run WHERE running_total <= 20000
""".strip(),
    "late_events": (
        "WITH " + CHANGELOG_CTE.strip() + """,
j AS (
  SELECT lsn, ts - INTERVAL 1 MINUTE * ((lsn * 17) % 64) AS ev_ts
  FROM changelog),
w AS (
  SELECT lsn, ev_ts,
    max(ev_ts) OVER (ORDER BY lsn
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM j)
SELECT lsn, ev_ts,
  CASE WHEN wm IS NULL THEN FALSE
       ELSE ev_ts < wm - INTERVAL 600 SECOND END AS is_late
FROM w
"""
    ),
    "kmeans_embeddings": """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings),
c0 AS (SELECT vec_id AS cluster, e FROM v WHERE vec_id < 8),
a1 AS (
  SELECT v.vec_id, arg_min(c0.cluster, list_distance(v.e, c0.e)) AS cluster
  FROM v CROSS JOIN c0 GROUP BY v.vec_id),
u1 AS (
  SELECT cluster, list(m ORDER BY dim) AS e
  FROM (
    SELECT cluster, dim, avg(val) AS m
    FROM (
      SELECT a1.cluster, generate_subscripts(v.e, 1) AS dim,
             unnest(v.e) AS val
      FROM v JOIN a1 USING (vec_id))
    GROUP BY cluster, dim)
  GROUP BY cluster),
c1 AS (
  SELECT c0.cluster, COALESCE(u1.e, c0.e) AS e
  FROM c0 LEFT JOIN u1 USING (cluster)),
a2 AS (
  SELECT v.vec_id, arg_min(c1.cluster, list_distance(v.e, c1.e)) AS cluster
  FROM v CROSS JOIN c1 GROUP BY v.vec_id),
u2 AS (
  SELECT cluster, list(m ORDER BY dim) AS e
  FROM (
    SELECT cluster, dim, avg(val) AS m
    FROM (
      SELECT a2.cluster, generate_subscripts(v.e, 1) AS dim,
             unnest(v.e) AS val
      FROM v JOIN a2 USING (vec_id))
    GROUP BY cluster, dim)
  GROUP BY cluster),
c2 AS (
  SELECT c1.cluster, COALESCE(u2.e, c1.e) AS e
  FROM c1 LEFT JOIN u2 USING (cluster))
SELECT v.vec_id, arg_min(c2.cluster, list_distance(v.e, c2.e)) AS cluster
FROM v CROSS JOIN c2 GROUP BY v.vec_id
""".strip(),
    "profile_documents": """
SELECT 'doc_id' AS "column", count(*) AS n_rows,
  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(min(doc_id) AS VARCHAR) AS min_value,
  CAST(max(doc_id) AS VARCHAR) AS max_value,
  CAST(NULL AS BIGINT) AS len_sum
FROM documents
UNION ALL
SELECT 'text', count(*),
  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  min(text), max(text),
  CAST(sum(length(text)) AS BIGINT)
FROM documents
UNION ALL
SELECT 'lang', count(*),
  CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  min(lang), max(lang),
  CAST(sum(length(lang)) AS BIGINT)
FROM documents
UNION ALL
SELECT 'source', count(*),
  CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  min(source), max(source),
  CAST(sum(length(source)) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', count(*),
  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR),
  CAST(NULL AS BIGINT)
FROM documents
""".strip(),
    "bm25_scores": r"""
WITH t AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS DOUBLE) AS dl,
    CAST(len(regexp_extract_all(lower(coalesce(text, '')), '\btable\b')) AS DOUBLE) AS tf0,
    CAST(len(regexp_extract_all(lower(coalesce(text, '')), '\bscan\b')) AS DOUBLE) AS tf1,
    CAST(len(regexp_extract_all(lower(coalesce(text, '')), '\bmerge\b')) AS DOUBLE) AS tf2
  FROM documents),
st AS (
  SELECT
    CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
    ln((count(*) - sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) + 0.5e0)
       / (sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) + 0.5e0) + 1e0) AS idf0,
    ln((count(*) - sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) + 0.5e0)
       / (sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) + 0.5e0) + 1e0) AS idf1,
    ln((count(*) - sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) + 0.5e0)
       / (sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) + 0.5e0) + 1e0) AS idf2
  FROM t)
SELECT doc_id,
  round(
    (idf0 * (tf0 * (1.2e0 + 1e0)))
      / (tf0 + 1.2e0 * ((1e0 - 0.75e0) + (0.75e0 * dl) / avgdl))
  + (idf1 * (tf1 * (1.2e0 + 1e0)))
      / (tf1 + 1.2e0 * ((1e0 - 0.75e0) + (0.75e0 * dl) / avgdl))
  + (idf2 * (tf2 * (1.2e0 + 1e0)))
      / (tf2 + 1.2e0 * ((1e0 - 0.75e0) + (0.75e0 * dl) / avgdl)),
  6) AS bm25
FROM t, st
""".strip(),
    "incremental_dedup": """
WITH full_set AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
fp AS (
  SELECT doc_id,
    md5(regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),
        '^ | $', '', 'g')) AS f
  FROM full_set)
SELECT doc_id,
  min(doc_id) OVER (PARTITION BY f) AS first_doc_id,
  doc_id > min(doc_id) OVER (PARTITION BY f) AS is_dup
FROM fp
""".strip(),
    "dedup_exact": """
WITH fp AS (
  SELECT doc_id, text,
    md5(regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),
        '^ | $', '', 'g')) AS f
  FROM documents)
SELECT doc_id, text FROM fp
WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)
""".strip(),
    "text_tokens": r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
       AS BIGINT) AS n_bpe_tokens
FROM documents
""".strip(),
    "redact_pii": r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          text || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@mail.example.com tel +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' ssn 123-45-6789 ip 10.0.0.'
               || CAST(doc_id % 250 AS VARCHAR),
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\+?\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?', '<PHONE>', 'g'),
      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted
FROM documents
""".strip(),
    "repetition_ratio": r"""
SELECT doc_id,
  round(1.0 - CAST(cnt_d AS DOUBLE) / greatest(CAST(cnt AS DOUBLE), 1.0), 6)
    AS rep_ratio
FROM (
  SELECT doc_id, count(*) AS cnt, count(DISTINCT w) AS cnt_d
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
  GROUP BY doc_id)
""".strip(),
    "text_quality": r"""
SELECT doc_id,
  round(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]'))
        / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
  round(len(regexp_extract_all(lower(text),
        '\b(the|and|of|to|in|is|that|for|with)\b'))
        / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0), 6)
        AS stopword_ratio,
  round(CAST(length(text) AS DOUBLE)
        / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0), 6)
        AS mean_token_len
FROM documents
""".strip(),
    "quality_filter": """
WITH q AS (
  SELECT doc_id, text,
    round(len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]'))
          / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
    round(len(regexp_extract_all(lower(text),
          '\\b(the|and|of|to|in|is|that|for|with)\\b'))
          / greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0), 6)
          AS stopword_ratio,
    round(CAST(length(text) AS DOUBLE)
          / greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0), 6)
          AS mean_token_len
  FROM documents)
SELECT doc_id, text FROM q
WHERE punct_ratio < 0.1 AND stopword_ratio > 0.05 AND mean_token_len < 12.0
""".strip(),
    "text_langid": r"""
WITH c AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|mit|für)\b')) AS de,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|with)\b')) AS en,
    len(regexp_extract_all(lower(text), '\b(el|la|los|y|es|una|para|con|que)\b')) AS es,
    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|pour|dans|que)\b')) AS fr
  FROM documents)
SELECT doc_id, CASE
  WHEN de = 0 AND en = 0 AND es = 0 AND fr = 0 THEN 'unk'
  WHEN de >= en AND de >= es AND de >= fr THEN 'de'
  WHEN en >= es AND en >= fr THEN 'en'
  WHEN es >= fr THEN 'es'
  ELSE 'fr' END AS lang_pred
FROM c
""".strip(),
    "text_fingerprint": r"""
SELECT doc_id,
  md5(regexp_replace(regexp_replace(lower(text), '\s+', ' ', 'g'),
      '^ | $', '', 'g')) AS fingerprint
FROM documents
""".strip(),
    "text_winnow": r"""
WITH n AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(lower(text), '\s+', ' ', 'g'),
                   '^ | $', '', 'g') AS t
  FROM documents),
g AS (
  SELECT doc_id, i AS pos, substr(t, i, 8) AS gram
  FROM n, LATERAL (SELECT unnest(generate_series(1, greatest(length(t) - 7, 0))) AS i) s),
h AS (SELECT doc_id, pos, substr(md5(gram), 1, 15) AS hv FROM g),
wmin AS (SELECT doc_id, min(hv) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM h)
SELECT DISTINCT doc_id, fp FROM wmin
""".strip(),
    # multimodal oracles read the SAME deterministic fixture parquet the
    # queries run over (ensure_media_fixture writes it from either side);
    # feature/frame payload columns are stub-codec output and stay out of
    # the oracled projection
    "multimodal_features": (
        "SELECT media_id, mime, octet_length(payload) AS n_bytes "
        f"FROM read_parquet('{_MEDIA_DIR}/media.parquet')"
    ),
    "multimodal_audio": (
        "SELECT media_id, mime, "
        "round(n_samples / CAST(sample_rate AS DOUBLE), 6) AS duration_s "
        f"FROM read_parquet('{_MEDIA_DIR}/audio.parquet')"
    ),
    "multimodal_frames": """
WITH v AS (SELECT media_id, n_frames, fps
           FROM read_parquet('{d}/video.parquet') WHERE n_frames > 0),
p AS (SELECT media_id, n_frames, fps, i.i AS i
      FROM v CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
      WHERE i.i < least(4, n_frames)),
f AS (SELECT media_id,
        CAST(CASE WHEN least(4, n_frames) = 1 THEN 0
             ELSE (i * (n_frames - 1)) // (least(4, n_frames) - 1)
             END AS INTEGER) AS frame_idx,
        fps FROM p)
SELECT media_id, frame_idx,
       CAST(floor(frame_idx * 1000.0 / fps) AS BIGINT) AS ts_ms
FROM f
""".strip().format(d=_MEDIA_DIR),
    # accuracy-gate oracles: the sketch/sample VALUES are randomized (KLL
    # compaction offsets, per-block reservoir keys), so the oracle states
    # the deterministic CONTRACT the query asserts in-pipeline — any bound
    # violation flips ok=false and hash-mismatches. n_distinct in
    # hll_distinct is the engine's independent exact count, genuinely
    # hash-checked against SQL's count(DISTINCT).
    "sketch_quantiles": (
        "SELECT CAST(unnest(["
        + ", ".join(str(q) for q in _KLL_QS)
        + "]) AS DOUBLE) AS q, TRUE AS ok"
    ),
    "hll_distinct": (
        "SELECT 'user_id' AS col, count(DISTINCT user_id) AS n_distinct, "
        "TRUE AS ok FROM events"
    ),
    "reservoir_sample": (
        f"SELECT CAST({_RSV_K} AS BIGINT) AS k, "
        f"CAST({_RSV_K} AS BIGINT) AS n, TRUE AS ok"
    ),
    "embedding_neardup_exact": _NDUP_EXACT_SQL,
    "connected_components": f"""
WITH RECURSIVE pairs AS ({_NDUP_EXACT_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT rc.id, e.b FROM reach rc JOIN edges e ON e.a = rc.r)
SELECT id, min(r) AS component FROM reach GROUP BY id
""".strip(),
    "knn_bruteforce": f"""
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {_KNN_Q}),
s AS (SELECT q.qid, e.vec_id AS nid,
        round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) AS cos
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
      FROM s)
SELECT qid AS query_id, nid AS neighbor_id, cos AS cosine, rk AS "rank"
FROM r WHERE rk <= {_KNN_K}
""".strip(),
    # the IVF index replayed in SQL: same deterministic centroids (vec_id
    # < _IVF_NC), same rounded-cosine orderings with ties to the lowest
    # centroid index, same n_probe bucket scan + per-query top-k
    "knn_ivf": f"""
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
         CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id < {_IVF_NC}),
q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < {_KNN_Q}),
asg AS (
  SELECT vec_id, cidx FROM (
    SELECT e.vec_id, c.cidx, row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), c.ce), 6) DESC, c.cidx) AS rk
    FROM embeddings e CROSS JOIN cent c) WHERE rk = 1),
probe AS (
  SELECT qid, cidx FROM (
    SELECT q.qid, c.cidx, row_number() OVER (
      PARTITION BY q.qid
      ORDER BY round(list_cosine_similarity(q.qe, c.ce), 6) DESC,
               c.cidx) AS rk
    FROM q CROSS JOIN cent c) WHERE rk <= {_IVF_NPROBE}),
cand AS (
  SELECT q.qid, e.vec_id AS nid,
    round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6)
      AS cos
  FROM q JOIN probe p ON p.qid = q.qid
  JOIN asg a ON a.cidx = p.cidx
  JOIN embeddings e ON e.vec_id = a.vec_id AND e.vec_id <> q.qid),
r AS (SELECT *, row_number() OVER (PARTITION BY qid
        ORDER BY cos DESC, nid) AS rk FROM cand)
SELECT qid AS query_id, nid AS neighbor_id, cos AS cosine, rk AS "rank"
FROM r WHERE rk <= {_KNN_K}
""".strip(),
    # LSH oracles: band→bucket→pair→verify replayed in SQL over the
    # engine-signature fixture parquet for the driver's sf0.01 (the query
    # side ensures the fixture for whatever sf it runs at — see
    # ops/lsh_fixture.py docstring). The engine groups buckets by an FNV
    # fold of each band's {_MH_ROWS}-value segment; the SQL groups by the
    # segment VALUES themselves — identical co-membership modulo a 2^-64
    # hash collision. est ≥ threshold is the integer test matches ≥
    # {_MH_MINM} (exact; est = matches/{_MH_NP} has no rounding slack).
    "minhash_lsh_pairs": """
WITH s AS (SELECT doc_id, sig
           FROM read_parquet('{d}/minhash_sigs.parquet')),
bands AS (
  SELECT doc_id, b.b AS band,
         list_slice(sig, b.b*{rows}+1, b.b*{rows}+{rows}) AS key
  FROM s CROSS JOIN (SELECT unnest(range({bands})) AS b) b),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM bands a JOIN bands c
    ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id),
m AS (
  SELECT p.id_a, p.id_b,
    list_sum(list_transform(range(1, {np} + 1),
      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS matches
  FROM pairs p JOIN s sa ON sa.doc_id = p.id_a
               JOIN s sb ON sb.doc_id = p.id_b)
SELECT id_a, id_b, round(matches / {np}.0, 6) AS est_jaccard
FROM m WHERE matches >= {minm}
""".strip().format(
        d=_lsh_fixture_dir("/root/testdata/sf0.01"),
        rows=_MH["num_perm"] // _MH["bands"], bands=_MH["bands"],
        np=_MH["num_perm"],
        minm=int(round(_MH["threshold"] * _MH["num_perm"])),
    ),
    "simhash_pairs": """
WITH s AS (SELECT doc_id, simhash
           FROM read_parquet('{d}/simhash.parquet')),
bands AS (
  SELECT doc_id, simhash, b.b AS band,
         (simhash >> (16 * b.b)) & 65535 AS bv
  FROM s CROSS JOIN (SELECT unnest(range(4)) AS b) b)
SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
  CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
FROM bands a JOIN bands c
  ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id
WHERE bit_count(xor(a.simhash, c.simhash)) <= {maxham}
""".strip().format(d=_lsh_fixture_dir("/root/testdata/sf0.01"),
                   maxham=_SH_HAM),
    "embedding_neardup": """
WITH p AS (SELECT bit, plane FROM read_parquet('{planes}')),
c AS (SELECT e.vec_id,
        CAST(sum(CASE WHEN list_inner_product(
                   CAST(e.embedding AS DOUBLE[]), p.plane) > 0
             THEN 1 << p.bit ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN p GROUP BY e.vec_id)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a
JOIN c ca ON ca.vec_id = a.vec_id
JOIN embeddings b ON a.vec_id < b.vec_id
JOIN c cb ON cb.vec_id = b.vec_id AND cb.bucket = ca.bucket
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6)
      >= {thresh}
""".strip().format(planes=_planes_path(), thresh=_ND["threshold"]),
}

QUERIES = {
    # Driver-correctness rotation (r5): the driver checks the FIRST 50
    # entries per round; entries with no CORRECTNESS_r03/r04 row lead so
    # every operator accumulates a green driver row across rounds.
    "incremental_dedup": q_incremental_dedup,
    "bm25_scores": q_bm25_scores,
    "profile_documents": q_profile_documents,
    "kmeans_embeddings": q_kmeans_embeddings,
    "late_events": q_late_events,
    "token_budget_head": q_token_budget_head,
    "knn_ivf": q_knn_ivf,
    "sketch_quantiles": q_sketch_quantiles,
    "hll_distinct": q_hll_distinct,
    "reservoir_sample": q_reservoir_sample,
    "connected_components": q_connected_components,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_pairs": q_simhash_pairs,
    "embedding_neardup": q_embedding_neardup,
    "text_tokens": q_text_tokens,
    "redact_pii": q_redact_pii,
    "repetition_ratio": q_repetition_ratio,
    "text_quality": q_text_quality,
    "quality_filter": q_quality_filter,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_winnow": q_text_winnow,
    "knn_bruteforce": q_knn_bruteforce,
    "embedding_neardup_exact": q_embedding_neardup_exact,
    "multimodal_features": q_multimodal_features,
    "multimodal_audio": q_multimodal_audio,
    "multimodal_frames": q_multimodal_frames,
    "cdc_lww_merge": q_cdc_lww_merge,
    "cdc_backfill": q_cdc_backfill,
    "cdc_lww_merge_salted": q_cdc_lww_merge_salted,
    "cdc_dup_redelivery": q_cdc_dup_redelivery,
    "cdc_window": q_cdc_window,
    "cdc_op_counts": q_cdc_op_counts,
    "cdc_scd2_history": q_cdc_scd2_history,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    "cdc_cell_versions": q_cdc_cell_versions,
    "cdc_cell_assemble": q_cdc_cell_assemble,
    "cdc_bootstrap_tail": q_cdc_bootstrap_tail,
    "cdc_time_travel": q_cdc_time_travel,
    "cdc_table_changes": q_cdc_table_changes,
    "cdc_time_travel_retained": q_cdc_time_travel_retained,
    "dx_substr": q_dx_substr,
    # seq/rc_roundtrip are r5-new (pure-Python SEQ/RC containers) and
    # take these two first-50 slots from dx_pad/dx_replace, which are
    # double-green (r3 AND r4) — after r5 every query has a driver row.
    "seq_roundtrip": q_seq_roundtrip,
    "rc_roundtrip": q_rc_roundtrip,
    "dx_filter_like": q_dx_filter_like,
    "transform_chain": q_transform_chain,
    "csv_roundtrip": q_csv_roundtrip,
    "orc_roundtrip": q_orc_roundtrip,
    # csv_snappy/lzo_roundtrip are r5-new and have never had a driver row;
    # they take the last two first-50 slots from stream_constants and
    # agg_pricing_summary, which are double-green (r3 AND r4) already.
    "csv_snappy_roundtrip": q_csv_snappy_roundtrip,
    "csv_lzo_roundtrip": q_csv_lzo_roundtrip,
    "stream_constants": q_stream_constants,
    "agg_pricing_summary": q_agg_pricing_summary,
    "events_windowed_agg": q_events_windowed_agg,
    "events_sliding_agg": q_events_sliding_agg,
    "events_sessionize": q_events_sessionize,
    "topk_orders": q_topk_orders,
    "lookup_enrich": q_lookup_enrich,
    "curation_pipeline": q_curation_pipeline,
    "grouped_topk_orders": q_grouped_topk_orders,
    "window_user_activity": q_window_user_activity,
    "sample_hash": q_sample_hash,
    "stratified_sample": q_stratified_sample,
    "distinct_counts": q_distinct_counts,
    "join_orders_mktsegment": q_join_orders_mktsegment,
    "semi_join_orders": q_semi_join_orders,
    "anti_join_orders": q_anti_join_orders,
    "hash_join_lineitem": q_hash_join_lineitem,
    "asof_clicks_views": q_asof_clicks_views,
    "asof_tolerance_broadcast": q_asof_tolerance_broadcast,
    "interval_join_campaigns": q_interval_join_campaigns,
    "group_quantiles": q_group_quantiles,
    "assemble_conversations": q_assemble_conversations,
    "ivm_conv_stats": q_ivm_conv_stats,
    "pack_documents": q_pack_documents,
    "chunk_documents": q_chunk_documents,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "dedup_exact": q_dedup_exact,
    "dx_pad": q_dx_pad,
    "dx_replace": q_dx_replace,
    "copy_project_filter": q_copy_project_filter,
    "querysql_read": q_querysql_read,
}
