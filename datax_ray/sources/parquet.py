"""Parquet changelog / table readers with schema unification at the read.

A WAL-tail parquet changelog may evolve mid-stream (new columns, widened
ints — FIXTURES.md F3). Ray Data requires block schemas to be compatible,
so we peek every file footer (metadata only — cheap), unify, and align each
batch onto the unified schema right after the read. Column pruning is pushed
into the read (only requested columns leave storage).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from datax_ray.schema import align_to_schema, unify_schemas


def changelog_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]


def unified_schema_of(files: list[str]) -> pa.Schema:
    # metadata stripped: stray pandas metadata defeats Ray's block-schema
    # hashing (worker-side "Failed to hash the schemas" warnings) and
    # bloats every shuffled block's schema payload. Thread-pooled footer
    # reads: a serial scan over many files is fixed driver-side time that
    # caps scaling efficiency on short replays.
    if len(files) <= 4:
        schemas = [pq.read_schema(f) for f in files]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(16, len(files))) as ex:
            schemas = list(ex.map(pq.read_schema, files))
    return unify_schemas(schemas).remove_metadata()


def read_changelog(
    path: str,
    *,
    columns: list[str] | None = None,
    lsn_range: tuple[int, int] | None = None,
    window: tuple | None = None,
    override_num_blocks: int | None = None,
):
    """Read a (possibly schema-evolving) changelog as a schema-stable Dataset.

    - ``lsn_range=(lo, hi)`` → row filter ``lo <= lsn < hi`` pushed to the
      parquet read (row-group pruning): resume / epoch slicing reads only
      the tail, not the whole log.
    - ``window=(start_ts, end_ts)`` → events outside [start, end) dropped,
      the otsstreamreader time-window contract (RecordProcessor.java:208-216).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    files = changelog_files(path)
    schema = unified_schema_of(files)
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])

    filt = None
    if lsn_range is not None:
        lo, hi = lsn_range
        filt = (pc.field("lsn") >= pa.scalar(lo, pa.int64())) & (
            pc.field("lsn") < pa.scalar(hi, pa.int64())
        )
    if window is not None:
        start, end = window
        wf = (pc.field("ts") >= start) & (pc.field("ts") < end)
        filt = wf if filt is None else (filt & wf)

    ds = rd.read_parquet(
        files,
        columns=list(schema.names),
        filter=filt,
        override_num_blocks=override_num_blocks,
    )
    return ds.map_batches(
        lambda t: align_to_schema(t, schema),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
