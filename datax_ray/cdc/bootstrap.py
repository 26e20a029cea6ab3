"""Lake bootstrap: full-table initial load, then tail the changelog.

DataX's classic deployment is a full batch copy followed by incremental
sync (reader→writer full job + otsstreamreader tail). Here the full load
writes the *base snapshot* of every partition directly (no events, no
epochs): transcripts → hash exchange by conv_id → per-partition base file
``base-000000.parquet`` + manifest bootstrap commit with ``last_lsn = -1``
— so a subsequent ``replay_files(..)`` applies the changelog on top (every
event wins over base rows on (ts, lsn) or replaces them by LWW).

Base rows carry ``op='I', lsn=-1`` so they participate in the same
vectorized fold as deltas.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa


from datax_ray.cdc.exchange import split_by_partition
from datax_ray.sinks.lake import atomic_write_parquet, base_path
from datax_ray.state.manifest import Manifest


def _prepare_base_batch(t: pa.Table) -> pa.Table:
    n = t.num_rows
    if "op" not in t.column_names:
        t = t.add_column(0, "op", pa.array(["I"] * n, pa.string()))
    if "lsn" not in t.column_names:
        t = t.add_column(0, "lsn", pa.array(np.full(n, -1, dtype=np.int64)))
    return t


def bootstrap_lake(
    table_path: str,
    lake_dir: str,
    *,
    num_partitions: int = 64,
    run_id: str | None = None,
) -> Manifest:
    """Distributed initial load of a transcripts parquet table into lake
    base files. Idempotent: re-running overwrites identical base files and
    re-commits the same manifest state."""
    import ray

    from datax_ray.sources.parquet import changelog_files

    files = changelog_files(table_path)
    manifest = Manifest.load_or_create(
        lake_dir, num_partitions=num_partitions,
        source=f"bootstrap:{table_path}", run_id=run_id,
    )

    @ray.remote(num_returns=num_partitions)
    def map_split(path: str):
        import pyarrow.parquet as pq

        t = _prepare_base_batch(pq.read_table(path))
        parts = split_by_partition(t, num_partitions)
        if num_partitions == 1:
            return parts[0]  # num_returns=1: bare value
        return tuple(parts)

    @ray.remote
    def write_base(part: int, *tables: pa.Table):
        from datax_ray.cdc.merge import lww_fold_table
        from datax_ray.schema import concat_aligned

        tabs = [t for t in tables if t.num_rows > 0]
        if not tabs:
            return None
        t0 = time.perf_counter()
        merged = concat_aligned(tabs)
        folded = lww_fold_table(merged, drop_deletes=True)
        path = base_path(lake_dir, part, 0)
        size = atomic_write_parquet(folded, path)
        return {
            "part": part, "file": path, "rows": folded.num_rows,
            "bytes": size, "secs": time.perf_counter() - t0,
        }

    maps = [map_split.remote(f) for f in files]
    if num_partitions == 1:
        maps = [[m] for m in maps]
    results = ray.get(
        [write_base.remote(p, *[m[p] for m in maps]) for p in range(num_partitions)]
    )
    for r in results:
        if r is None:
            continue
        manifest.commit_compaction(int(r["part"]), r["file"], removed=[])
    manifest._write()
    return manifest
