"""Exactly-once Parquet lake: per-(partition, epoch) delta files + manifest.

Layout (one directory per hash partition — resumable, a failed run re-runs
only uncommitted epochs; never one giant file):

    lake/
      _MANIFEST.json                  # the atomic commit point (state/manifest.py)
      data/part=00017/delta-000003.parquet
      data/part=00017/base-000002.parquet   # compaction snapshot

Write protocol per (partition, epoch): write ``<path>.tmp.<pid>`` then
``os.replace`` — the DataX hdfswriter tmp+rename contract
(hdfswriter/.../HdfsWriter.java:149-192, HdfsHelper.java:207-246) done
per-file; visibility is still gated on the manifest, so a crash between
file write and manifest commit leaves invisible garbage that the re-run
overwrites byte-identically (deterministic fold ⇒ idempotent).

Read protocol: current state of partition p = LWW-fold of
[base?, delta_e1, delta_e2, ...] in epoch order with tombstones dropped;
schema evolution handled by aligning every file onto the unified schema
(old committed files keep their old schema — unify on read).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.cdc.merge import lww_fold_chain
from datax_ray.state.manifest import Manifest


def partition_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, "data", f"part={part:05d}")


def delta_path(lake_dir: str, part: int, epoch: int) -> str:
    return os.path.join(partition_dir(lake_dir, part), f"delta-{epoch:06d}.parquet")


def base_path(lake_dir: str, part: int, epoch: int) -> str:
    return os.path.join(partition_dir(lake_dir, part), f"base-{epoch:06d}.parquet")


def file_epoch(path: str) -> int:
    """The epoch a delta/base file carries in its name (``delta-{e:06d}`` /
    ``base-{e:06d}``) — the snapshot index for time travel and retention."""
    stem = os.path.basename(path).rsplit(".", 1)[0]
    return int(stem.split("-")[-1])


def atomic_write_parquet(table: pa.Table, path: str, compression: str = "zstd") -> int:
    """Write-tmp + rename; returns bytes written. Safe to re-run."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp, compression=compression)
    size = os.path.getsize(tmp)
    os.replace(tmp, path)
    return size


def fold_partition_files(files: list[str], *, drop_deletes: bool = True) -> pa.Table | None:
    """Fold committed files of one partition into its current state."""
    if not files:
        return None
    tables = [pq.read_table(f) for f in files]
    return lww_fold_chain(tables, drop_deletes=drop_deletes)


def _partition_specs(manifest: Manifest, as_of_epoch: int | None) -> list[dict]:
    files_of = (
        manifest.partition_files if as_of_epoch is None
        else (lambda p: manifest.partition_files_as_of(p, as_of_epoch))
    )
    return [
        {"part": p, "files": files_of(p)}
        for p in range(manifest.num_partitions)
        if files_of(p)
    ]


def read_lake(lake_dir: str, *, columns: list[str] | None = None,
              as_of_epoch: int | None = None):
    """Table state as a Dataset — one read+fold task per partition
    (P independent tasks; no shuffle: files are already key-partitioned).
    ``as_of_epoch`` time-travels to the snapshot after that committed
    epoch (manifest lineage: source offset → epoch → files)."""
    import ray.data as rd

    manifest = Manifest.load(lake_dir)
    specs = _partition_specs(manifest, as_of_epoch)
    if not specs:
        from datax_ray.schema import TRANSCRIPT_SCHEMA

        return rd.from_arrow(TRANSCRIPT_SCHEMA.empty_table())

    def load(batch) -> pa.Table:
        part = int(batch["part"][0])
        files = list(batch["files"][0])
        t = fold_partition_files(files, drop_deletes=True)
        if columns:
            t = t.select([c for c in columns if c in t.column_names])
        return t

    return rd.from_items(specs).map_batches(load, batch_size=1, batch_format="pandas")


def read_lake_table(lake_dir: str, *, as_of_epoch: int | None = None) -> pa.Table:
    """Driver-side full read (small lakes / tests only): folded state sorted
    by (conv_id, turn_idx) — the stable output ordering invariant.
    ``as_of_epoch`` time-travels to that committed epoch's snapshot."""
    manifest = Manifest.load(lake_dir)
    tables = []
    for spec in _partition_specs(manifest, as_of_epoch):
        t = fold_partition_files(spec["files"], drop_deletes=True)
        if t is not None and t.num_rows:
            tables.append(t)
    if not tables:
        from datax_ray.schema import TRANSCRIPT_SCHEMA

        return TRANSCRIPT_SCHEMA.empty_table()
    from datax_ray.schema import concat_aligned

    out = concat_aligned(tables)
    drop = [c for c in ("part",) if c in out.column_names]
    if drop:
        out = out.drop_columns(drop)
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])




def table_changes(lake_dir: str, *, from_epoch: int | None,
                  to_epoch: int | None = None):
    """Change-data-feed OUT of the lake (Delta CDF / Iceberg changelog
    analogue): the I/U/D row set that takes the ``from_epoch`` snapshot to
    the ``to_epoch`` snapshot — the engine ingests CDC and can re-emit it
    downstream. ``from_epoch=None`` diffs from the empty table (all
    inserts); ``to_epoch=None`` diffs to the current state.

    One task per partition, NO shuffle (both snapshots fold from the same
    key-partitioned files; `partition_files_as_of` is the snapshot index).
    Per partition: fold both states, one zero-copy full-outer
    ``pa.Table.join`` on the primary key, classify vectorized:
    only-in-new → I, only-in-old → D, version (ts, lsn) changed → U
    (an upsert that re-won with identical payload still changed version —
    it IS a new winning write), identical version → no row. Rows carry
    the AFTER image (nulls for D) plus the change op.

    Raises (via ``partition_files_as_of``) if compaction already folded
    history past a requested epoch — retain with ``keep_epochs``."""
    import ray.data as rd

    manifest = Manifest.load(lake_dir)
    specs = []
    for p in range(manifest.num_partitions):
        files_a = ([] if from_epoch is None
                   else manifest.partition_files_as_of(p, from_epoch))
        files_b = (manifest.partition_files(p) if to_epoch is None
                   else manifest.partition_files_as_of(p, to_epoch))
        if files_a or files_b:
            specs.append({"part": p, "files_a": files_a,
                          "files_b": files_b})
    from datax_ray.schema import TRANSCRIPT_SCHEMA

    empty_out = TRANSCRIPT_SCHEMA.empty_table().append_column(
        "change_op", pa.array([], pa.string()))
    if not specs:
        return rd.from_arrow(empty_out)

    def diff(batch) -> pa.Table:
        import pyarrow.compute as pc

        ta = fold_partition_files(list(batch["files_a"][0]),
                                  drop_deletes=True)
        tb = fold_partition_files(list(batch["files_b"][0]),
                                  drop_deletes=True)
        if tb is None and ta is None:
            return empty_out
        if tb is None:
            tb = pa.schema(
                [(n, t) for n, t in zip(ta.schema.names, ta.schema.types)]
            ).empty_table()
        if ta is None:
            out = tb.append_column(
                "change_op", pa.array(["I"] * tb.num_rows))
            return out.sort_by([("conv_id", "ascending"),
                                ("turn_idx", "ascending")])
        a_keys = ta.select(["conv_id", "turn_idx", "ts", "lsn"]) \
            .rename_columns(["conv_id", "turn_idx", "_ts_a", "_lsn_a"])
        j = tb.join(a_keys, keys=["conv_id", "turn_idx"],
                    join_type="full outer")
        lsn_a = j["_lsn_a"]
        is_i = pc.is_null(lsn_a)
        is_d = pc.is_null(j["lsn"])
        changed = pc.or_kleene(
            pc.not_equal(j["lsn"], lsn_a), pc.not_equal(j["ts"], j["_ts_a"]))
        op = pc.if_else(is_i, "I", pc.if_else(is_d, "D", pc.if_else(
            pc.fill_null(changed, False), "U", pa.scalar(None, pa.string()))))
        j = j.append_column("change_op", op)
        j = j.filter(pc.is_valid(j["change_op"]))
        j = j.drop_columns(["_ts_a", "_lsn_a"])
        return j.sort_by([("conv_id", "ascending"),
                          ("turn_idx", "ascending")])

    return rd.from_items(specs).map_batches(diff, batch_size=1,
                                            batch_format="pandas")


def backfill(lake_dir: str, fn, *, tag: str | None = None) -> dict:
    """Partition-parallel in-place rewrite: recompute/patch columns over
    every live row of the lake without replaying the changelog — the
    lakehouse "backfill a derived column" operation.

    Per partition (one Ray task each, no shuffle — files are already
    key-partitioned): fold base+deltas to current state (tombstones
    RETAINED, they must keep absorbing late out-of-order events), apply
    the vectorized ``fn(pa.Table) -> pa.Table`` to the LIVE rows only,
    re-attach tombstones (new columns null-filled), write one new base
    snapshot atomically, and commit the swap to the manifest. The
    per-partition commit is the RESUME unit: a crashed backfill leaves a
    prefix of partitions swapped; re-running skips them (the new base
    name carries ``tag``) and finishes the rest. Orphaned files from the
    crash are invisible (manifest-gated) and reclaimed by ``vacuum``.

    ``fn`` must be deterministic, preserve row count/order, and keep the
    key/version columns intact (validated per partition). Like
    compaction, backfill folds history: time travel reaches only
    post-backfill epochs afterwards.

    Run against a quiesced lake: a partition is skipped on resume only
    while its swapped base is its ONLY file, so if new deltas land
    between a crash and the re-run, that partition is re-folded and
    ``fn`` runs again over rows it already transformed — make ``fn``
    idempotent (e.g. overwrite a derived column rather than append to a
    value) if ingest cannot be paused.
    """
    import ray.data as rd

    from datax_ray.schema import align_to_schema as _align
    from datax_ray.schema import concat_aligned

    tag = tag or getattr(fn, "__name__", "fn")
    manifest = Manifest.load(lake_dir)
    marker = f"bf-{tag}-"
    specs = []
    skipped = 0
    for p in range(manifest.num_partitions):
        files = manifest.partition_files(p)
        if not files:
            continue
        if (len(files) == 1
                and os.path.basename(files[0]).startswith(marker)):
            skipped += 1  # resume: this partition already swapped
            continue
        out = os.path.join(
            partition_dir(lake_dir, p),
            f"{marker}base-{max(file_epoch(f) for f in files):06d}.parquet")
        specs.append({"part": p, "files": files, "out": out})

    def rewrite(batch) -> pa.Table:
        part = int(batch["part"][0])
        files = list(batch["files"][0])
        out = str(batch["out"][0])
        t = fold_partition_files(files, drop_deletes=False)
        live_mask = pc.not_equal(t["op"], "D")
        live, dead = t.filter(live_mask), t.filter(pc.invert(live_mask))
        new = fn(live)
        if new.num_rows != live.num_rows:
            raise ValueError(
                f"backfill fn changed row count in part {part}: "
                f"{live.num_rows} -> {new.num_rows}")
        for c in ("conv_id", "turn_idx", "ts", "lsn", "op"):
            if c in live.column_names and (
                c not in new.column_names
                or not new[c].combine_chunks().equals(
                    live[c].combine_chunks())
            ):
                raise ValueError(
                    f"backfill fn must preserve key/version column '{c}'")
        if dead.num_rows:
            new = concat_aligned([new, _align(dead, new.schema)])
        atomic_write_parquet(new, out)
        return pa.table({"part": pa.array([part], pa.int64()),
                         "out": pa.array([out]),
                         "rows": pa.array([new.num_rows], pa.int64())})

    done = 0
    if specs:
        results = rd.from_items(specs).map_batches(
            rewrite, batch_size=1, batch_format="pandas")
        # stream commits so a crash keeps every finished partition's swap
        for row in results.iter_rows():
            part = int(row["part"])
            manifest.commit_compaction(part, row["out"],
                                       removed=manifest.partition_files(part))
            done += 1
    return {"partitions": done, "skipped": skipped, "tag": tag}


def vacuum(lake_dir: str, *, dry_run: bool = False) -> list[str]:
    """Delete data files not referenced by the committed manifest — garbage
    from crashed runs (written-but-never-committed deltas), replaced
    compaction bases, and orphaned .tmp files. Safe because visibility is
    manifest-gated: anything unreferenced is invisible by definition."""
    import glob as _glob

    manifest = Manifest.load(lake_dir)
    referenced: set[str] = set()
    for p in range(manifest.num_partitions):
        referenced.update(manifest.partition_files(p))
    on_disk = _glob.glob(os.path.join(lake_dir, "data", "part=*", "*"))
    victims = sorted(set(on_disk) - referenced)
    if not dry_run:
        for v in victims:
            os.unlink(v)
    return victims


def lookup_conversation(lake_dir: str, conv_id: str) -> pa.Table:
    """Point lookup: read + fold only the ONE hash partition that can hold
    ``conv_id`` (manifest-pruned — no scan of the other P-1 partitions),
    then filter to the conversation, sorted by turn_idx. The lake's
    partitioning key doubles as its primary index."""
    import pyarrow.compute as pc

    from datax_ray.cdc.merge import stable_hash_partition

    manifest = Manifest.load(lake_dir)
    part = int(stable_hash_partition(pa.array([conv_id]), manifest.num_partitions)[0])
    t = fold_partition_files(manifest.partition_files(part), drop_deletes=True)
    if t is None:
        from datax_ray.schema import TRANSCRIPT_SCHEMA

        return TRANSCRIPT_SCHEMA.empty_table()
    t = t.filter(pc.equal(t["conv_id"], pa.scalar(conv_id)))
    return t.sort_by([("turn_idx", "ascending")])
