"""Incrementally-maintained aggregate views over the lake (IVM).

The CDC engine's natural downstream: keep a per-conversation aggregate
table (a materialized view) in lockstep with the lake WITHOUT recomputing
the whole groupby on every refresh. The refresh cost is proportional to
the number of conversations that CHANGED since the view's epoch, not to
the table size — the property that makes a 100 TB lake's dashboards
maintainable at all.

Algorithm per refresh (one Ray task per lake partition, NO shuffle — the
lake is already key-partitioned and the view inherits that partitioning):

1. ``changed`` = distinct ``conv_id`` appearing in any lake file whose
   epoch is newer than the view's ``as_of_epoch`` — read with
   ``columns=["conv_id"]`` only, so this touches key bytes, not payloads.
   A compaction base folded past the view epoch makes this a SUPERSET of
   the truly-changed set (correct, merely recomputes a little extra).
2. Fold the partition's CURRENT state filtered to ``changed`` (the
   ``conv_id`` predicate is pushed into the parquet reads — row-group
   stats prune untouched conversations) and run the aggregate kernel on
   just those groups.
3. Splice: keep the old view's rows for unchanged conversations, replace
   rows for changed ones, drop conversations that vanished (full delete).
4. Commit ``_VIEW.json`` atomically (tmp+rename) once every partition's
   new file is written — the same manifest-gated visibility contract as
   the lake itself (reference: HdfsWriter.java:149-192 two-phase commit).

The kernel is pluggable: any vectorized ``pa.Table -> pa.Table`` that
groups by ``conv_id`` and is insensitive to row order. The default
``conv_stats_kernel`` computes (n_turns, n_user, text_chars, last_ts).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.cdc.merge import lww_fold_chain
from datax_ray.sinks.lake import atomic_write_parquet, file_epoch
from datax_ray.state.manifest import Manifest

VIEW_MANIFEST = "_VIEW.json"


def conv_stats_kernel(state: pa.Table) -> pa.Table:
    """Default aggregate: one row per conv_id with
    (n_turns, n_user, text_chars, last_ts). Vectorized Arrow group_by;
    output columns renamed BY NAME (older pyarrow emits aggregate
    columns before keys)."""
    if state.num_rows == 0:
        return pa.table({
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "n_user": pa.array([], pa.int64()),
            "text_chars": pa.array([], pa.int64()),
            "last_ts": pa.array([], state.schema.field("ts").type),
        })
    t = pa.table({
        "conv_id": state["conv_id"],
        "chars": pc.cast(pc.utf8_length(pc.fill_null(state["text"], "")),
                         pa.int64()),
        "is_user": pc.cast(pc.fill_null(pc.equal(state["role"], "user"),
                                        False), pa.int64()),
        "ts": state["ts"],
    })
    g = t.group_by("conv_id").aggregate([
        ("conv_id", "count"), ("is_user", "sum"), ("chars", "sum"),
        ("ts", "max"),
    ])
    name_map = {"conv_id_count": "n_turns", "is_user_sum": "n_user",
                "chars_sum": "text_chars", "ts_max": "last_ts"}
    return pa.table({
        "conv_id": g["conv_id"],
        **{out: g[src] for src, out in name_map.items()},
    })


def _view_path(view_dir: str) -> str:
    return os.path.join(view_dir, VIEW_MANIFEST)


def _load_view(view_dir: str) -> dict:
    p = _view_path(view_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"as_of_epoch": None, "files": {}}


def _commit_view(view_dir: str, state: dict) -> None:
    os.makedirs(view_dir, exist_ok=True)
    tmp = _view_path(view_dir) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, _view_path(view_dir))


def _changed_convs(new_files: list[str]) -> pa.Array:
    if not new_files:
        return pa.array([], pa.string())
    cols = [pq.read_table(f, columns=["conv_id"])["conv_id"]
            for f in new_files]
    chunks = [c for col in cols for c in col.chunks]
    return pc.unique(pa.chunked_array(chunks or [pa.array([], pa.string())]))


def _fold_filtered(files: list[str], convs: pa.Array) -> pa.Table | None:
    """Current state of one partition restricted to ``convs`` — the
    conv_id predicate is pushed into every parquet read (row-group
    pruning via column stats)."""
    if not files:
        return None
    expr = pc.field("conv_id").isin(convs)
    tables = [pq.read_table(f, filters=expr) for f in files]
    return lww_fold_chain(tables, drop_deletes=True)


def refresh_view(lake_dir: str, view_dir: str, *,
                 kernel=conv_stats_kernel, to_epoch: int | None = None,
                 concurrency: int | None = None) -> dict:
    """Bring the view to the lake's committed state (or ``to_epoch``).
    Returns the committed view-manifest dict. Idempotent: refreshing an
    up-to-date view is a no-op; a crash before the view-manifest commit
    leaves invisible files the next refresh overwrites byte-identically."""
    import ray.data as rd

    manifest = Manifest.load(lake_dir)
    committed = manifest.committed_epochs()
    cur = to_epoch if to_epoch is not None else (
        max(committed) if committed else None)
    view = _load_view(view_dir)
    since = view["as_of_epoch"]
    if cur is None or since == cur:
        return view
    if since is not None and cur < since:
        raise ValueError(
            f"view at epoch {since} cannot be refreshed backwards to "
            f"{cur}; rebuild into a fresh view_dir for time travel")

    def files_now(p: int) -> list[str]:
        if to_epoch is not None:
            return manifest.partition_files_as_of(p, cur)
        return manifest.partition_files(p)

    specs = []
    for p in range(manifest.num_partitions):
        fn = files_now(p)
        old_file = view["files"].get(str(p))
        new_files = (fn if since is None or old_file is None
                     else [f for f in fn if file_epoch(f) > since])
        if not fn and not old_file:
            continue
        specs.append({"part": p, "files_now": fn, "new_files": new_files,
                      "old_file": old_file or ""})

    out_files: dict[str, str] = {}
    if specs:
        def task(batch) -> pa.Table:
            part = int(batch["part"][0])
            fn = list(batch["files_now"][0])
            new_files = list(batch["new_files"][0])
            old_file = str(batch["old_file"][0])
            if old_file and since is not None:
                changed = _changed_convs(new_files)
                state = _fold_filtered(fn, changed)
                fresh = (kernel(state) if state is not None
                         else kernel(_empty_state()))
                old = pq.read_table(old_file)
                keep = old.filter(
                    pc.invert(pc.is_in(old["conv_id"], value_set=changed)))
                new_view = pa.concat_tables([keep, fresh],
                                            promote_options="default")
            else:
                state = lww_fold_chain(
                    [pq.read_table(f) for f in fn], drop_deletes=True
                ) if fn else None
                new_view = (kernel(state) if state is not None
                            else kernel(_empty_state()))
            path = os.path.join(view_dir, f"part={part:05d}",
                                f"view-{cur:06d}.parquet")
            atomic_write_parquet(new_view, path)
            return pa.table({"part": [part], "file": [path],
                             "rows": [new_view.num_rows]})

        res = (rd.from_items(specs)
               .map_batches(task, batch_size=1, batch_format="pandas",
                            concurrency=concurrency)
               .take_all())          # P rows of (part, file, rows) — tiny
        out_files = {str(r["part"]): r["file"] for r in res}

    new_state = {"as_of_epoch": cur, "files": out_files,
                 "lake_dir": os.path.abspath(lake_dir)}
    _commit_view(view_dir, new_state)
    _prune_unreferenced(view_dir, new_state)
    return new_state


def _empty_state() -> pa.Table:
    from datax_ray.schema import TRANSCRIPT_SCHEMA

    return TRANSCRIPT_SCHEMA.empty_table()


def _prune_unreferenced(view_dir: str, state: dict) -> None:
    """Remove view files superseded by the just-committed manifest —
    safe only AFTER the commit (a crash mid-refresh must leave the
    previously-referenced files intact)."""
    keep = {os.path.abspath(f) for f in state["files"].values()}
    for root, _dirs, names in os.walk(view_dir):
        for n in names:
            p = os.path.abspath(os.path.join(root, n))
            if (n.startswith("view-") and n.endswith(".parquet")
                    and p not in keep):
                try:
                    os.remove(p)
                except OSError:
                    pass


def read_view(view_dir: str) -> pa.Table:
    """The materialized view as one Arrow table (views are small —
    one row per group)."""
    view = _load_view(view_dir)
    files = sorted(view["files"].values())
    if not files:
        return conv_stats_kernel(_empty_state())
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default")
