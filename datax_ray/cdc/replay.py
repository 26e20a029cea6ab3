"""Epoch-driven changelog replay: the end-to-end CDC apply pipeline.

Structure (per SURVEY.md §3.2 — the Ray reshaping of otsstreamreader's
master/slave/checkpoint loop):

    for each epoch (a bounded lsn range [lo, hi) — the micro-batch, DataX's
    bounded time window [startTs, endTs), RecordProcessor.java:209-216):
        events  = source(lo, hi)                      # pushdown lsn filter
                → map_batches(partial_lww_combiner)   # vectorized pre-reduce
                → map_batches(add part)               # stable hash routing
                → groupby(part).map_groups(apply)     # THE shuffle; writes
                                                      #   delta files, returns
                                                      #   1 metrics row per part
        manifest.commit_epoch(metrics)                # atomic publish
        compact partitions whose delta count ≥ compact_every

Exactly-once: delta paths are deterministic per (partition, epoch) and the
fold is deterministic, so a crashed/retried epoch overwrites identical
bytes; only the manifest commit makes an epoch visible. Resume =
re-open the manifest, skip committed epochs (per-partition ``last_lsn``
carries the source-offset lineage). Epochs are driven from the Python
driver as bounded Datasets — deliberately NOT a long-running unbounded
stream, matching the reference's bounded-window design.

Skew: the combiner collapses per-key event storms before the shuffle; for
Zipf-hot conversations pass ``salt=S`` to spread one conversation's keys
over S phase-1 groups and re-merge partials by partition in phase 2.

Three interchangeable execution paths share these semantics (same
manifest, same commits, byte-identical lakes — tested against each other):

- ``replay``                — idiomatic Ray Data (map_batches + groupby);
                              clearest expression, used by the query surface.
- ``replay_files``          — raw-Ray hash exchange (cdc/exchange.py);
                              the hot path (~8× faster per epoch), with
                              pipelined epochs and strictly-ordered commits.
- ``replay_files_stateful`` — actor pool with resident per-partition state
                              (cdc/actor_merge.py); trades throughput for
                              O(state) snapshots and point-in-time reads.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.cdc.merge import (
    EVENT_WEIGHT_COL,
    add_partition_column,
    lww_fold_table,
    partial_lww_combiner,
    stable_hash,
)
from datax_ray.sinks.lake import atomic_write_parquet, base_path, delta_path
from datax_ray.state.manifest import Manifest

METRICS_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("events", pa.int64()),
        ("bytes", pa.int64()),
        ("secs", pa.float64()),
        ("max_lsn", pa.int64()),
        ("max_ts_ms", pa.int64()),
    ]
)


def make_epoch_apply(lake_dir: str, epoch: int) -> Callable[[pa.Table], pa.Table]:
    """Per-partition apply: fold the partition's partials (tombstones kept —
    a delta must still kill older rows in other epochs), write the delta
    file atomically, emit one metrics row."""

    def apply(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part = int(group["part"][0].as_py())
        if EVENT_WEIGHT_COL in group.column_names:
            events = int(pc.sum(group[EVENT_WEIGHT_COL]).as_py() or 0)
        else:
            events = group.num_rows
        folded = lww_fold_table(group, drop_deletes=False)
        # drop bookkeeping cols so delta files are byte-identical across the
        # three replay paths (exchange/actor paths never carry 'part')
        drop = [c for c in (EVENT_WEIGHT_COL, "part") if c in folded.column_names]
        if drop:
            folded = folded.drop_columns(drop)
        path = delta_path(lake_dir, part, epoch)
        size = atomic_write_parquet(folded, path)
        max_lsn = pc.max(folded["lsn"]).as_py()
        # cast ts→int64 (epoch units of the column) BEFORE max: avoids
        # naive-datetime/timezone ambiguity on the driver
        ts_unit = folded["ts"].type.unit if hasattr(folded["ts"].type, "unit") else "ms"
        max_ts_raw = pc.max(folded["ts"].cast(pa.int64())).as_py()
        scale = {"s": 1000, "ms": 1, "us": 1 / 1000, "ns": 1 / 1_000_000}.get(ts_unit, 1)
        max_ts_ms = int(max_ts_raw * scale) if max_ts_raw is not None else 0
        return pa.table(
            {
                "part": [part],
                "file": [path],
                "rows": [folded.num_rows],
                "events": [events],
                "bytes": [size],
                "secs": [time.perf_counter() - t0],
                "max_lsn": [max_lsn if max_lsn is not None else -1],
                "max_ts_ms": [max_ts_ms],
            },
            schema=METRICS_SCHEMA,
        )

    return apply


@dataclass
class ReplayResult:
    manifest: Manifest
    epochs_run: int
    epochs_skipped: int
    events_applied: int
    wall_secs: float
    #: lsn ranges of epochs actually EXECUTED this invocation (skipped
    #: committed epochs excluded) — the key for attributing dead-letter
    #: files to this run's error budget on resume
    executed_ranges: list = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events_applied / max(self.wall_secs, 1e-9)


def dead_letter_rows_for_ranges(
    dead_letter_dir: str | None, ranges: list[tuple[int, int]]
) -> int:
    """Rows dead-lettered by the epochs covering ``ranges`` — footers only.

    Filenames are ``dl-{lsn_lo}-{lsn_hi}-{hash}.parquet`` (deterministic per
    work unit, exchange.validate_events), so a resumed run that re-executes
    a previously-crashed epoch still counts that epoch's dirty rows (the
    file pre-existed but its range is in this run's executed set), while
    epochs skipped as already-committed are excluded."""
    if not dead_letter_dir or not os.path.isdir(dead_letter_dir) or not ranges:
        return 0
    import pyarrow.parquet as pq

    want = set(ranges)
    total = 0
    for name in os.listdir(dead_letter_dir):
        if not (name.startswith("dl-") and name.endswith(".parquet")):
            continue
        parts = name[3:-len(".parquet")].split("-")
        try:
            rng = (int(parts[0]), int(parts[1]))
        except (IndexError, ValueError):
            continue  # uuid-named (untagged) file: not range-attributable
        if rng in want:
            total += pq.read_metadata(
                os.path.join(dead_letter_dir, name)
            ).num_rows
    return total


def plan_epochs(max_lsn_exclusive: int, epoch_size: int | None) -> list[tuple[int, int]]:
    if not epoch_size or epoch_size >= max_lsn_exclusive:
        return [(0, max_lsn_exclusive)]
    return [
        (lo, min(lo + epoch_size, max_lsn_exclusive))
        for lo in range(0, max_lsn_exclusive, epoch_size)
    ]


def plan_epochs_resuming(
    manifest: Manifest, max_lsn_exclusive: int, epoch_size: int | None
) -> tuple[list[tuple[int, int]], set[int]]:
    """Resume-safe epoch plan: ADOPT the committed epochs' (possibly
    ragged) lsn ranges verbatim as the plan prefix, then tile the remaining
    [covered, max_lsn_exclusive) with ``epoch_size``. This keeps a lake
    resumable even when the previous run's ``max_lsn_exclusive`` was not
    epoch-aligned or the caller changed ``epoch_size`` — the new size
    applies only to epochs not yet committed, so exactly-once is
    preserved without renumbering anything already on disk.

    Committed epochs are required to be dense (0..n-1) and contiguous in
    lsn — which the strictly-ordered commit protocol guarantees; anything
    else means a corrupted manifest and raises."""
    committed = sorted(
        (int(e["epoch"]), int(e["lsn_lo"]), int(e["lsn_hi"]))
        for e in manifest.state["epochs"]
    )
    plan: list[tuple[int, int]] = []
    covered = 0
    for i, (ep, lo, hi) in enumerate(committed):
        if ep != i or lo != covered:
            raise ValueError(
                f"corrupted manifest: committed epochs are not a dense "
                f"contiguous prefix (epoch {ep} covers [{lo},{hi}) after "
                f"[0,{covered}))"
            )
        plan.append((lo, hi))
        covered = hi
    if covered < max_lsn_exclusive:
        for lo, hi in plan_epochs(max_lsn_exclusive - covered, epoch_size):
            plan.append((lo + covered, hi + covered))
    return plan, set(range(len(committed)))


def replay(
    source: Callable[[int, int], "object"],
    *,
    lake_dir: str,
    max_lsn_exclusive: int,
    num_partitions: int = 64,
    epoch_size: int | None = None,
    salt: int | None = None,
    compact_every: int = 8,
    keep_epochs: int = 0,
    run_id: str | None = None,
    source_desc: str = "",
    verbose: bool = False,
) -> ReplayResult:
    """Replay a changelog into the lake; resumable, exactly-once.

    ``source(lsn_lo, lsn_hi)`` must return a Ray ``Dataset`` of change
    events with lsn in [lo, hi) — e.g. a partial-applied
    ``sources.parquet.read_changelog`` (the lsn filter is pushed into the
    parquet read) or a generator-backed dataset.
    """
    manifest = Manifest.load_or_create(
        lake_dir,
        num_partitions=num_partitions,
        source=source_desc,
        run_id=run_id,
    )
    epochs, committed = plan_epochs_resuming(manifest, max_lsn_exclusive, epoch_size)

    t_start = time.perf_counter()
    run_events = 0
    n_run = 0
    n_skip = 0
    executed: list[tuple[int, int]] = []
    for epoch, (lo, hi) in enumerate(epochs):
        if epoch in committed:
            n_skip += 1
            continue
        t0 = time.perf_counter()
        ds = source(lo, hi)
        ds = ds.map_batches(
            lambda t: partial_lww_combiner(t, with_weights=True),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if salt:
            ds = ds.map_batches(
                lambda t: _add_part_salt(t, num_partitions, salt),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            ds = ds.groupby(["part", "salt"]).map_groups(
                _phase1_fold, batch_format="pyarrow"
            )
            grouped = ds.drop_columns(["salt"]).groupby("part")
        else:
            ds = ds.map_batches(
                lambda t: add_partition_column(t, num_partitions),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            grouped = ds.groupby("part")
        metrics_rows = grouped.map_groups(
            make_epoch_apply(lake_dir, epoch), batch_format="pyarrow"
        ).take_all()
        wall = time.perf_counter() - t0
        manifest.commit_epoch(epoch, lo, hi, metrics_rows, wall)
        ev = sum(int(r["events"]) for r in metrics_rows)
        run_events += ev
        n_run += 1
        executed.append((lo, hi))
        if verbose:
            print(
                f"[replay] epoch {epoch} lsn=[{lo},{hi}) events={ev} "
                f"parts={len(metrics_rows)} wall={wall:.2f}s "
                f"({ev / max(wall, 1e-9):,.0f} ev/s)",
                file=sys.stderr,
            )
        _maybe_compact(manifest, lake_dir, epoch, compact_every, keep_epochs)

    return ReplayResult(
        manifest=manifest,
        epochs_run=n_run,
        epochs_skipped=n_skip,
        events_applied=run_events,
        wall_secs=time.perf_counter() - t_start,
        executed_ranges=executed,
    )


def replay_files(
    changelog_path: str,
    *,
    lake_dir: str,
    max_lsn_exclusive: int,
    num_partitions: int = 64,
    epoch_size: int | None = None,
    window: tuple | None = None,
    compact_every: int = 8,
    keep_epochs: int = 0,
    run_id: str | None = None,
    verbose: bool = False,
    transform_specs: list | None = None,
    dead_letter_dir: str | None = None,
    record_rate: float | None = None,
    byte_rate: float | None = None,
    error_limit=None,
) -> ReplayResult:
    """Fast-path replay of a parquet changelog via the raw-Ray hash
    exchange (cdc/exchange.py) — same manifest/exactly-once/resume
    semantics as ``replay``, ~an order of magnitude less per-epoch overhead
    than the Dataset sort-shuffle (see exchange.py docstring).

    ``record_rate`` (events/s) / ``byte_rate`` (delta bytes/s) apply the
    reference's job-level flow control (Channel.java:176-239) as
    driver-side epoch pacing: after each commit the driver acquires that
    epoch's event/byte counts from token buckets before admitting the next
    epoch into the bounded in-flight window — coarse-grained (epoch
    quanta) but sufficient for throttling against a rate-limited
    source/sink.

    ``error_limit`` (a ``transforms.ErrorLimit``) is evaluated INSIDE the
    replay loop after every commit — the reference's ErrorRecordChecker
    aborts mid-run (ErrorRecordChecker.java:18-82), so an over-budget job
    must stop before publishing its remaining epochs, not report a breach
    after the whole lake is visible."""
    import ray

    from datax_ray.cdc.exchange import exchange_epoch, file_lsn_ranges
    from datax_ray.sources.parquet import changelog_files, unified_schema_of

    files = changelog_files(changelog_path)
    schema = unified_schema_of(files)
    lsn_ranges = file_lsn_ranges(files)  # footer scan ONCE, not per epoch
    manifest = Manifest.load_or_create(
        lake_dir, num_partitions=num_partitions,
        source=changelog_path, run_id=run_id,
    )
    epochs, committed = plan_epochs_resuming(manifest, max_lsn_exclusive, epoch_size)

    t_start = time.perf_counter()
    if transform_specs and any(
        s.get("name") == "lookup" for s in transform_specs
    ):
        # one ray.put per dimension table for the WHOLE replay — every
        # map task of every epoch probes the same object-store copy
        from datax_ray.transforms.lookup import broadcast_lookup_specs

        transform_specs = broadcast_lookup_specs(transform_specs)
    run_events, n_run = 0, 0
    # Pipelined epochs with a bounded look-ahead window: up to
    # ``max_inflight_epochs`` epochs' map→reduce graphs are in flight at
    # once (removes the per-epoch barrier), but commits happen strictly in
    # epoch order. Commit order — not execution order — is what
    # exactly-once needs: a crash mid-run leaves a prefix of committed
    # epochs, exactly like the serial loop. The bounded window caps object
    # -store footprint at ~window × epoch_size events (a 10^10-event replay
    # must not buffer the whole log in flight).
    from collections import deque

    max_inflight_epochs = 4
    todo = [
        (epoch, lo, hi)
        for epoch, (lo, hi) in enumerate(epochs)
        if epoch not in committed
    ]
    n_skip = len(epochs) - len(todo)
    inflight: deque[tuple[int, int, int, list]] = deque()
    i = 0
    from datax_ray.util import TokenBucket

    bucket = TokenBucket(record_rate) if record_rate else None
    byte_bucket = TokenBucket(byte_rate) if byte_rate else None

    def submit_more():
        nonlocal i
        while i < len(todo) and len(inflight) < max_inflight_epochs:
            epoch, lo, hi = todo[i]
            reduces = exchange_epoch(
                files, lake_dir=lake_dir, epoch=epoch, lsn_lo=lo, lsn_hi=hi,
                num_partitions=num_partitions, schema=schema, window=window,
                lsn_ranges=lsn_ranges, sync=False,
                transform_specs=transform_specs,
                dead_letter_dir=dead_letter_dir,
            )
            inflight.append((epoch, lo, hi, reduces))
            i += 1

    executed: list[tuple[int, int]] = []
    dirty_run = 0  # cumulative; each range scanned ONCE (counts immutable)
    submit_more()
    while inflight:
        epoch, lo, hi, reduces = inflight.popleft()
        t0 = time.perf_counter()
        metrics_rows = [r for r in ray.get(list(reduces)) if r is not None]
        wall = time.perf_counter() - t0
        ev = sum(int(r["events"]) for r in metrics_rows)
        if error_limit is not None and dead_letter_dir:
            # mid-run budget, evaluated BEFORE this epoch's commit: the
            # epoch's dead-letter files are fully written once its reduces
            # resolve, so a breach stops the job with the offending epoch
            # still unpublished (already-committed epochs stay —
            # exactly-once holds). Incremental: only the NEWLY executed
            # range is scanned; earlier ranges' counts are immutable.
            dirty_run += dead_letter_rows_for_ranges(
                dead_letter_dir, [(lo, hi)]
            )
            error_limit.check(dirty_run, run_events + ev + dirty_run)
        manifest.commit_epoch(epoch, lo, hi, metrics_rows, wall)
        run_events += ev
        n_run += 1
        executed.append((lo, hi))
        if verbose:
            print(
                f"[replay-x] epoch {epoch} lsn=[{lo},{hi}) events={ev} "
                f"parts={len(metrics_rows)} commit_wait={wall:.2f}s",
                file=sys.stderr,
            )
        _maybe_compact(manifest, lake_dir, epoch, compact_every, keep_epochs)
        if bucket is not None:
            bucket.acquire(ev)
        if byte_bucket is not None:
            byte_bucket.acquire(sum(int(r.get("bytes", 0)) for r in metrics_rows))
        submit_more()

    return ReplayResult(
        manifest=manifest,
        epochs_run=n_run,
        epochs_skipped=n_skip,
        events_applied=run_events,
        wall_secs=time.perf_counter() - t_start,
        executed_ranges=executed,
    )


def _add_part_salt(t: pa.Table, num_partitions: int, salt: int) -> pa.Table:
    t = add_partition_column(t, num_partitions)
    s = (stable_hash(t["turn_idx"]) % np.uint64(salt)).astype(np.int32)
    return t.append_column("salt", pa.array(s, type=pa.int32()))


def _phase1_fold(group: pa.Table) -> pa.Table:
    return lww_fold_table(group, drop_deletes=False, weight_col=EVENT_WEIGHT_COL)


def _maybe_compact(manifest: Manifest, lake_dir: str, epoch: int,
                   compact_every: int, keep_epochs: int = 0) -> None:
    """Fold base+deltas into a fresh base snapshot for partitions whose
    foldable delta chain grew past ``compact_every`` (RocksDB-style
    compaction).

    ``keep_epochs=N`` is snapshot RETENTION (the Iceberg/Delta
    snapshot-expiry contract): only deltas from epochs ≤ current - N are
    folded, so ``read_lake(as_of_epoch=e)`` keeps working after compaction
    for every e newer than the folded boundary; the new base carries the
    max folded epoch in its name, which is exactly that boundary.

    Tombstones are RETAINED in the base: a later epoch may still deliver an
    out-of-order event with an *older* ts for a deleted key, and it must
    lose LWW against the tombstone — dropping tombstones here would
    resurrect deleted rows (no event-time watermark exists to bound
    disorder, so tombstones are GC'd only at final read). Same reasoning as
    RocksDB not dropping tombstones until bottom-level compaction."""
    if not compact_every:
        return
    from datax_ray.sinks.lake import file_epoch

    cutoff = epoch - keep_epochs
    specs = []
    for p_str, st in manifest.state["partitions"].items():
        old = [d for d in st["deltas"] if file_epoch(d) <= cutoff]
        if len(old) < compact_every:
            continue
        files = ([st["base"]] if st["base"] else []) + old
        out_epoch = max(file_epoch(f) for f in files)
        specs.append({"part": int(p_str), "files": files,
                      "out": base_path(lake_dir, int(p_str), out_epoch)})
    todo = specs
    if not todo:
        return
    import ray.data as rd

    def compact(batch) -> pa.Table:
        from datax_ray.sinks.lake import fold_partition_files

        part = int(batch["part"][0])
        files = list(batch["files"][0])
        out = str(batch["out"][0])
        state = fold_partition_files(files, drop_deletes=False)
        atomic_write_parquet(state, out)
        return pa.table({"part": [part], "out": [out], "n": [len(files)]})

    results = (
        rd.from_items(specs)
        .map_batches(compact, batch_size=1, batch_format="pandas")
        .take_all()
    )
    for spec, _r in zip(specs, results):
        manifest.commit_compaction(
            int(spec["part"]), spec["out"], removed=list(spec["files"])
        )


@dataclass
class TailResult:
    polls: int
    replays: int
    events_applied: int
    #: next lsn the lake expects (high-water mark applied, exclusive)
    last_lsn_exclusive: int
    #: lsn ranges THIS tail actually executed (union over its
    #: replay_files calls) — dirty accounting must use these, not
    #: [0, last_lsn_exclusive), or a resumed tail re-counts dead letters
    #: from epochs committed by earlier runs (same executed_ranges
    #: attribution contract as ReplayResult)
    executed_ranges: list = field(default_factory=list)


def tail_files(
    changelog_path: str,
    *,
    lake_dir: str,
    num_partitions: int = 64,
    epoch_size: int | None = None,
    poll_interval: float = 1.0,
    idle_polls: int | None = 3,
    max_polls: int | None = None,
    stop_when=None,
    verbose: bool = False,
    **replay_kw,
) -> TailResult:
    """Continuous binlog/WAL-tail ingest: poll ``changelog_path`` for
    events beyond the lake's applied high-water mark and replay each new
    lsn range as it lands — the unbounded-stream face of the same
    bounded-epoch engine (each poll's new range is tiled into ordinary
    epochs, so exactly-once, resume, fencing, compaction and metrics all
    come from ``replay_files`` unchanged; a tail killed mid-epoch resumes
    exactly like a batch replay).

    Polling contract: source files must appear ATOMICALLY (write tmp +
    rename — the same contract this engine's own sinks follow); a file
    is re-scanned only when its (size, mtime) changes, so steady-state
    polls cost one ``listdir`` + footer reads for NEW files only (the
    incremental analogue of ``file_lsn_ranges``'s once-per-replay scan).

    Termination (this is a library, not a daemon): stop after
    ``idle_polls`` consecutive polls with no new data (``None`` = never),
    after ``max_polls`` total polls, or when ``stop_when()`` returns
    true. Mirrors the reference's bounded-window tailing
    (otsstreamreader README: endTime-bounded incremental export) rather
    than a detached service."""
    import os as _os

    footer_cache: dict[str, tuple[tuple[int, int], tuple | None]] = {}

    def high_water() -> int:
        from datax_ray.cdc.exchange import file_lsn_ranges
        from datax_ray.sources.parquet import changelog_files

        fresh = []
        for f in changelog_files(changelog_path):
            try:
                st = _os.stat(f)
            except FileNotFoundError:
                continue
            key = (st.st_size, st.st_mtime_ns)
            if f not in footer_cache or footer_cache[f][0] != key:
                fresh.append((f, key))
        if fresh:
            ranges = file_lsn_ranges([f for f, _ in fresh])
            for f, key in fresh:
                footer_cache[f] = (key, ranges[f])
        tops = [r[1] for _, r in footer_cache.values() if r]
        return max(tops) + 1 if tops else 0

    try:
        applied = Manifest.load(lake_dir).last_lsn + 1
    except FileNotFoundError:
        applied = 0

    polls = replays = events = idle = 0
    executed: list = []
    while True:
        polls += 1
        avail = high_water()
        if avail > applied:
            res = replay_files(
                changelog_path, lake_dir=lake_dir,
                max_lsn_exclusive=avail, num_partitions=num_partitions,
                epoch_size=epoch_size, verbose=verbose, **replay_kw,
            )
            replays += 1
            events += res.events_applied
            executed.extend(res.executed_ranges)
            applied = avail
            idle = 0
        else:
            idle += 1
            if idle_polls is not None and idle >= idle_polls:
                break
            time.sleep(poll_interval)
        if stop_when is not None and stop_when():
            break
        if max_polls is not None and polls >= max_polls:
            break
    return TailResult(polls=polls, replays=replays, events_applied=events,
                      last_lsn_exclusive=applied, executed_ranges=executed)
