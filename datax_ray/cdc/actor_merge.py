"""Stateful actor-pool merge: per-partition state resident across epochs.

The stateless exchange path (cdc/exchange.py) re-reads lake files whenever
it needs current state (compaction, reads). This variant keeps each
partition's folded state — the "RocksDB-style sorted key state" — in actor
memory across epochs, like a memtable over the on-disk delta chain:

- A pool of N named merge actors; partition p is owned by actor ``p % N``
  — deterministic key→actor affinity, the thing Ray Data's ``map_batches``
  actor pools can't guarantee (SURVEY.md §7.4.1), solved by raw actors.
- Epoch apply: the SAME map stage as the exchange splits changelog files
  into P slices; each partition's slices route to its owning actor, which
  folds them into the resident state (sorted, tombstones retained), writes
  the delta file atomically, and returns the metrics row. Commit/resume
  semantics are identical to the stateless path — actors are a cache, the
  manifest + files stay the source of truth.
- Recovery: an actor lazily loads a partition's committed files on first
  touch (crash ⇒ new actors rebuild from the lake; no state migration).
- Compaction: ``snapshot(part)`` writes the resident state as a base file
  in O(state) — no re-read of the delta chain (the memtable-flush analogy).
- Memory bound: per-actor resident bytes are tracked; the driver can
  ``evict()`` partitions (snapshot + drop) when a budget is exceeded —
  spill-to-lake instead of OOM.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.cdc.merge import EVENT_WEIGHT_COL, lww_fold_table
from datax_ray.schema import concat_aligned
from datax_ray.sinks.lake import atomic_write_parquet, base_path, delta_path
from datax_ray.state.manifest import Manifest


class _MergeActorImpl:
    #: resident delta-chain length that triggers an in-memory fold —
    #: the LSM memtable-merge amortization: appending is O(delta),
    #: folding the whole partition is O(state·log state) and must NOT
    #: happen every epoch
    FOLD_EVERY = 8

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        # part → list of folded tables (base fold + recent deltas), or
        # None for a loaded-but-empty partition
        self.state: dict[int, list[pa.Table] | None] = {}

    def _ensure_loaded(self, part: int, committed_files: list[str]) -> None:
        if part in self.state:
            return
        import pyarrow.parquet as pq

        tabs = [pq.read_table(f) for f in committed_files]
        if tabs:
            self.state[part] = [
                lww_fold_table(concat_aligned(tabs), drop_deletes=False)
            ]
        else:
            self.state[part] = None  # empty partition

    def _folded(self, part: int) -> pa.Table | None:
        """Collapse the resident chain to one folded table (on demand)."""
        chain = self.state.get(part)
        if not chain:
            return None
        if len(chain) > 1:
            chain = [lww_fold_table(concat_aligned(chain), drop_deletes=False)]
            self.state[part] = chain
        return chain[0]

    def apply(self, epoch: int, part: int, committed_files: list[str],
              *slices: pa.Table) -> dict | None:
        t0 = time.perf_counter()
        self._ensure_loaded(part, committed_files)
        tabs = [t for t in slices if t is not None and t.num_rows > 0]
        if not tabs:
            return None
        incoming = concat_aligned(tabs)
        events = int(pc.sum(incoming[EVENT_WEIGHT_COL]).as_py() or 0)
        delta = lww_fold_table(incoming, drop_deletes=False).drop_columns(
            [EVENT_WEIGHT_COL]
        )
        # memtable update: APPEND the folded delta; the chain collapses
        # only when it grows past FOLD_EVERY (or on read/snapshot) —
        # folds are associative, so lazy collapse is exact
        chain = self.state.get(part)
        if chain is None:
            self.state[part] = [delta]
        else:
            chain.append(delta)
            if len(chain) > self.FOLD_EVERY:
                self._folded(part)
        path = delta_path(self.lake_dir, part, epoch)
        size = atomic_write_parquet(delta, path)
        max_lsn = pc.max(delta["lsn"]).as_py()
        unit = delta["ts"].type.unit
        scale = {"s": 1000, "ms": 1, "us": 1 / 1000, "ns": 1 / 1_000_000}[unit]
        mts = pc.max(delta["ts"].cast(pa.int64())).as_py()
        return {
            "part": part, "file": path, "rows": delta.num_rows,
            "events": events, "bytes": size,
            "secs": time.perf_counter() - t0,
            "max_lsn": max_lsn if max_lsn is not None else -1,
            "max_ts_ms": int(mts * scale) if mts is not None else 0,
        }

    def snapshot(self, part: int, epoch: int) -> str | None:
        """Flush resident state to a base file (O(state), no delta re-read)."""
        cur = self._folded(part)
        if cur is None:
            return None
        path = base_path(self.lake_dir, part, epoch)
        atomic_write_parquet(cur, path)
        return path

    def read_state(self, part: int, committed_files: list[str]) -> pa.Table | None:
        """Point-in-time read of a partition (tombstones dropped)."""
        self._ensure_loaded(part, committed_files)
        cur = self._folded(part)
        if cur is None:
            return None
        return lww_fold_table(cur, drop_deletes=True)

    def resident_bytes(self) -> int:
        return sum(
            sum(t.nbytes for t in chain)
            for chain in self.state.values()
            if chain is not None
        )

    def evict(self, part: int, epoch: int) -> str | None:
        """Spill: snapshot then drop from memory."""
        path = self.snapshot(part, epoch)
        self.state.pop(part, None)
        return path


class MergeActorPool:
    """Driver-side handle: N actors, stable part→actor routing."""

    def __init__(self, lake_dir: str, num_actors: int):
        import ray

        cls = ray.remote(_MergeActorImpl)
        self.actors = [cls.remote(lake_dir) for _ in range(num_actors)]
        self.lake_dir = lake_dir

    def owner(self, part: int):
        return self.actors[part % len(self.actors)]


def replay_files_stateful(
    changelog_path: str,
    *,
    lake_dir: str,
    max_lsn_exclusive: int,
    num_partitions: int = 64,
    num_actors: int = 8,
    epoch_size: int | None = None,
    window: tuple | None = None,
    snapshot_every: int = 8,
    run_id: str | None = None,
    pool: MergeActorPool | None = None,
):
    """Replay via the stateful actor pool. Same manifest/exactly-once/
    resume semantics as replay_files; additionally keeps partition state
    resident and flushes snapshots every ``snapshot_every`` epochs."""
    import ray

    from datax_ray.cdc.exchange import (
        _get_remotes,
        file_lsn_ranges,
        files_overlapping,
    )
    from datax_ray.cdc.replay import ReplayResult, plan_epochs_resuming
    from datax_ray.sources.parquet import changelog_files, unified_schema_of

    files = changelog_files(changelog_path)
    schema = unified_schema_of(files)
    lsn_ranges = file_lsn_ranges(files)
    manifest = Manifest.load_or_create(
        lake_dir, num_partitions=num_partitions,
        source=changelog_path, run_id=run_id,
    )
    pool = pool or MergeActorPool(lake_dir, num_actors)
    map_split, _ = _get_remotes(num_partitions)
    epochs, committed = plan_epochs_resuming(manifest, max_lsn_exclusive, epoch_size)

    t_start = time.perf_counter()
    run_events, n_run, n_skip = 0, 0, 0
    for epoch, (lo, hi) in enumerate(epochs):
        if epoch in committed:
            n_skip += 1
            continue
        t0 = time.perf_counter()
        use = files_overlapping(files, lo, hi, ranges=lsn_ranges)
        gsize = max(1, -(-len(use) // 64))
        groups = [use[i : i + gsize] for i in range(0, len(use), gsize)]
        maps = [
            map_split.remote(g, lo, hi, num_partitions, schema, window)
            for g in groups
        ]
        if num_partitions == 1:
            maps = [[m] for m in maps]
        applies = []
        for p in range(num_partitions):
            # ALWAYS pass the committed file list: the actor skips the load
            # when the partition is resident, and an evicted (or restarted)
            # partition rebuilds from the lake instead of from empty state —
            # passing [] after first touch would silently lose all pre-evict
            # rows at the next snapshot.
            cf = manifest.partition_files(p)
            applies.append(
                pool.owner(p).apply.remote(epoch, p, cf, *[m[p] for m in maps])
            )
        metrics_rows = [r for r in ray.get(applies) if r is not None]
        manifest.commit_epoch(epoch, lo, hi, metrics_rows, time.perf_counter() - t0)
        run_events += sum(int(r["events"]) for r in metrics_rows)
        n_run += 1
        if snapshot_every and n_run % snapshot_every == 0:
            _snapshot_all(pool, manifest, epoch, num_partitions)

    return ReplayResult(
        manifest=manifest, epochs_run=n_run, epochs_skipped=n_skip,
        events_applied=run_events, wall_secs=time.perf_counter() - t_start,
    )


def _snapshot_all(pool: MergeActorPool, manifest: Manifest, epoch: int,
                  num_partitions: int) -> None:
    import ray

    paths = ray.get(
        [pool.owner(p).snapshot.remote(p, epoch) for p in range(num_partitions)]
    )
    for p, path in enumerate(paths):
        if path is not None:
            manifest.commit_compaction(p, path, removed=manifest.partition_files(p))
