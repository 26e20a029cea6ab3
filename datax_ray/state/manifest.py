"""Checkpoint manifest: atomic commit + per-partition lineage.

DataX's only real checkpoint machinery lives in otsstreamreader:
``ShardCheckpoint{shardId, jobVersion, shardIterator, skipCount}`` persisted
per (endTime, shard) in a status table, with job ``version`` fencing and
resume = seek iterator + skip N (reference:
otsstreamreader/.../model/ShardCheckpoint.java:8-118,
core/CheckpointTimeTracker.java, OTSStreamReaderSlaveProxy.java:93-107).
Its exactly-once sink blueprint is hdfswriter's tmp-dir + rename-at-post
(hdfswriter/.../HdfsHelper.java:207-246) and elasticsearchwriter's alias
flip (ESWriter.java:204-208) — stage everything, then publish with one
atomic pointer move.

Here both collapse into ONE artifact: a JSON manifest at the lake root,
committed by write-tmp + ``os.replace`` (atomic on POSIX). Data files are
written to deterministic per-(partition, epoch) paths; a file exists but is
*invisible* until the manifest lists it, and a re-run of an uncommitted
epoch overwrites the same paths with identical content — so replays are
idempotent and the manifest is the single source of truth (the
object-store-safe version of HDFS rename). Lineage per partition:
``source offset (last_lsn) → epoch → committed files`` + throughput/lag
metrics, exactly what the north rule asks to carry.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
import uuid
from contextlib import contextmanager
from typing import Any

MANIFEST_NAME = "_MANIFEST.json"
LOCK_NAME = ".manifest.lock"


@contextmanager
def _lake_lock(lake_dir: str):
    """OS-level advisory lock serializing manifest read-modify-write.

    Fencing is check-then-write: without a lock, a new run's takeover in
    ``load_or_create`` could land between an old run's ``_reload_and_fence``
    and its ``os.replace``, and the stale run would silently clobber the new
    owner. ``flock`` held across the whole critical section makes the
    'newer run wins' contract actually hold for same-host writers (the only
    kind a POSIX lake dir can have; an object-store lake would use a CAS
    pointer instead)."""
    fd = os.open(os.path.join(lake_dir, LOCK_NAME), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


class FencedError(RuntimeError):
    """Another run (different run_id) owns this lake — like otsstreamreader's
    StreamJob.version mismatch abort (OTSStreamReaderMasterProxy.java:28-63)."""


class Manifest:
    def __init__(self, lake_dir: str, state: dict[str, Any]):
        self.lake_dir = lake_dir
        self.state = state

    # ------------------------------------------------------------------ io
    @property
    def path(self) -> str:
        return os.path.join(self.lake_dir, MANIFEST_NAME)

    @classmethod
    def load(cls, lake_dir: str) -> "Manifest":
        """Read-only load (no run_id takeover, no write)."""
        path = os.path.join(lake_dir, MANIFEST_NAME)
        with open(path) as f:
            return cls(lake_dir, json.load(f))

    @classmethod
    def load_or_create(
        cls,
        lake_dir: str,
        *,
        num_partitions: int,
        source: str = "",
        run_id: str | None = None,
    ) -> "Manifest":
        os.makedirs(lake_dir, exist_ok=True)
        path = os.path.join(lake_dir, MANIFEST_NAME)
        with _lake_lock(lake_dir):
            if os.path.exists(path):
                with open(path) as f:
                    state = json.load(f)
                if state["num_partitions"] != num_partitions:
                    raise ValueError(
                        f"lake at {lake_dir} has num_partitions="
                        f"{state['num_partitions']}, requested {num_partitions}"
                    )
                # new run takes ownership (fencing: concurrent old-run
                # commits fail the run_id check in commit_epoch)
                state["run_id"] = run_id or uuid.uuid4().hex
                m = cls(lake_dir, state)
                m._write()
                return m
            state = {
                "version": 1,
                "run_id": run_id or uuid.uuid4().hex,
                "num_partitions": num_partitions,
                "source": source,
                "last_lsn": -1,
                "epochs": [],   # [{epoch, lsn_lo, lsn_hi, wall_secs, events, rows}]
                "partitions": {},  # {part: {last_lsn, base, deltas[], metrics{}}}
            }
            m = cls(lake_dir, state)
            m._write()
            return m

    def _write(self) -> None:
        tmp = self.path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    def _reload_and_fence(self) -> None:
        """Re-read the on-disk manifest and verify this run still owns it.

        A newer run takes ownership by rewriting ``run_id`` in
        ``load_or_create``; any commit attempted afterwards by the old run
        must abort rather than clobber the new owner's state — the same
        contract as otsstreamreader's StreamJob version-mismatch abort
        (OTSStreamReaderMasterProxy.java:28-63). Merging into the freshly
        loaded state (instead of writing the stale in-memory copy) keeps
        commits monotonic even within a run.
        """
        try:
            with open(self.path) as f:
                disk = json.load(f)
        except FileNotFoundError:
            raise FencedError(
                f"manifest at {self.path} disappeared — lake deleted or "
                "taken over by another run"
            ) from None
        if disk.get("run_id") != self.run_id:
            raise FencedError(
                f"lake at {self.lake_dir} is owned by run "
                f"{disk.get('run_id')!r}; this run is {self.run_id!r}"
            )
        self.state = disk

    # ------------------------------------------------------------- queries
    @property
    def run_id(self) -> str:
        return self.state["run_id"]

    @property
    def num_partitions(self) -> int:
        return self.state["num_partitions"]

    @property
    def last_lsn(self) -> int:
        return self.state["last_lsn"]

    def committed_epochs(self) -> set[int]:
        return {e["epoch"] for e in self.state["epochs"]}

    def partition(self, part: int) -> dict[str, Any]:
        return self.state["partitions"].setdefault(
            str(part), {"last_lsn": -1, "base": None, "deltas": [], "metrics": {}}
        )

    def partition_files(self, part: int) -> list[str]:
        """Committed files for a partition, base first then deltas in epoch
        order — the fold order for reads."""
        p = self.state["partitions"].get(str(part))
        if not p:
            return []
        files = []
        if p["base"]:
            files.append(p["base"])
        files.extend(p["deltas"])
        return files

    def partition_files_as_of(self, part: int, epoch: int) -> list[str]:
        """Time-travel file set: the partition's state as of the given
        committed epoch (inclusive). Delta/base filenames carry their
        epoch (``delta-{epoch:06d}``), so the snapshot is just the prefix
        of the fold chain. Raises if compaction already folded history
        past the requested epoch — once a base subsumes later epochs the
        earlier snapshots are gone (standard lakehouse behavior after
        compaction/vacuum; retain a bounded window with the replay
        ``keep_epochs`` knob — the Iceberg/Delta snapshot-expiry contract —
        or raise ``compact_every``)."""
        from datax_ray.sinks.lake import file_epoch

        p = self.state["partitions"].get(str(part))
        if not p:
            return []
        files = []
        if p["base"]:
            if file_epoch(p["base"]) > epoch:
                raise ValueError(
                    f"partition {part}: history before epoch {epoch} was "
                    f"compacted into {os.path.basename(p['base'])} — "
                    "snapshot no longer reconstructable"
                )
            files.append(p["base"])
        files.extend(d for d in p["deltas"] if file_epoch(d) <= epoch)
        return files

    # ------------------------------------------------------------- commits
    def commit_epoch(
        self,
        epoch: int,
        lsn_lo: int,
        lsn_hi: int,
        part_results: list[dict[str, Any]],
        wall_secs: float,
    ) -> None:
        """Publish one epoch atomically. ``part_results`` rows come from the
        merge tasks: {part, file, rows, events, bytes, secs, max_lsn, max_ts_ms}.
        Idempotent: committing an already-committed epoch is a no-op.
        Fenced: raises FencedError if another run has taken ownership;
        the flock spans reload→write so a takeover can't interleave."""
        with _lake_lock(self.lake_dir):
            self._commit_epoch_locked(epoch, lsn_lo, lsn_hi, part_results, wall_secs)

    def _commit_epoch_locked(
        self,
        epoch: int,
        lsn_lo: int,
        lsn_hi: int,
        part_results: list[dict[str, Any]],
        wall_secs: float,
    ) -> None:
        self._reload_and_fence()
        if epoch in self.committed_epochs():
            return
        now_ms = int(time.time() * 1000)
        total_events = 0
        total_rows = 0
        for r in part_results:
            p = self.partition(int(r["part"]))
            p["last_lsn"] = max(p["last_lsn"], int(r.get("max_lsn", -1)))
            p["deltas"].append(r["file"])
            secs = max(float(r.get("secs", 0.0)), 1e-9)
            p["metrics"] = {
                "epoch": epoch,
                "events_applied": int(r["events"]),
                "rows_out": int(r["rows"]),
                "bytes": int(r.get("bytes", 0)),
                "secs": secs,
                "events_per_sec": int(r["events"]) / secs,
                "lag_ms": max(0, now_ms - int(r.get("max_ts_ms", now_ms))),
            }
            total_events += int(r["events"])
            total_rows += int(r["rows"])
        self.state["epochs"].append(
            {
                "epoch": epoch,
                "lsn_lo": lsn_lo,
                "lsn_hi": lsn_hi,
                "events": total_events,
                "rows": total_rows,
                "wall_secs": wall_secs,
            }
        )
        self.state["last_lsn"] = max(self.state["last_lsn"], lsn_hi - 1)
        self._write()

    def commit_compaction(self, part: int, base_file: str, removed: list[str]) -> None:
        with _lake_lock(self.lake_dir):
            self._reload_and_fence()
            p = self.partition(part)
            p["base"] = base_file
            p["deltas"] = [d for d in p["deltas"] if d not in set(removed)]
            self._write()

    def metrics_by_partition(self) -> dict[str, dict[str, Any]]:
        return {k: v.get("metrics", {}) for k, v in self.state["partitions"].items()}
