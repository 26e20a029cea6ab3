"""Incremental (streaming) exact dedup against a persistent fingerprint
index — the CDC-flavored dedup: each arriving epoch of documents is
checked against everything already ingested, without ever rescanning the
corpus.

Batch dedup (ops/dedup.exact_dedup) re-shuffles the whole table; a 100 TB
lake ingesting a new epoch cannot afford that. Instead the engine keeps a
SHARDED MUTABLE FINGERPRINT INDEX as long-lived Ray actors (the one piece
of state the Dataset API genuinely cannot express — a lookup structure
updated across epochs), and each epoch costs:

  epoch → map_batches(fingerprint + partition tag)         # vectorized
        → groupby(part = hash(fp) % P).map_groups(fold)    # ONE shuffle of
                                                           #   epoch rows only
  fold: within-epoch winner per fp (min id, deterministic regardless of
        arrival order) → ONE actor round-trip per partition with the
        epoch's DISTINCT fingerprints → flag every row.

Partitioning invariant: partition p's fingerprints always route to shard
p (same stable hash), so the per-partition fold talks to exactly one
shard — lookups never fan out, and a fingerprint's owner is decided by
exactly one actor (no cross-shard races). Epochs are processed in arrival
order by the driver, so "first occurrence wins" is well-defined: earlier
epoch beats later epoch; within an epoch the smallest ``id_col`` wins.

Index memory at scale: ~40 B per distinct document (hex fp + id in the
shard's arrays). 10^10 docs ≈ 400 GB — sharded over a 256-node cluster
that is ~1.6 GB/node in the default all-RAM mode. For tighter memory
budgets each shard takes ``max_mem_keys``: when the consolidated heap
exceeds it, the heap flushes to a SORTED RUN on disk (fixed-width 'S32'
fps + int64 ids, memory-mapped, probed by vectorized ``searchsorted``)
— the RocksDB-style SST shape, same actor interface, same results
(tests pin spill-forced == all-RAM). Lookups/inserts are vectorized
(pandas ``Index.get_indexer`` — a batched hash-table probe), with chunked
growth and deferred index rebuilds so a shard never rebuilds per batch.

Reference contrast: DataX has no dedup operator; its nearest analogue is
writer-side ``INSERT IGNORE``/PutRow semantics where the TARGET database
owns the uniqueness check (WriterUtil.java:114-200). Here the engine owns
it, so it works against plain Parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from datax_ray.cdc.merge import stable_hash
from datax_ray.ops.text import add_fingerprint


class FingerprintIndexShard:
    """One shard of the shared fingerprint→first-id index.

    Vectorized probe/insert: fingerprints live in a pandas ``Index``
    (hash-table lookups via ``get_indexer``); growth appends to a pending
    chunk and the Index is rebuilt only when the pending chunk exceeds
    ``rebuild_ratio`` of the consolidated part — amortized O(1) per key.
    """

    def __init__(self, rebuild_ratio: float = 0.25,
                 max_mem_keys: int | None = None,
                 spill_dir: str | None = None):
        self._fps: np.ndarray = np.empty(0, dtype=object)
        self._ids: np.ndarray = np.empty(0, dtype=np.int64)
        self._index = pd.Index(self._fps)
        self._pend_fps: list[np.ndarray] = []
        self._pend_ids: list[np.ndarray] = []
        self._pend_n = 0
        self._ratio = rebuild_ratio
        #: disk-backed mode: once the consolidated in-memory part exceeds
        #: ``max_mem_keys``, it is flushed to a SORTED RUN on disk
        #: (fixed-width 'S32' fps + int64 ids, memory-mapped, probed by
        #: searchsorted) and the heap starts empty again. Fingerprints
        #: are globally unique across the index (only misses insert), so
        #: a key lives in exactly one place and probe order is free.
        #: Runs append without merging — probing k runs costs k binary
        #: searches; a production shard would tier-compact them
        #: (RocksDB-style), which only changes constants, not results.
        self._max_mem = max_mem_keys
        self._spill_dir = spill_dir
        self._owns_dir = False
        self._runs: list[tuple[str, str, int]] = []  # (fps_path, ids_path, n)

    def _spill(self) -> None:
        import os
        import tempfile

        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix="datax_fpshard_")
            self._owns_dir = True
        os.makedirs(self._spill_dir, exist_ok=True)
        order = np.argsort(self._fps.astype("S32"), kind="stable")
        run_fps = self._fps.astype("S32")[order]
        run_ids = self._ids[order]
        tag = f"run-{len(self._runs):05d}"
        fps_path = os.path.join(self._spill_dir, f"{tag}-fps.npy")
        ids_path = os.path.join(self._spill_dir, f"{tag}-ids.npy")
        np.save(fps_path, run_fps, allow_pickle=False)
        np.save(ids_path, run_ids, allow_pickle=False)
        self._runs.append((fps_path, ids_path, len(run_fps)))
        self._fps = np.empty(0, dtype=object)
        self._ids = np.empty(0, dtype=np.int64)
        self._index = pd.Index(self._fps)

    def _probe_runs(self, fps: np.ndarray, out: np.ndarray,
                    miss: np.ndarray) -> np.ndarray:
        """Probe every disk run for the still-missing fps; updates
        ``out`` in place and returns the narrowed miss mask."""
        if not self._runs or not miss.any():
            return miss
        mi = np.flatnonzero(miss)
        keys = fps[mi].astype("S32")
        for fps_path, ids_path, n in self._runs:
            if not len(mi):
                break
            run_fps = np.load(fps_path, mmap_mode="r")
            pos = np.searchsorted(run_fps, keys)
            pos_c = np.minimum(pos, n - 1)
            hit = run_fps[pos_c] == keys
            if hit.any():
                run_ids = np.load(ids_path, mmap_mode="r")
                out[mi[hit]] = run_ids[pos_c[hit]]
                mi, keys = mi[~hit], keys[~hit]
        new_miss = np.zeros(len(fps), dtype=bool)
        new_miss[mi] = True
        return new_miss

    def _consolidate(self) -> None:
        if not self._pend_fps:
            return
        self._fps = np.concatenate([self._fps, *self._pend_fps])
        self._ids = np.concatenate([self._ids, *self._pend_ids])
        self._index = pd.Index(self._fps)
        self._pend_fps, self._pend_ids, self._pend_n = [], [], 0
        if self._max_mem is not None and len(self._fps) > self._max_mem:
            self._spill()

    def check_and_insert(self, fps: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """For each (fingerprint, candidate-id): return the OWNING id —
        the already-indexed id if present, else the candidate (which is
        inserted). ``fps`` must be distinct within one call (the caller's
        per-epoch combiner guarantees it)."""
        fps = np.asarray(fps, dtype=object)
        ids = np.asarray(ids, dtype=np.int64)
        out = ids.copy()
        if len(self._fps):
            pos = self._index.get_indexer(fps)
            hit = pos >= 0
            out[hit] = self._ids[pos[hit]]
            miss = ~hit
        else:
            miss = np.ones(len(fps), dtype=bool)
        miss = self._probe_runs(fps, out, miss)
        if miss.any() and self._pend_n:
            # probe the pending (not-yet-consolidated) chunk too — it is
            # ≤ ratio × consolidated size, so this temp index stays cheap
            pfps = np.concatenate(self._pend_fps)
            pids = np.concatenate(self._pend_ids)
            self._pend_fps, self._pend_ids = [pfps], [pids]
            mi = np.flatnonzero(miss)
            ppos = pd.Index(pfps).get_indexer(fps[mi])
            phit = ppos >= 0
            out[mi[phit]] = pids[ppos[phit]]
            miss = np.zeros(len(fps), dtype=bool)
            miss[mi[~phit]] = True
        if miss.any():
            self._pend_fps.append(fps[miss])
            self._pend_ids.append(ids[miss])
            self._pend_n += int(miss.sum())
            if self._pend_n > self._ratio * max(len(self._fps), 1):
                self._consolidate()
        return out

    def size(self) -> int:
        return (len(self._fps) + self._pend_n
                + sum(n for _, _, n in self._runs))

    def stats(self) -> dict:
        return {"mem_keys": len(self._fps) + self._pend_n,
                "spilled_keys": sum(n for _, _, n in self._runs),
                "n_runs": len(self._runs)}

    def clear_spill(self) -> int:
        """Delete this shard's spill runs (and its auto-created temp dir).
        ``ray.kill`` tears the actor down without running any Python, so
        stream owners must call this first or spilled GBs outlive the job
        — ``incremental_dedup`` does."""
        import os
        import shutil

        n = len(self._runs)
        for fps_path, ids_path, _ in self._runs:
            for p in (fps_path, ids_path):
                try:
                    os.remove(p)
                except OSError:
                    pass
        self._runs = []
        if self._owns_dir and self._spill_dir:
            shutil.rmtree(self._spill_dir, ignore_errors=True)
            self._spill_dir, self._owns_dir = None, False
        return n


def start_index(num_shards: int, *, max_mem_keys: int | None = None,
                spill_dir: str | None = None):
    """Spawn the shard actors. The caller owns their lifetime (keep the
    returned handles referenced while the stream runs, ``ray.kill`` them
    when done — Dataset lineage can pin the handles long after).

    ``num_cpus=0``: a shard is a lookup SERVICE (microsecond vectorized
    probes between epochs), not a data-plane worker — reserving whole CPU
    slots for it would starve map/shuffle tasks (on a 4-CPU test cluster,
    8 shards at 0.5 CPU each deadlocked the session outright). SPREAD
    placement distributes the index memory across nodes at scale."""
    import ray

    Shard = ray.remote(FingerprintIndexShard)
    return [
        Shard.options(num_cpus=0, scheduling_strategy="SPREAD").remote(
            max_mem_keys=max_mem_keys,
            spill_dir=None if spill_dir is None
            else f"{spill_dir}/shard-{i:03d}",
        )
        for i in range(num_shards)
    ]


def flag_epoch(ds, shards, *, text_col: str = "text",
               id_col: str = "doc_id", fingerprint_mode: str = "fast"):
    """Flag one epoch's documents against (and into) the index.

    Returns a Dataset of ``(id_col, first_doc_id, is_dup)`` — key-sized
    rows. MUST be consumed (written/materialized) before the next epoch
    is flagged: the index mutates, so epoch order is the semantics.
    """
    num_shards = len(shards)

    def prep(t: pa.Table) -> pa.Table:
        t = add_fingerprint(t.select([id_col, text_col]), text_col,
                            mode=fingerprint_mode)
        t = t.drop_columns([text_col])
        part = (stable_hash(t["fingerprint"])
                % np.uint64(num_shards)).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def fold(g: pa.Table) -> pa.Table:
        import ray

        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "first_doc_id": pa.array([], pa.int64()),
                             "is_dup": pa.array([], pa.bool_())})
        shard = shards[int(g["_part"][0].as_py())]
        g = g.sort_by([("fingerprint", "ascending"), (id_col, "ascending")])
        fps = np.asarray(g["fingerprint"], dtype=object)
        ids = np.asarray(g[id_col]).astype(np.int64)
        # run starts = within-epoch winners (min id per fingerprint)
        starts = np.ones(len(fps), dtype=bool)
        starts[1:] = fps[1:] != fps[:-1]
        owners_distinct = ray.get(shard.check_and_insert.remote(
            fps[starts], ids[starts]))
        # broadcast each run's owner back to its rows
        run_id = np.cumsum(starts) - 1
        owner = owners_distinct[run_id]
        return pa.table({
            id_col: pa.array(ids),
            "first_doc_id": pa.array(owner.astype(np.int64)),
            "is_dup": pa.array(owner != ids),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("_part")
              .map_groups(fold, batch_format="pyarrow"))


def incremental_dedup(epochs, *, num_shards: int = 16,
                      text_col: str = "text", id_col: str = "doc_id",
                      fingerprint_mode: str = "fast",
                      max_mem_keys: int | None = None,
                      spill_dir: str | None = None):
    """Run a sequence of epoch Datasets through a fresh index, in order.

    Each epoch's flags are materialized (they are key-sized — id + id +
    bool — regardless of document size; production streams them to the
    lake sink instead) so the index is fully updated before the next
    epoch is probed. Returns the union of all epochs' flags.
    """
    import ray

    epochs = list(epochs)
    if not epochs:
        raise ValueError("incremental_dedup needs at least one epoch")
    shards = start_index(num_shards, max_mem_keys=max_mem_keys,
                         spill_dir=spill_dir)
    outs = []
    for ds in epochs:
        outs.append(flag_epoch(ds, shards, text_col=text_col,
                               id_col=id_col,
                               fingerprint_mode=fingerprint_mode)
                    .materialize())
    # every epoch's flags are materialized blocks now — the index actors
    # are done. Reclaim spill runs FIRST (ray.kill runs no Python in the
    # actor, so spilled bytes would outlive the job), then kill
    # explicitly: the materialized datasets' lineage keeps the fold
    # closure (and with it the actor handles) alive, so relying on GC
    # leaks the actors for the life of the result.
    ray.get([s.clear_spill.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    out = outs[0]
    return out.union(*outs[1:]) if len(outs) > 1 else out
