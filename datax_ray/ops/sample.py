"""Deterministic sampling operators for training-data pipelines.

- ``hash_sample``      — keep a row iff a stable hash of its key lands
  under the fraction threshold. Deterministic and REPEATABLE: the same
  key always makes the same decision, so re-runs, resumes and joins over
  two samplings agree (the property ad-hoc ``random()`` sampling loses).
  One vectorized pass, zero shuffle. ``mode='fast'`` (siphash, scale
  path) or ``mode='md5'`` (SQL-oracle parity — DuckDB reproduces the
  decision bit-exactly by comparing the md5 hex prefix, which orders
  identically to the integer it encodes).
- ``reservoir_sample`` — classic fixed-k uniform sample: each block
  keeps its top-``k`` rows by a seeded uniform key (Efraimidis–Spirakis
  with unit weights); the global top-k of the ≤ k × blocks candidates is
  an exact uniform k-sample. Only candidate rows ever leave the blocks.

No reference analogue (DataX copies everything); this is the
training-data-pipeline surface the north rule adds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from datax_ray.cdc.merge import stable_hash

#: md5-mode threshold domain: first 8 hex chars → 32-bit space
_MD5_SPACE = float(1 << 32)


def _md5_hex8(values: list) -> np.ndarray:
    return np.array(
        [
            hashlib.md5(str(v).encode()).hexdigest()[:8]
            if v is not None else "ffffffff"
            for v in values
        ],
        dtype=object,
    )


def hash_sample(ds, *, key_col: str, fraction: float, seed: int = 0,
                mode: str = "fast"):
    """Deterministic Bernoulli-by-key sample of ``fraction`` of rows."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # fraction 1.0 would format as the 9-char '100000000', and lexicographic
    # comparison vs 8-char hex prefixes would keep only ~6% of rows — the
    # boundary fractions short-circuit instead of hitting the hash at all
    if fraction >= 1.0:
        return ds
    if fraction <= 0.0:
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow", zero_copy_batch=True)
    thresh_hex = format(int(fraction * _MD5_SPACE), "08x")

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        if mode == "md5":
            # oracle-parity path (per-row Python — oracle use only): hex
            # prefixes are fixed-length lowercase, so string order ==
            # numeric order and DuckDB can apply the same predicate
            keep = _md5_hex8(t[key_col].to_pylist()) < thresh_hex
        else:
            h = stable_hash(t[key_col]) + np.uint64(seed)
            keep = (h % np.uint64(1 << 32)) < np.uint64(int(fraction * _MD5_SPACE))
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def md5_sample_sql_predicate(key_expr: str, fraction: float) -> str:
    """The DuckDB predicate matching ``hash_sample(mode='md5')`` — e.g.
    ``WHERE {md5_sample_sql_predicate('o_orderkey', 0.1)}``."""
    if fraction >= 1.0:  # same boundary short-circuits as hash_sample
        return "TRUE"
    if fraction <= 0.0:
        return "FALSE"
    thresh_hex = format(int(fraction * _MD5_SPACE), "08x")
    return (
        f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8) < '{thresh_hex}'"
    )


def stratified_sample(ds, *, key_col: str, id_col: str, k: int,
                      mode: str = "fast", seed: int = 0,
                      num_partitions: int = 16):
    """At most ``k`` rows per key — deterministic pseudo-random rank per
    (key, id), combiner-first: each batch pre-prunes to its local top-k
    per key before the one hash shuffle, then a vectorized
    sort+boundary-mask pass keeps the global k smallest ranks per key.
    The training-data use: cap any one source/domain/conversation's
    contribution to a mixture.

    ``mode='md5'`` ranks by ``md5(key || '|' || id)`` so DuckDB reproduces
    the selection exactly (``row_number() OVER (PARTITION BY key ORDER BY
    md5(...))``); ``mode='fast'`` is the vectorized siphash scale path
    with identical distributional behavior."""
    import pyarrow.compute as pc

    def add_rank(t: pa.Table) -> pa.Table:
        if mode == "md5":
            keys = t[key_col].to_pylist()
            ids = t[id_col].to_pylist()
            rank = pa.array(
                [hashlib.md5(f"{a}|{b}".encode()).hexdigest()
                 for a, b in zip(keys, ids)],
                pa.string(),
            )
        else:
            combo = pc.binary_join_element_wise(
                pc.cast(t[key_col], pa.string()),
                pc.cast(t[id_col], pa.string()), "|",
            )
            h = stable_hash(combo) + np.uint64(seed)
            rank = pa.array(h, pa.uint64())
        return t.append_column("_rank", rank)

    def topk_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.sort_by([(key_col, "ascending"), ("_rank", "ascending"),
                       (id_col, "ascending")])
        keys = t[key_col].to_numpy(zero_copy_only=False)
        starts = np.empty(len(keys), dtype=bool)
        starts[0] = True
        starts[1:] = keys[1:] != keys[:-1]
        run_id = np.cumsum(starts) - 1
        run_start = np.flatnonzero(starts)
        pos = np.arange(len(keys)) - run_start[run_id]
        return t.filter(pa.array(pos < k))

    def prep(t: pa.Table) -> pa.Table:
        t = topk_per_key(add_rank(t))  # combiner: batch-local prune
        part = (stable_hash(t[key_col]) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def fold(g: pa.Table) -> pa.Table:
        return topk_per_key(g).drop_columns(["_part", "_rank"])

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
    )


def reservoir_sample(ds, *, k: int, seed: int = 0,
                     num_partitions: int = 32):
    """Uniform fixed-k sample without materializing the dataset. Each
    block draws a seeded uniform key per row and keeps its local top-k;
    the global top-k of the candidates equals the top-k over ALL rows'
    keys — an exact uniform k-sample. ≤ k × n_blocks candidate rows reach
    the driver, never the data. Returns a pyarrow Table (≤ k rows).

    Deterministic for a fixed (seed, block content); a repartitioned
    input yields a different — equally uniform — sample.

    Candidate funnel is TWO-LEVEL so the driver fold stays bounded: block
    top-k → hash-spread groupby fold (``num_partitions`` groups, top-k
    each) → driver folds ≤ k × num_partitions rows, regardless of block
    count (at 10^5–10^6 blocks a single-level take_all would drag
    millions of candidate rows onto the driver)."""
    if k <= 0:
        raise ValueError("k must be positive")

    def local(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("_w", pa.array([], pa.float64()))
        # per-block deterministic rng: seed ⊕ content (first column hash)
        h = int(stable_hash(t[t.column_names[0]])[0]) if n else 0
        rng = np.random.default_rng((seed, n, h))
        u = rng.random(n)
        take = min(k, n)
        idx = np.argpartition(-u, take - 1)[:take]
        return t.take(pa.array(idx)).append_column(
            "_w", pa.array(u[idx], pa.float64())
        )

    def spread(t: pa.Table) -> pa.Table:
        # spread candidates over num_partitions fold groups (round-robin
        # inside the batch: _w is already uniform-random, any
        # _w-independent assignment keeps the top-k exact)
        part = (np.arange(t.num_rows, dtype=np.int64) % num_partitions
                ).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def fold(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"])
        if g.num_rows <= k:
            return g
        w = np.asarray(g["_w"])
        idx = np.argpartition(-w, k - 1)[:k]
        return g.take(pa.array(np.sort(idx)))

    cand = (ds.map_batches(local, batch_format="pyarrow")
            .map_batches(spread, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_part")
            .map_groups(fold, batch_format="pyarrow")
            .take_all())
    if not cand:
        return None
    import pandas as pd

    df = pd.DataFrame(cand)
    df = df.nlargest(min(k, len(df)), "_w").drop(columns=["_w"])
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
