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
    thresh_hex = format(int(fraction * _MD5_SPACE), "08x")
    return (
        f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8) < '{thresh_hex}'"
    )


def reservoir_sample(ds, *, k: int, seed: int = 0):
    """Uniform fixed-k sample without materializing the dataset. Each
    block draws a seeded uniform key per row and keeps its local top-k;
    the global top-k of the candidates equals the top-k over ALL rows'
    keys — an exact uniform k-sample. ≤ k × n_blocks candidate rows reach
    the driver, never the data. Returns a pyarrow Table (≤ k rows).

    Deterministic for a fixed (seed, block content); a repartitioned
    input yields a different — equally uniform — sample."""
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

    cand = ds.map_batches(local, batch_format="pyarrow").take_all()
    if not cand:
        return None
    import pandas as pd

    df = pd.DataFrame(cand)
    df = df.nlargest(min(k, len(df)), "_w").drop(columns=["_w"])
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
