"""Synthetic typed-row source — the streamreader equivalent.

Reference: streamreader/.../StreamReader.java:24-349 — each column config is
either a constant ``{"value": v, "type": t}`` or a random range
``{"random": "a,b", "type": t}``; the job emits ``sliceRecordCount`` rows
per slice and ``split`` replicates the config adviceNumber times
(StreamReader.java:175-182). Here a slice = a Ray block: generation is
``rd.range(n_blocks)`` fanned out to per-block deterministic generators
(seeded by (seed, block)), so constants are genuinely O(1) per row and two
runs are identical regardless of scheduling.

Types: string / long / double / date / bool / bytes (the streamreader
column types, StreamReader.java:96-168)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow as pa


@dataclass
class StreamColumn:
    type: str
    value: Any = None          # constant mode
    random: str | None = None  # "lo,hi" mixup mode
    name: str | None = None

    def __post_init__(self):
        self.type = self.type.lower()
        if (self.value is None) == (self.random is None):
            raise ValueError("stream column needs exactly one of value|random")


_PA_TYPES = {
    "string": pa.string(),
    "long": pa.int64(),
    "double": pa.float64(),
    "date": pa.timestamp("ms"),
    "bool": pa.bool_(),
    "bytes": pa.binary(),
}


def _gen_column(col: StreamColumn, n: int, rng: np.random.Generator) -> pa.Array:
    t = col.type
    if col.value is not None:
        if t == "string":
            return pa.array([str(col.value)] * n, pa.string())
        if t == "long":
            return pa.array(np.full(n, int(col.value), np.int64))
        if t == "double":
            return pa.array(np.full(n, float(col.value), np.float64))
        if t == "bool":
            return pa.array([str(col.value).lower() == "true"] * n, pa.bool_())
        if t == "date":
            import pandas as pd

            ms = int(pd.Timestamp(col.value).value // 1_000_000)
            return pa.array(np.full(n, ms, np.int64)).cast(pa.timestamp("ms"))
        if t == "bytes":
            return pa.array([str(col.value).encode()] * n, pa.binary())
    lo, hi = (int(x) for x in col.random.split(","))
    if t == "long":
        return pa.array(rng.integers(lo, hi + 1, n, dtype=np.int64))
    if t == "double":
        return pa.array(lo + rng.random(n) * (hi - lo))
    if t == "string":
        lens = rng.integers(lo, hi + 1, n)
        alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
        return pa.array(["".join(alphabet[rng.integers(0, 36, l)]) for l in lens])
    if t == "bool":
        return pa.array(rng.integers(0, 2, n).astype(bool))
    if t == "date":
        ms = rng.integers(lo, hi, n, dtype=np.int64)
        return pa.array(ms).cast(pa.timestamp("ms"))
    if t == "bytes":
        lens = rng.integers(lo, hi + 1, n)
        return pa.array([rng.integers(0, 256, l, dtype=np.uint8).tobytes() for l in lens])
    raise ValueError(f"unsupported stream column type: {t}")


def stream_table(columns: list[StreamColumn | dict], n_rows: int, *, seed: int = 0,
                 block: int = 0) -> pa.Table:
    cols = [c if isinstance(c, StreamColumn) else StreamColumn(**c) for c in columns]
    rng = np.random.default_rng((seed, 0x57EA, block))
    return pa.table(
        {c.name or f"col{i}": _gen_column(c, n_rows, rng) for i, c in enumerate(cols)}
    )


def stream_dataset(columns: list[StreamColumn | dict], *, rows_per_slice: int,
                   n_slices: int, seed: int = 0):
    """sliceRecordCount rows × adviceNumber slices, one task per slice."""
    import ray.data as rd

    cols = [c if isinstance(c, StreamColumn) else StreamColumn(**c) for c in columns]
    return rd.range(n_slices).map_batches(
        lambda b: stream_table(cols, rows_per_slice, seed=seed, block=int(b["id"][0])),
        batch_size=1,
        batch_format="pandas",
    )
