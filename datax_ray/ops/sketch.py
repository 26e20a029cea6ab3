"""Mergeable sketches for distributed approximate statistics.

The reference has no sketch operators (SURVEY.md §2.5 — only counter
roll-ups), but a 100 TB pipeline needs approximate distributions without a
global sort. Pattern (per the Ray guide): emit ONE serialized sketch per
batch from ``map_batches``, merge them in a tiny second stage — sketches
are designed to be mergeable, so the reduction is associative like the LWW
fold.

- ``QuantileSketch`` — a KLL-style compactor ladder over float64 values:
  bounded memory (k per level), merge = concat levels + compact. Rank
  error ~O(1/k) with the standard randomized-compaction guarantee; the
  compactor chooses offsets from a seeded RNG keyed by (seed, level,
  n_compactions) so a given pipeline is deterministic.
- ``distributed_quantiles`` — Dataset → per-batch sketches → driver merge
  → quantile estimates. One pass, no shuffle at all (the merge stage is
  O(batches × k) scalars on the driver or a reduce task).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class QuantileSketch:
    """KLL-style quantile sketch: level ``h`` holds ≤ k items each with
    weight 2^h; a full level is sorted and every other item (random even/
    odd offset) promotes to level h+1."""

    def __init__(self, k: int = 256, seed: int = 17):
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0

    # ------------------------------------------------------------- build
    def update_many(self, values: np.ndarray) -> "QuantileSketch":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return self
        self.n += len(values)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self.k:
                lvl = np.sort(self.levels[h])
                rng = np.random.default_rng(
                    (self.seed, h, self._compactions)
                )
                off = int(rng.integers(0, 2))
                self._compactions += 1
                promoted = lvl[off::2]
                self.levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], promoted]
                )
            h += 1

    # ------------------------------------------------------------- merge
    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], lvl])
        self.n += other.n
        self._compress()
        return self

    # ------------------------------------------------------------ query
    def quantiles(self, qs) -> np.ndarray:
        items = []
        weights = []
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 1 << h, dtype=np.int64))
        if not items:
            return np.full(len(list(qs)), np.nan)
        items = np.concatenate(items)
        weights = np.concatenate(weights)
        order = np.argsort(items, kind="stable")
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights)
        total = cum[-1]
        out = []
        for q in qs:
            target = q * total
            idx = int(np.searchsorted(cum, target, side="left"))
            out.append(items[min(idx, len(items) - 1)])
        return np.asarray(out)

    # -------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            {"k": self.k, "seed": self.seed, "n": self.n,
             "compactions": self._compactions,
             "levels": [lvl.tolist() for lvl in self.levels]}
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "QuantileSketch":
        import pickle

        d = pickle.loads(raw)
        sk = cls(d["k"], d["seed"])
        sk.n = d["n"]
        sk._compactions = d["compactions"]
        sk.levels = [np.asarray(lvl, dtype=np.float64) for lvl in d["levels"]]
        return sk


def distributed_quantiles(ds, column: str, qs, *, k: int = 256, seed: int = 17,
                          group_col: str | None = None):
    """One-pass approximate quantiles of ``column`` — per-batch sketches,
    merged without any shuffle. With ``group_col``, returns per-group
    quantiles (sketch per (batch, group), grouped merge)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[column].cast(pa.float64()))
        if group_col is None:
            sk = QuantileSketch(k, seed).update_many(vals)
            return pa.table({"group": pa.array([""], pa.string()),
                             "sketch": pa.array([sk.to_bytes()], pa.binary())})
        groups = np.asarray(t[group_col]).astype(object)
        out_g, out_s = [], []
        for g in np.unique(groups):
            sk = QuantileSketch(k, seed).update_many(vals[groups == g])
            out_g.append(str(g))
            out_s.append(sk.to_bytes())
        return pa.table({"group": pa.array(out_g, pa.string()),
                         "sketch": pa.array(out_s, pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    merged: dict[str, QuantileSketch] = {}
    for r in rows:
        sk = QuantileSketch.from_bytes(r["sketch"])
        g = r["group"]
        merged[g] = merged[g].merge(sk) if g in merged else sk
    result = {
        g: sk.quantiles(qs) for g, sk in sorted(merged.items())
    }
    if group_col is None:
        return result.get("", np.full(len(list(qs)), np.nan))
    return result


class HyperLogLog:
    """HLL distinct-count sketch (2^p registers, classic bias-corrected
    estimator): mergeable by register-max — the standard distributed
    COUNT DISTINCT companion to the quantile sketch."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rem = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of remainder + 1, vectorized via bit length
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rem.copy()
        mask_top = np.uint64(1) << np.uint64(63)
        alive = np.ones(len(h), dtype=bool)
        for _ in range(64 - self.p + 1):
            top = (cur & mask_top) != 0
            alive &= ~top
            if not alive.any():
                break
            lz[alive] += 1
            cur = cur << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def update_values(self, values) -> "HyperLogLog":
        import pandas as pd

        arr = np.asarray(values, dtype=object)
        return self.update_hashes(pd.util.hash_array(arr, categorize=False))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "HyperLogLog":
        h = cls(raw[0])
        h.registers = np.frombuffer(raw[1:], dtype=np.uint8).copy()
        return h


def distributed_distinct_count(ds, column: str, *, p: int = 12) -> float:
    """One-pass approximate COUNT(DISTINCT column): per-batch HLLs merged
    on the driver — no shuffle, constant memory (2^p bytes per sketch)."""
    def sk(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p).update_values(np.asarray(t[column], dtype=object))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    rows = ds.map_batches(sk, batch_format="pyarrow").take_all()
    total = HyperLogLog(p)
    for r in rows:
        total.merge(HyperLogLog.from_bytes(r["sketch"]))
    return total.estimate()
