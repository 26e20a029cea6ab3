"""Deterministic synthetic transcript & changelog generators.

This is our ``streamreader`` (reference: streamreader/.../StreamReader.java:
24-349 — synthetic constant/random typed rows, ``sliceRecordCount`` rows per
slice, split = replicate config × adviceNumber) re-expressed for CDC: the
job is sliced into blocks, each block generated independently and
deterministically from ``(seed, block_id)`` — so generation parallelizes as
``ray.data.range(n_blocks).flat_map→map_batches`` with no coordination, and
two runs with the same spec are bit-identical regardless of scheduling.

The changelog models otsstreamreader's incremental export (README.md:84-127)
flattened to row ops I/U/D, with the failure modes the north rule demands:
out-of-order timestamps (late updates must lose LWW), duplicated lsn ranges
(source re-delivery must be idempotent), Zipf-hot conversations (skew →
salted re-merge), and an optional schema-evolution point (new ``tool_args``
column + ``turn_idx`` int32→int64 widen from a marked lsn onward).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from datax_ray.schema import CHANGELOG_SCHEMA, TRANSCRIPT_SCHEMA, TS_TYPE

_ROLES = np.array(["system", "user", "assistant", "tool"])
_TOOLS = np.array(["search", "python", "browser", "calculator", "sql", "editor"])
_FRAGMENTS = np.array(
    [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "how vexingly quick daft zebras jump",
        "we promptly judged antique ivory buckles",
        "crazy fredrick bought many very exquisite opal jewels",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "sed do eiusmod tempor incididunt ut labore et dolore",
    ]
)
# one multi-KB outlier fragment (wide-record path; SURVEY.md §7.4.6)
_WIDE = "x" * 4096

BASE_TS_MS = 1_700_000_000_000  # fixed epoch base, keeps ts values stable


@dataclass(frozen=True)
class TranscriptSpec:
    n_convs: int = 1000
    turns_per_conv: int = 16
    seed: int = 42
    n_blocks: int = 8
    wide_every: int = 997  # every k-th row gets a multi-KB text


@dataclass(frozen=True)
class ChangelogSpec:
    n_events: int = 100_000
    n_convs: int = 1000
    max_turns: int = 16
    seed: int = 42
    n_blocks: int = 16
    p_insert: float = 0.5
    p_update: float = 0.4
    p_delete: float = 0.1
    ooo_fraction: float = 0.0   # fraction of events with an *older* ts (late)
    ooo_ms: int = 3_600_000     # how far back a late event's ts can fall
    dup_fraction: float = 0.0   # fraction of each block re-delivered verbatim
    zipf_a: float = 0.0         # 0 = uniform convs; >1 = Zipf-hot convs
    step_ms: int = 10           # ts spacing per lsn
    evolve_from_lsn: int | None = None  # schema evolution point (F3 fixture)


def _text_column(rng: np.random.Generator, n: int, lsn: np.ndarray, wide_every: int) -> pa.Array:
    """Vectorized synthetic text: fragment pair + a per-version marker so
    updates to the same key are observably different (LWW correctness).
    Built with Arrow join kernels — ~3× faster than pandas object concat,
    which matters because bench-input generation is the cold-start pole."""
    import pyarrow.compute as pc

    a = pa.array(_FRAGMENTS[rng.integers(0, len(_FRAGMENTS), n)])
    b = pa.array(_FRAGMENTS[rng.integers(0, len(_FRAGMENTS), n)])
    lsn_str = pc.cast(pa.array(lsn.astype(np.int64)), pa.string())
    # one kernel pass: scalar components broadcast between the arrays,
    # final "" is the join separator → "(frag). (frag) #(lsn)"
    s = pc.binary_join_element_wise(a, ". ", b, " #", lsn_str, "")
    if wide_every:
        wide = (lsn % wide_every) == 0
        if wide.any():
            s_wide = pc.binary_join_element_wise(s, _WIDE, " ")
            s = pc.if_else(pa.array(wide), s_wide, s)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    return s


def generate_transcripts_block(spec: TranscriptSpec, block_id: int) -> pa.Table:
    """Rows for conv range owned by ``block_id`` (contiguous split)."""
    lo = block_id * spec.n_convs // spec.n_blocks
    hi = (block_id + 1) * spec.n_convs // spec.n_blocks
    n_convs = hi - lo
    if n_convs <= 0:
        return TRANSCRIPT_SCHEMA.empty_table()
    rng = np.random.default_rng((spec.seed, 0xBA5E, block_id))
    conv = np.repeat(np.arange(lo, hi, dtype=np.int64), spec.turns_per_conv)
    turn = np.tile(np.arange(spec.turns_per_conv, dtype=np.int32), n_convs)
    n = len(conv)
    conv_id = np.char.add("conv_", np.char.zfill(conv.astype("U8"), 8)).astype(object)
    role = _ROLES[turn % len(_ROLES)]
    tool = np.where(role == "tool", _TOOLS[conv % len(_TOOLS)], None)
    rowid = conv * spec.turns_per_conv + turn
    text = _text_column(rng, n, rowid, spec.wide_every)
    ts = BASE_TS_MS + rowid * 1000
    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": text.cast(pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.int64()).cast(TS_TYPE),
        }
    )


def generate_changelog_block(spec: ChangelogSpec, block_id: int) -> pa.Table:
    """Change events with lsn in the block's contiguous range.

    lsn is globally strictly increasing in generation order (the WAL
    position); duplicated re-deliveries repeat existing (lsn, ts, content)
    verbatim and are appended after the clean range, as a real re-read of a
    WAL tail would deliver them.
    """
    lo = block_id * spec.n_events // spec.n_blocks
    hi = (block_id + 1) * spec.n_events // spec.n_blocks
    n = hi - lo
    if n <= 0:
        return CHANGELOG_SCHEMA.empty_table()
    import pyarrow.compute as _pc

    rng = np.random.default_rng((spec.seed, 0xC0C, block_id))
    lsn = np.arange(lo, hi, dtype=np.int64)

    if spec.zipf_a and spec.zipf_a > 1.0:
        conv = (rng.zipf(spec.zipf_a, n) - 1) % spec.n_convs
    else:
        conv = rng.integers(0, spec.n_convs, n)
    turn = rng.integers(0, spec.max_turns, n).astype(np.int32)

    u = rng.random(n)
    op = np.full(n, "U", dtype=object)
    op[u < spec.p_insert] = "I"
    op[u >= spec.p_insert + spec.p_update] = "D"

    ts = BASE_TS_MS + lsn * spec.step_ms
    if spec.ooo_fraction > 0:
        late = rng.random(n) < spec.ooo_fraction
        ts = ts - late * rng.integers(1, spec.ooo_ms, n)

    conv_id = _pc.binary_join_element_wise(
        "conv_",
        _pc.utf8_lpad(_pc.cast(pa.array(conv.astype(np.int64)), pa.string()), 8, "0"),
        "",
    )
    role = _ROLES[turn % len(_ROLES)].astype(object)
    tool = np.where(role == "tool", _TOOLS[conv % len(_TOOLS)], None)
    text = _text_column(rng, n, lsn, wide_every=997)

    is_del = op == "D"
    role[is_del] = None
    tool[is_del] = None
    text = _pc.if_else(pa.array(is_del), pa.scalar(None, pa.string()),
                       text.cast(pa.string()))

    cols = {
        "lsn": pa.array(lsn),
        "op": pa.array(op, type=pa.string()),
        "conv_id": conv_id.cast(pa.string()),
        "turn_idx": pa.array(turn, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": text,
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts.astype(np.int64)).cast(TS_TYPE),
    }
    table = pa.table(cols)

    if spec.evolve_from_lsn is not None:
        # F3 fixture: from the marked lsn on, events carry a new nullable
        # column `tool_args` and a widened turn_idx (int64, values unchanged)
        evolved_mask = lsn >= spec.evolve_from_lsn
        # vectorized JSON build (Arrow binary_join over the stringified
        # lsn) — a per-row .map(format) here gated how large a soak the
        # fixture generator could afford
        json_all = _pc.binary_join_element_wise(
            '{"arg": ', _pc.cast(pa.array(lsn), pa.string()), "}", "")
        carry = evolved_mask & ~is_del & (np.asarray(role, dtype=object) == "tool")
        tool_args = _pc.if_else(pa.array(carry), json_all,
                                pa.scalar(None, pa.string()))
        table = table.append_column("tool_args", tool_args)
        table = table.set_column(
            table.schema.get_field_index("turn_idx"),
            pa.field("turn_idx", pa.int64()),
            table["turn_idx"].cast(pa.int64()),
        )

    if spec.dup_fraction > 0:
        n_dup = int(n * spec.dup_fraction)
        if n_dup > 0:
            dup_idx = rng.integers(0, n, n_dup)
            table = pa.concat_tables([table, table.take(np.sort(dup_idx))])
    return table


def transcripts_dataset(spec: TranscriptSpec):
    """Lazy distributed generation: one task per block."""
    import ray.data as rd

    return rd.range(spec.n_blocks).map_batches(
        lambda b: generate_transcripts_block(spec, int(b["id"][0])),
        batch_size=1,
        batch_format="pandas",
    )


def changelog_dataset(spec: ChangelogSpec):
    import ray.data as rd

    return rd.range(spec.n_blocks).map_batches(
        lambda b: generate_changelog_block(spec, int(b["id"][0])),
        batch_size=1,
        batch_format="pandas",
    )


def write_changelog_parquet(spec: ChangelogSpec, out_dir: str) -> str:
    """Materialize a changelog to parquet (one file per block — resumable,
    partitioned layout; the bench input is generated once, untimed)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for b in range(spec.n_blocks):
        path = os.path.join(out_dir, f"block-{b:05d}.parquet")
        if not os.path.exists(path):
            t = generate_changelog_block(spec, b)
            pq.write_table(t, path + ".tmp", compression="zstd")
            os.replace(path + ".tmp", path)
    return out_dir
