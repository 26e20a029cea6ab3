"""Property-based tests (hypothesis): the vectorized LWW fold must agree
with a brute-force per-key dict fold on arbitrary event sequences, and
must stay associative under arbitrary partitions of the input."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from datax_ray.cdc.merge import lww_fold_table, partial_lww_combiner

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),          # conv
        st.integers(0, 3),          # turn
        st.sampled_from("IUD"),     # op
        st.integers(0, 50),         # ts (many collisions on purpose)
        st.text(max_size=8),        # text payload
    ),
    min_size=0,
    max_size=60,
)


def to_table(rows):
    # lsn = position in the log (strictly increasing)
    return pa.table(
        {
            "lsn": pa.array(np.arange(len(rows), dtype=np.int64)),
            "op": pa.array([r[2] for r in rows], pa.string()),
            "conv_id": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[4] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.int64()).cast(pa.timestamp("ms")),
        }
    )


def brute_force(rows):
    """Reference fold: max over (ts, lsn) per key; D ⇒ absent."""
    state = {}
    for lsn, r in enumerate(rows):
        key = (f"c{r[0]}", r[1])
        version = (r[3], lsn)
        if key not in state or version > state[key][0]:
            state[key] = (version, r[2], r[4])
    return {
        k: (v[1], v[2]) for k, v in state.items() if v[1] != "D"
    }


def folded_to_dict(t: pa.Table):
    return {
        (c, ti): (op, tx)
        for c, ti, op, tx in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
            t["op"].to_pylist(), t["text"].to_pylist(),
        )
    }


@settings(max_examples=100, deadline=None)
@given(events_strategy)
def test_fold_matches_bruteforce(rows):
    t = to_table(rows)
    out = lww_fold_table(t, drop_deletes=True)
    assert folded_to_dict(out) == brute_force(rows)


@settings(max_examples=50, deadline=None)
@given(events_strategy, st.integers(1, 5))
def test_fold_associative_under_any_partition(rows, n_chunks):
    t = to_table(rows)
    direct = lww_fold_table(t, drop_deletes=True)
    # fold arbitrary contiguous chunks first, then fold the partials
    size = max(1, -(-max(1, t.num_rows) // n_chunks))
    partials = [
        partial_lww_combiner(t.slice(i, size))
        for i in range(0, max(1, t.num_rows), size)
    ]
    refolded = lww_fold_table(pa.concat_tables(partials), drop_deletes=True)
    assert folded_to_dict(refolded) == folded_to_dict(direct)


@settings(max_examples=50, deadline=None)
@given(events_strategy)
def test_duplicate_redelivery_idempotent(rows):
    t = to_table(rows)
    clean = lww_fold_table(t, drop_deletes=True)
    duped = lww_fold_table(pa.concat_tables([t, t]), drop_deletes=True)
    assert folded_to_dict(duped) == folded_to_dict(clean)


# ---------------------------------------------------------------- winnowing
@given(
    st.text(alphabet="abcdefgh ", min_size=11, max_size=60),
    st.text(alphabet="qrstuvwx ", min_size=0, max_size=20),
    st.text(alphabet="qrstuvwx ", min_size=0, max_size=20),
)
@settings(max_examples=60, deadline=None)
def test_winnow_shared_substring_guarantee(shared, pre, post):
    """Winnowing guarantee (Schleimer et al.): two docs sharing a substring
    of length >= k+w-1 (after normalization) share >= 1 fingerprint."""
    from datax_ray.ops.hashing import winnow_batch

    k, w = 8, 4
    a = (pre + " " + shared + " " + post).strip()
    b = (post + " " + shared + " " + pre).strip()
    norm = " ".join(shared.split())
    d, f = winnow_batch([a, b], k=k, w=w)
    if len(norm) >= k + w - 1:
        fa = set(f[d == 0].tolist())
        fb = set(f[d == 1].tolist())
        assert fa & fb


@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=12))
@settings(max_examples=60, deadline=None)
def test_winnow_deterministic_and_bounded(texts):
    from datax_ray.ops.hashing import winnow_batch

    d1, f1 = winnow_batch(texts)
    d2, f2 = winnow_batch(texts)
    assert (d1 == d2).all() and (f1 == f2).all()
    for i, t in enumerate(texts):
        # model the bound with the SAME normalization winnow_batch applies
        # (Arrow RE2, ASCII \s) — Python str.split() collapses Unicode
        # whitespace like U+00A0 that the canonical form deliberately keeps
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(pa.array([t or ""])), r"\s+", " "
            ),
            r"^ | $",
            "",
        )[0].as_py()
        n = len(norm.encode())
        n_grams = max(n - 8 + 1, 0)
        assert (d1 == i).sum() <= n_grams


# ---------------------------------------------------------------- incdedup
fp_batches_strategy = st.lists(
    st.lists(st.integers(0, 40), min_size=1, max_size=12, unique=True),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(batches=fp_batches_strategy, cap=st.sampled_from([None, 1, 4, 16]))
def test_fingerprint_shard_matches_dict_fold(batches, cap, tmp_path_factory):
    """FingerprintIndexShard (any memory cap, spills included) must agree
    with a first-wins dict on arbitrary probe/insert sequences."""
    from datax_ray.ops.incdedup import FingerprintIndexShard

    spill = str(tmp_path_factory.mktemp("shard")) if cap is not None else None
    sh = FingerprintIndexShard(rebuild_ratio=0.3, max_mem_keys=cap,
                               spill_dir=spill)
    ref: dict[str, int] = {}
    next_id = 0
    for keys in batches:
        fps = np.array([f"{k:032x}" for k in keys], dtype=object)
        ids = np.arange(next_id, next_id + len(keys), dtype=np.int64)
        next_id += len(keys)
        got = sh.check_and_insert(fps, ids)
        want = []
        for fp, i in zip(fps, ids):
            want.append(ref.setdefault(fp, int(i)))
        assert list(got) == want
    assert sh.size() == len(ref)


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(st.one_of(st.none(), st.text(max_size=20)),
                      min_size=0, max_size=30))
def test_fast_fingerprint_hex_matches_scalar_format(texts):
    """The vectorized nibble-lookup hex encoding must equal the scalar
    f-string formatting of the same two siphashes, null mask included."""
    import pandas as pd
    import pyarrow.compute as pc

    from datax_ray.ops.text import add_fingerprint

    t = pa.table({"text": pa.array(texts, pa.string())})
    got = add_fingerprint(t)["fingerprint"].to_pylist()
    norm = pc.replace_substring_regex(
        pc.replace_substring_regex(pc.utf8_lower(t["text"]), r"\s+", " "),
        r"^ | $", "")
    arr = norm.combine_chunks()
    vals = np.asarray(arr, dtype=object)
    h1 = pd.util.hash_array(vals, categorize=False)
    h2 = pd.util.hash_array(vals, hash_key="datax_ray_fp2_16",
                            categorize=False)
    want = [None if v is None else f"{a:016x}{b:016x}"
            for v, a, b in zip(texts, h1, h2)]
    assert got == want
