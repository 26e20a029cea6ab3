"""Independent reference witness for the LSH signature kernels.

The driver's LSH oracles (minhash_lsh_pairs / simhash_pairs /
embedding_neardup) replay band→bucket→pair→verify in SQL over a parquet
of ENGINE-computed signatures (ops/lsh_fixture.py) — which hash-gates the
plan but leaves the signature kernels themselves without a witness the
engine didn't emit. This file is that witness: a second, deliberately
scalar implementation (per-doc Python loops, Python-int modular
arithmetic — none of the engine's flat-array/reduceat machinery) plus
PINNED literal signature values, so a regression in the vectorized
kernels cannot hide behind two implementations drifting together.

The shared primitive is ``pd.util.hash_array`` (public pandas); all
engine-authored logic — Arrow tokenization, flat offsets, rolling FNV
shingle folds, reduceat minima, bit votes — is re-derived independently
here. Docs are ASCII so Python ``str.split()`` and Arrow
``utf8_split_whitespace`` agree by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datax_ray.ops.hashing import minhash_batch, simhash_batch

_M = (1 << 61) - 1          # engine's _MERSENNE
_FNV = 1099511628211        # engine's _FNV
_W64 = 1 << 64


def _tok_hash(tok: str) -> int:
    return int(pd.util.hash_array(np.array([tok], dtype=object),
                                  categorize=False)[0])


def _tokens(text):
    return [] if text is None else text.split()


def _shingles(text, k: int) -> list[int]:
    th = [_tok_hash(t) for t in _tokens(text)]
    if not th:
        return []
    if len(th) < k:  # whole-doc fold for short docs
        h = th[0]
        for v in th[1:]:
            h = (h * _FNV + v) % _W64
        return [h]
    out = []
    for j in range(len(th) - k + 1):
        h = th[j]
        for step in range(1, k):
            h = (h * _FNV + th[j + step]) % _W64
        out.append(h)
    return out


def _minhash_ref(texts, num_perm: int, k: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M, num_perm, dtype=np.uint64)
    b = rng.integers(0, _M, num_perm, dtype=np.uint64)
    out = np.full((len(texts), num_perm), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    for d, text in enumerate(texts):
        sh = _shingles(text, k)
        if not sh:
            continue
        for j in range(num_perm):
            out[d, j] = min(
                ((int(a[j]) * s) % _W64 + int(b[j])) % _W64 % _M for s in sh)
    return out


def _simhash_ref(texts) -> np.ndarray:
    out = []
    for text in texts:
        th = [_tok_hash(t) for t in _tokens(text)]
        if not th:
            out.append(0)
            continue
        v = 0
        for bit in range(64):
            ones = sum((h >> bit) & 1 for h in th)
            if 2 * ones - len(th) > 0:
                v |= 1 << bit
        out.append(v)
    return np.array(out, dtype=np.uint64)


#: 20 docs covering dup/near-dup/short/empty/null/whitespace shapes —
#: the fixture the engine kernels are judged against.
DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",   # exact dup of 0
    "the quick brown fox leaps over the lazy dog",   # near dup of 0
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
    "a",                      # shorter than shingle_k → whole-doc shingle
    "a b",
    "a b c",                  # exactly k tokens
    "",                       # empty
    None,                     # null
    "  padded   whitespace   tokens  ",
    "repeated repeated repeated repeated repeated",
    "one two three four five six seven eight nine ten",
    "ten nine eight seven six five four three two one",
    "mixed CASE Tokens Mixed case tokens",
    "numbers 1 2 3 42 99 1000",
    "punctuation, tokens! with? marks.",
    "tab\tseparated\ttokens here",
    "newline\nseparated tokens here",
    "unique zebra xylophone quasar nebula",
]

# Literals computed BY THE SCALAR REFERENCE above (not the engine) and
# pinned — if both implementations ever drift together, these fail.
PINNED_MINHASH = {
    0: [12553701264053217, 185731577955421672,
        764516967324434962, 78450626306976946],
    2: [43177721850021258, 356720205364900050,
        453022020254417510, 78450626306976946],
    5: [314722822404238032, 1461863334869595062],
}
PINNED_SIMHASH = {
    0: 16752526971192447336,
    2: 16745771567456424040,
    4: 8151218429091431610,
}


def test_minhash_matches_independent_reference():
    eng = minhash_batch(DOCS, 64, 3, seed=7)
    ref = _minhash_ref(DOCS, 64, 3, seed=7)
    assert np.array_equal(eng, ref)
    # dup doc identical, near-dup shares some (not all) slots
    assert np.array_equal(eng[0], eng[1])
    shared = int((eng[0] == eng[2]).sum())
    assert 0 < shared < 64


def test_minhash_pinned_literals():
    eng = minhash_batch(DOCS, 64, 3, seed=7)
    for d, vals in PINNED_MINHASH.items():
        assert eng[d][: len(vals)].tolist() == vals


def test_simhash_matches_independent_reference():
    eng = simhash_batch(DOCS)
    ref = _simhash_ref(DOCS)
    assert np.array_equal(eng, ref)
    assert eng[0] == eng[1]


def test_simhash_pinned_literals():
    eng = simhash_batch(DOCS)
    for d, val in PINNED_SIMHASH.items():
        assert int(eng[d]) == val


def test_sign_lsh_matches_independent_reference():
    """Embedding sign-LSH: engine buckets by sign(X @ planes); re-derive
    per-vector per-plane with scalar dot products."""
    from datax_ray.ops.lsh_fixture import NEARDUP_PARAMS, lsh_planes

    dim = NEARDUP_PARAMS["dim"]
    n_bits = NEARDUP_PARAMS["n_bits"]
    planes = lsh_planes(dim, n_bits, NEARDUP_PARAMS["seed"])
    rng = np.random.default_rng(123)
    X = rng.standard_normal((10, dim))
    eng_bits = (X @ planes) > 0
    for i in range(10):
        for j in range(n_bits):
            dot = sum(float(X[i, d]) * float(planes[d, j])
                      for d in range(dim))
            assert (dot > 0) == bool(eng_bits[i, j])


def test_fixture_signatures_match_reference(tmp_path):
    """The parquet the DuckDB oracle reads (ensure_lsh_fixture output)
    carries exactly the reference signatures for its source docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_ray.ops import lsh_fixture as LF

    src_dir = tmp_path / "sfx"
    src_dir.mkdir()
    docs = [d if d is not None else "" for d in DOCS]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())}),
        src_dir / "documents.parquet")
    out = LF.ensure_lsh_fixture(str(src_dir))
    sig = pq.read_table(f"{out}/minhash_sigs.parquet")
    got = np.array(sig["sig"].combine_chunks().flatten(),
                   dtype=np.uint64).reshape(len(docs), -1)
    ref = _minhash_ref(docs, LF.MINHASH_PARAMS["num_perm"],
                       LF.MINHASH_PARAMS["shingle_k"],
                       LF.MINHASH_PARAMS["seed"])
    assert np.array_equal(got, ref)
    sh = pq.read_table(f"{out}/simhash.parquet")
    assert np.array_equal(np.asarray(sh["simhash"]), _simhash_ref(docs))


def test_fingerprint_large_offsets_branch(monkeypatch):
    """Batches past the int32-offset capacity take the int64
    (large_string) path and produce identical fingerprints."""
    import pyarrow as pa

    from datax_ray.ops import text as T

    t = pa.table({"text": pa.array(
        [f"doc {i}" for i in range(100)] + [None], pa.string())})
    small = T.add_fingerprint(t)["fingerprint"].to_pylist()
    monkeypatch.setattr(T, "_HEX_INT32_MAX_ROWS", 10)
    large = T.add_fingerprint(t)["fingerprint"].to_pylist()
    assert small == large
