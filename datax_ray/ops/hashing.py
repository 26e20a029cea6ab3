"""Vectorized batch hashing kernels for dedup: flat-token arrays +
``np.ufunc.reduceat`` segment reductions — no per-document Python loops.

Tokenization itself (``str.split`` over object strings) is C-level pandas;
everything after — token hashing, rolling k-shingle hashes, per-permutation
MinHash minima, SimHash bit votes — is pure numpy over ONE flat array per
batch with document boundaries expressed as offsets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = np.uint64((1 << 61) - 1)
_FNV = np.uint64(1099511628211)


def flat_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """→ (flat uint64 token hashes, doc offsets of length n+1).

    ``texts`` may be a list[str | None] OR a pyarrow (Chunked)Array —
    tokenization stays in Arrow C++ (trim + split_whitespace; no Python
    list-of-lists materialization); only the final token hashing crosses
    to object strings because ``pd.util.hash_array`` needs them.
    Byte-identical to the previous pandas ``str.split`` path
    (tests/test_round4.py pins it): Arrow emits edge empties on untrimmed
    text, so trim first; an all-whitespace doc then splits to [''],
    masked to 0 tokens below."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(pd.Series(texts, dtype=object).fillna(""), pa.string())
    n = len(arr)
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(arr, ""))
    toks = pc.utf8_split_whitespace(trimmed)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False
                                                  ).astype(np.int64)
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    lengths[empty] = 0
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if offsets[-1] == 0:
        return np.zeros(0, dtype=np.uint64), offsets
    flat = toks.flatten()
    if empty.any():  # drop the one '' artifact token per empty doc
        flat = flat.filter(pc.not_equal(flat, ""))
    flat_obj = flat.to_numpy(zero_copy_only=False).astype(object)
    return pd.util.hash_array(flat_obj, categorize=False), offsets


def shingle_hashes(th: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-token shingle hashes per document (polynomial fold with
    uint64 wraparound), restricted to windows fully inside one doc.
    Documents shorter than k contribute ONE whole-doc shingle (matching the
    scalar implementation's semantics). Returns (flat shingle hashes,
    shingle offsets per doc)."""
    n_docs = len(offsets) - 1
    lengths = np.diff(offsets)
    n_tok = int(offsets[-1])
    with np.errstate(over="ignore"):
        if n_tok >= k:
            roll = th[: n_tok - k + 1].copy()
            for j in range(1, k):
                roll = roll * _FNV + th[j : n_tok - k + 1 + j]
        else:
            roll = np.zeros(0, dtype=np.uint64)
        # whole-doc fold for short docs
        short = lengths < k
    # per-doc output window counts: k-windows fully inside the doc, or one
    # whole-doc shingle for docs shorter than k
    out_counts = np.where(short, np.minimum(lengths, 1), lengths - k + 1)
    sh_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(out_counts, out=sh_offsets[1:])
    out = np.empty(int(sh_offsets[-1]), dtype=np.uint64)
    if len(roll):
        # windows starting at flat token i live in roll[i]; a doc's valid
        # windows are the first (len-k+1) starting at its token offset
        long_docs = np.flatnonzero(~short & (lengths > 0))
        counts = np.maximum(lengths - k + 1, 0)
        r = _ranges(counts[long_docs])
        src_idx = np.repeat(offsets[:-1][long_docs], counts[long_docs]) + r
        dst_idx = np.repeat(sh_offsets[:-1][long_docs], counts[long_docs]) + r
        out[dst_idx] = roll[src_idx]
    # short docs: whole-doc polynomial fold via segment reduction
    short_docs = np.flatnonzero(short & (lengths > 0))
    if len(short_docs):
        with np.errstate(over="ignore"):
            for d in short_docs:  # rare path (len<k); tiny loop
                seg = th[offsets[d] : offsets[d + 1]]
                h = seg[0]
                for v in seg[1:]:
                    h = h * _FNV + v
                out[sh_offsets[d]] = h
    return out, sh_offsets


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized arange-per-segment)."""
    if len(counts) == 0 or counts.sum() == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    idx = np.arange(int(ends[-1]), dtype=np.int64)
    return idx - np.repeat(ends - counts, counts)


def minhash_batch(texts, num_perm: int, shingle_k: int,
                  seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures, fully vectorized:
    one rolling-shingle pass + num_perm segment-min reductions."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    th, offsets = flat_token_hashes(texts)
    sh, sh_off = shingle_hashes(th, offsets, shingle_k)
    n_docs = len(texts)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return out
    seg_counts = np.diff(sh_off)
    nonempty = seg_counts > 0
    starts = sh_off[:-1][nonempty]
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            vals = (a[j] * sh + b[j]) % _MERSENNE
            mins = np.minimum.reduceat(vals, starts)
            out[nonempty, j] = mins
    return out


def winnow_batch(texts: list[str | None], k: int = 8, w: int = 4
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): rolling polynomial hashes over char
    k-grams of normalized text, then the minimum of each w-gram window is
    selected; the distinct selected hashes are the document's fingerprint
    set (guarantees: any shared substring of length ≥ k+w-1 yields a
    shared fingerprint).

    Fully vectorized over the whole batch: one flat byte array with doc
    offsets, one rolling-hash pass, w shifted-minimum passes (windows are
    clamped at doc tails), one lexsort for per-doc distinct. Returns
    (doc_index int64 array, fingerprint uint64 array) — exploded rows.
    """
    # normalization MUST match add_fingerprint's Arrow RE2 chain exactly
    # (ASCII \s semantics) — pandas/Python regex \s is Unicode, so e.g.
    # U+00A0 would canonicalize differently between 'fast' and 'md5'
    # winnow modes and the two could disagree on shared substrings
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(pd.Series(texts, dtype=object).fillna(""), pa.string())
    arr = pc.fill_null(arr, "")
    norm = pc.replace_substring_regex(
        pc.replace_substring_regex(pc.utf8_lower(arr), r"\s+", " "),
        r"^ | $",
        "",
    )
    # A StringArray IS the flat UTF-8 byte array + offsets this kernel
    # wants — read both buffers directly (large_string for int64
    # offsets) instead of per-row to_pylist/encode/join, which was the
    # last Python-rate term on the winnowing path.
    big = norm.cast(pa.large_string())
    if isinstance(big, pa.ChunkedArray):
        big = big.combine_chunks()
    n_docs = len(big)
    raw_off = np.frombuffer(big.buffers()[1], dtype=np.int64)[
        big.offset : big.offset + n_docs + 1]
    lengths = np.diff(raw_off)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    gram_counts = np.maximum(lengths - k + 1, 0)
    g_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(gram_counts, out=g_off[1:])
    n_grams = int(g_off[-1])
    if n_grams == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    data = np.frombuffer(big.buffers()[2], dtype=np.uint8)
    flat = data[raw_off[0] : raw_off[0] + total].astype(np.uint64)
    # rolling hash of every k-byte window of the flat array (windows that
    # cross doc boundaries are never selected below)
    with np.errstate(over="ignore"):
        roll = flat[: total - k + 1].copy()
        for j in range(1, k):
            roll = roll * _FNV + flat[j : total - k + 1 + j]
    # per-doc gram hashes: doc d's grams start at flat offset[d]
    docs_nz = np.flatnonzero(gram_counts > 0)
    r = _ranges(gram_counts[docs_nz])
    src = np.repeat(offsets[:-1][docs_nz], gram_counts[docs_nz]) + r
    h = roll[src]                      # flat per-doc gram hashes
    doc_idx = np.repeat(docs_nz, gram_counts[docs_nz])
    # windowed min with tail clamped at each doc's last gram
    doc_g_end = np.repeat(g_off[1:][docs_nz], gram_counts[docs_nz])
    pos = np.arange(n_grams, dtype=np.int64)
    fp = h.copy()
    inf = np.uint64(np.iinfo(np.uint64).max)
    for sft in range(1, w):
        idx = np.minimum(pos + sft, n_grams - 1)
        cand = np.where(pos + sft < doc_g_end, h[idx], inf)
        fp = np.minimum(fp, cand)
    # per-doc distinct (lexsort + adjacent-unique mask)
    order = np.lexsort((fp, doc_idx))
    d_s, f_s = doc_idx[order], fp[order]
    keep = np.empty(n_grams, dtype=bool)
    keep[0] = True
    keep[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
    return d_s[keep], f_s[keep]


def simhash_batch(texts) -> np.ndarray:
    """(n_docs,) uint64 SimHash over whitespace tokens — 64 segment-sum
    reductions over the flat token-hash array."""
    th, offsets = flat_token_hashes(texts)
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(th) == 0:
        return out
    seg_counts = np.diff(offsets)
    nonempty = seg_counts > 0
    starts = offsets[:-1][nonempty]
    lengths = seg_counts[nonempty].astype(np.int64)
    for bit in range(64):
        bits = ((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bits, starts)
        votes = 2 * ones - lengths  # (+1 per one, -1 per zero)
        out[nonempty] |= (votes > 0).astype(np.uint64) << np.uint64(bit)
    return out
