"""Text-analysis operators for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms over Arrow string
columns (re2 kernels — no Python row loops). Where a kernel has an exact
ANSI-SQL equivalent (DuckDB re2 regexes too), the oracle in
``__ray_entry__.oracle_sql`` uses the same pattern, so results match
bit-for-bit:

- token_count      — ``\\S+`` match count (whitespace tokenization) plus a
                     BPE-ish subword estimate (letters / digits / symbol runs)
- quality metrics  — char len, punctuation ratio, stopword ratio, mean
                     token length (rounded to fixed precision)
- lang_id          — stopword-list n-gram heuristic: per-language stopword
                     hit counts, argmax with deterministic tie-break
- fingerprint      — md5 of whitespace-normalized lowercase text (exact
                     near-canonical fingerprint; SQL: md5(regexp_replace(...)))
- simhash64        — 64-bit SimHash over token hashes (not SQL-expressible)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
PUNCT_RE = r"[!-/:-@\[-`{-~]"

# per-language stopword regexes (tiny, deterministic; word-boundary anchored)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "una", "para", "con", "que"],
}
LANG_ORDER = sorted(LANG_STOPWORDS)  # deterministic tie-break: alphabetical


def lang_regex(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def add_token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    s = batch[col]
    batch = batch.append_column(
        "n_tokens", pc.count_substring_regex(s, TOKEN_RE).cast(pa.int64())
    )
    return batch.append_column(
        "n_bpe_tokens", pc.count_substring_regex(s, BPE_RE).cast(pa.int64())
    )


def add_quality(batch: pa.Table, col: str = "text", digits: int = 6) -> pa.Table:
    """Length / punctuation / stopword quality signals, rounded so float
    results are comparable with the SQL oracle."""
    s = batch[col]
    n_chars = pc.utf8_length(s).cast(pa.float64())
    n_tokens = pc.count_substring_regex(s, TOKEN_RE).cast(pa.float64())
    n_punct = pc.count_substring_regex(s, PUNCT_RE).cast(pa.float64())
    n_stop = pc.count_substring_regex(pc.utf8_lower(s), lang_regex("en")).cast(
        pa.float64()
    )
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_toks = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    batch = batch.append_column(
        "punct_ratio", pc.round(pc.divide(n_punct, safe_chars), ndigits=digits)
    )
    batch = batch.append_column(
        "stopword_ratio", pc.round(pc.divide(n_stop, safe_toks), ndigits=digits)
    )
    batch = batch.append_column(
        "mean_token_len",
        pc.round(pc.divide(n_chars, safe_toks), ndigits=digits),
    )
    return batch


def add_lang_id(batch: pa.Table, col: str = "text", out: str = "lang_pred") -> pa.Table:
    """Argmax over per-language stopword hit counts; ties broken by
    alphabetical language order ('unk' when all counts are zero)."""
    low = pc.utf8_lower(batch[col])
    best = None
    best_lang = None
    for lang in LANG_ORDER:
        cnt = pc.count_substring_regex(low, lang_regex(lang)).cast(pa.int64())
        if best is None:
            best, best_lang = cnt, pa.array([lang] * batch.num_rows)
        else:
            better = pc.greater(cnt, best)
            best = pc.if_else(better, cnt, best)
            best_lang = pc.if_else(better, lang, best_lang)
    best_lang = pc.if_else(pc.equal(best, 0), "unk", best_lang)
    return batch.append_column(out, best_lang.cast(pa.string()))


#: rows above which the hex encoder switches to int64 (large_string)
#: offsets — 32×(n+1) must fit int32 below it
_HEX_INT32_MAX_ROWS = 1 << 26


def add_fingerprint(batch: pa.Table, col: str = "text", out: str = "fingerprint",
                    mode: str = "fast") -> pa.Table:
    """Canonical-form document fingerprint over lowercase
    whitespace-collapsed, edge-stripped text.

    Default ``mode='fast'``: 128 bits from two independent vectorized
    siphashes — the scale path, no per-row Python hashing. ``mode='md5'``
    exists for SQL-oracle parity (DuckDB, same RE2 normalization):
    md5(regexp_replace(regexp_replace(lower(text),'\\s+',' ','g'),'^ | $','','g'))
    — it hashes per row in Python, so it is ONLY for oracle-matched queries,
    never the replay/bench path. Both modes induce identical grouping."""
    norm = pc.replace_substring_regex(
        pc.replace_substring_regex(pc.utf8_lower(batch[col]), r"\s+", " "),
        r"^ | $",
        "",
    )
    arr = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
    if mode == "fast":
        # scale path: 128-bit from two independent vectorized siphashes —
        # same grouping semantics as md5, no Python-per-row hashing. Hex
        # encoding is vectorized too (nibble lookup → one flat uint8
        # buffer → StringArray.from_buffers, zero per-row Python): at
        # 10^10 docs a per-row f-string here was the dedup path's only
        # Python-rate term.
        vals = np.asarray(arr, dtype=object)
        h1 = pd.util.hash_array(vals, categorize=False)
        h2 = pd.util.hash_array(vals, hash_key="datax_ray_fp2_16", categorize=False)
        n = len(vals)
        raw = np.empty((n, 16), dtype=np.uint8)
        raw[:, :8] = h1.astype(">u8").view(np.uint8).reshape(n, 8)
        raw[:, 8:] = h2.astype(">u8").view(np.uint8).reshape(n, 8)
        hexdigits = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
        enc = np.empty((n, 32), dtype=np.uint8)
        enc[:, 0::2] = hexdigits[raw >> 4]
        enc[:, 1::2] = hexdigits[raw & 0x0F]
        if n < _HEX_INT32_MAX_ROWS:  # 32*(n+1) must fit int32 offsets
            offsets = np.arange(0, 32 * (n + 1), 32, dtype=np.int32)
            hexes = pa.StringArray.from_buffers(
                n, pa.py_buffer(offsets.tobytes()),
                pa.py_buffer(enc.tobytes()))
        else:  # giant batch: int64 offsets, then down-cast (one copy)
            offsets = np.arange(0, 32 * (n + 1), 32, dtype=np.int64)
            hexes = pa.LargeStringArray.from_buffers(
                n, pa.py_buffer(offsets.tobytes()),
                pa.py_buffer(enc.tobytes())).cast(pa.string())
        col_arr = pc.if_else(
            pc.is_null(arr), pa.scalar(None, pa.string()), hexes)
        return batch.append_column(out, col_arr)
    digests = [
        hashlib.md5(v.encode()).hexdigest() if v is not None else None
        for v in arr.to_pylist()
    ]
    return batch.append_column(out, pa.array(digests, pa.string()))


def winnow_fingerprints(batch: pa.Table, *, col: str = "text",
                        id_col: str = "doc_id", k: int = 8, w: int = 4,
                        mode: str = "fast") -> pa.Table:
    """Winnowing (rolling-hash) document fingerprints — one row per
    (doc_id, fingerprint). Window-min selection over char k-gram rolling
    hashes of the canonical text form; any shared substring of length
    ≥ k+w-1 between two documents yields a shared fingerprint
    (Schleimer/Wilkerson/Aiken, SIGMOD'03).

    ``mode='fast'`` (default, the scale path): vectorized uint64
    polynomial rolling hash (ops/hashing.winnow_batch) → int64 ``fp``.
    ``mode='md5'``: per-gram md5-prefix hex strings, chosen because the
    SQL oracle can reproduce them exactly (DuckDB md5 + window min) —
    per-row Python hashing, oracle-matched queries ONLY.
    Both modes select by the same windowed-min rule."""
    ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
    texts_arr = batch[col]
    if mode == "fast":
        from datax_ray.ops.hashing import winnow_batch

        d_idx, fps = winnow_batch(texts_arr, k=k, w=w)
        return pa.table(
            {
                id_col: ids.take(pa.array(d_idx)),
                "fp": pa.array(fps.astype(np.int64)),
            }
        )
    # RE2 normalization (same chain as add_fingerprint) so the DuckDB
    # oracle is byte-identical — ASCII \s, unlike Python str.split()'s
    # Unicode whitespace, which would diverge on e.g. U+00A0
    arr = texts_arr.combine_chunks() if isinstance(texts_arr, pa.ChunkedArray) else texts_arr
    norm_col = pc.replace_substring_regex(
        pc.replace_substring_regex(pc.utf8_lower(arr), r"\s+", " "),
        r"^ | $",
        "",
    )
    out_ids, out_fps = [], []
    for i, norm in enumerate(norm_col.to_pylist()):
        if not norm:
            continue
        grams = [norm[j:j + k] for j in range(len(norm) - k + 1)]
        if not grams:
            continue
        hs = [hashlib.md5(g.encode()).hexdigest()[:15] for g in grams]
        sel = {min(hs[j:j + w]) for j in range(len(hs))}
        doc = ids[i].as_py()
        out_ids.extend([doc] * len(sel))
        out_fps.extend(sorted(sel))
    return pa.table(
        {id_col: pa.array(out_ids, ids.type), "fp": pa.array(out_fps, pa.string())}
    )


def _token_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.array(toks, dtype=object), categorize=False)


def simhash64(text: str) -> int:
    """64-bit SimHash of whitespace tokens (stable across processes via
    pandas' fixed-key siphash)."""
    h = _token_hashes(text)
    if len(h) == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def add_simhash(batch: pa.Table, col: str = "text", out: str = "simhash") -> pa.Table:
    from datax_ray.ops.hashing import simhash_batch

    return batch.append_column(out, pa.array(simhash_batch(batch[col])))


def chunk_documents(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 128,
                    overlap: int = 16) -> pa.Table:
    """Explode each document into overlapping token windows (context-length
    prep for training): window ``i`` covers tokens
    ``[i·stride, min(i·stride + chunk_tokens, n))`` with
    ``stride = chunk_tokens − overlap``;
    ``n ≤ chunk_tokens`` → one window, empty docs → none. Chunk text is
    the window's tokens re-joined with single spaces (whitespace
    normalization is part of the contract, same as the fingerprint op).

    Fully vectorized map-only explode: one Arrow split per batch, window
    index arithmetic in numpy, one flat token gather + one
    ``binary_join`` — no per-doc Python. Output:
    (id, chunk_idx, n_tokens, chunk_text)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    trimmed = pc.utf8_trim_whitespace(
        pc.fill_null(batch[text_col].combine_chunks(), ""))
    toks = pc.utf8_split_whitespace(trimmed)
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False
                                            ).astype(np.int64)
    n[pc.equal(trimmed, "").to_numpy(zero_copy_only=False)] = 0
    n_chunks = np.where(
        n == 0, 0,
        np.where(n <= chunk_tokens, 1,
                 -((n - chunk_tokens) // -stride) + 1))
    doc_off = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(n, out=doc_off[1:])
    total = int(n_chunks.sum())
    ids = batch[id_col].combine_chunks()
    if total == 0:
        return pa.table({
            id_col: pa.array([], ids.type),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
    ends = np.cumsum(n_chunks)
    doc_of = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    idx = np.arange(total, dtype=np.int64) - np.repeat(ends - n_chunks,
                                                       n_chunks)
    starts = idx * stride
    stops = np.minimum(starts + chunk_tokens, n[doc_of])
    lens = stops - starts
    # flat gather of every window's tokens
    g_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=g_off[1:])
    within = np.arange(int(g_off[-1]), dtype=np.int64) - np.repeat(
        g_off[:-1], lens)
    flat_idx = np.repeat(doc_off[doc_of] + starts, lens) + within
    flat = toks.flatten()
    if (n == 0).any():  # drop the '' artifact token of all-ws docs
        flat = flat.filter(pc.not_equal(flat, ""))
    gathered = flat.take(pa.array(flat_idx))
    # int32 list offsets: a single batch's gathered token count is far
    # below 2^31 (batches are ~10k docs); LargeList would need a different
    # join kernel
    windows = pa.ListArray.from_arrays(pa.array(g_off, pa.int32()), gathered)
    return pa.table({
        id_col: ids.take(pa.array(doc_of)),
        "chunk_idx": pa.array(idx),
        "n_tokens": pa.array(lens),
        "chunk_text": pc.binary_join(windows, " "),
    })


# --------------------------------------------------------------- PII redaction
# Default patterns are RE2-compatible (pyarrow and DuckDB both run RE2, so
# a query and its SQL oracle share exact semantics). Order matters: email
# before phone so the digits of a mailbox aren't partially phone-matched.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d{1,3}-\d{3}-\d{3,4}(-\d{3,4})?", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(batch: pa.Table, col: str = "text", out: str | None = None,
               patterns: list[tuple[str, str]] = PII_PATTERNS) -> pa.Table:
    """Vectorized PII scrub for training-data curation: each (regex,
    replacement) applies globally per document via Arrow's RE2 kernel —
    one C++ pass per pattern, no Python per-row work. Use inside
    ``map_batches(redact_pii, batch_format="pyarrow")``; at 100 TB the
    cost is a few streaming regex passes over the text column, no
    shuffle. ``out=None`` replaces the column in place."""
    s = batch[col]
    for pattern, replacement in patterns:
        s = pc.replace_substring_regex(s, pattern=pattern,
                                       replacement=replacement)
    if out is None:
        return batch.set_column(batch.schema.get_field_index(col), col, s)
    return batch.append_column(out, s)


def add_repetition(batch: pa.Table, col: str = "text", out: str = "rep_ratio",
                   digits: int = 6) -> pa.Table:
    """Gopher-style repetition signal: fraction of tokens that are
    repeats of an earlier token in the same document
    (1 − distinct/total, whitespace tokens). Exact and vectorized:
    Arrow split → dictionary-encode (exact codes, no hash collisions) →
    one np.unique over (doc, code) keys. Map-only; at 100 TB this is a
    per-batch kernel pass with no shuffle."""
    s = batch[col]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    toks = pc.split_pattern(s, " ")
    total = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    codes_arr = toks.flatten().dictionary_encode().indices
    codes = codes_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), total)
    uniq = np.unique((doc_of << 32) | codes)
    distinct = np.bincount(uniq >> 32, minlength=len(batch))
    denom = np.maximum(total, 1).astype(np.float64)  # split never yields
    rep = np.round(1.0 - distinct / denom, digits)   # [] but guard anyway
    return batch.append_column(out, pa.array(rep, pa.float64()))
