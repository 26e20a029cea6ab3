"""Deduplication operators — exact and near-dup, built on the same
partition-fold pattern as the CDC merge (combiner → one hash shuffle →
vectorized per-partition fold; no per-key Python loops).

- exact_dedup        — canonical-form md5 fingerprint; keep the lowest
                       doc_id per fingerprint. SQL-oracle-able.
- simhash_candidates — 64-bit SimHash banded into 4×16-bit chunks; docs
                       sharing any band are candidates; verified by
                       Hamming distance ≤ max_hamming.
- minhash_lsh        — word-shingle MinHash signatures banded (b bands ×
                       r rows); bucket groupby produces candidate pairs;
                       verified by signature-estimated Jaccard.
- ngram_jaccard      — exact n-gram Jaccard for pair verification.
- embedding_neardup  — sign-LSH (random hyperplanes, seeded) buckets over
                       an embedding column; exact cosine within buckets.

Scale notes (the partitioning assumptions each op relies on):
* Every op shuffles only (key, id, signature)-sized rows, never full text
  after the first map — the explode factor is bands × ~24 bytes/row.
* Connected components for "keep one per near-dup cluster" uses min-label
  propagation over candidate pairs; the default here resolves components
  on the driver, valid while the *candidate pair* set fits driver memory
  (pairs are rare by construction at reasonable thresholds). At 100 TB run
  the iterative groupby variant (``cc_rounds`` > 0) instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.cdc.merge import _last_per_key_mask, stable_hash
from datax_ray.ops.text import add_fingerprint, add_simhash

#: Hot-bucket ceiling for in-bucket pair generation. A degenerate band hash
#: (empty docs, boilerplate) can put millions of docs in one LSH bucket;
#: np.triu_indices over that is O(n²) compute AND output — a scale-killer.
#: Buckets above the cap are sub-split into id-sorted chunks of ``cap``:
#: all pairs within each chunk + a STAR of links from the first chunk's
#: representative to every other chunk's (so a truly-degenerate
#: all-duplicates bucket still forms ONE connected component downstream,
#: with graph DIAMETER ≤ 4 regardless of bucket size — a chain of reps
#: would hand the label-propagation CC a diameter that grows with bucket
#: size). Work becomes O(n·cap). The recall cost is only cross-chunk pairs
#: inside oversized buckets — which are, by construction, the buckets
#: whose pair set nobody can afford anyway.
DEFAULT_BUCKET_CAP = 2048


def _bucket_pair_indices(n: int, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """(ia, ib) candidate index pairs for an n-doc bucket under the hot-
    bucket cap; input indices must refer to an id-sorted order."""
    if n <= cap:
        return np.triu_indices(n, k=1)
    ia_list, ib_list = [], []
    for s in range(0, n, cap):
        m = min(cap, n - s)
        ia, ib = np.triu_indices(m, k=1)
        ia_list.append(ia + s)
        ib_list.append(ib + s)
    reps = np.arange(0, n, cap)
    ia_list.append(np.full(len(reps) - 1, reps[0]))  # star, not chain
    ib_list.append(reps[1:])
    return np.concatenate(ia_list), np.concatenate(ib_list)


def _distinct_pairs(pairs_ds, *, num_partitions: int = 16):
    """Drop duplicate (id_a, id_b) rows (a pair surfaces once per shared
    band): hash-partition by the pair key, then ONE vectorized
    sort+boundary-mask distinct per partition — no per-pair group calls."""

    def add_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], pa.int32()))
        a = np.asarray(t["id_a"]).astype(np.int64)
        b = np.asarray(t["id_b"]).astype(np.int64)
        key = a * np.int64(1_000_003) + b  # wraparound ok: deterministic
        part = (stable_hash(key) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def fold(g: pa.Table) -> pa.Table:
        g = _first_per_key(g, ["id_a", "id_b"], [])
        return g.drop_columns(["_part"])

    return (
        pairs_ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
    )


# ------------------------------------------------------------- exact dedup
def _first_per_key(table: pa.Table, key_cols, order_cols) -> pa.Table:
    """Keep the first row per key, ordered by ``order_cols`` — vectorized
    (sort + run-start boundary mask), associative like the LWW fold."""
    if table.num_rows == 0:
        return table
    table = table.sort_by([(c, "ascending") for c in (*key_cols, *order_cols)])
    n = table.num_rows
    mask = _last_per_key_mask(table, key_cols)  # run-END mask
    # run-START mask = [True] + run_end[:-1]
    starts = pa.concat_arrays([pa.array([True]), mask.slice(0, n - 1)])
    return table.filter(starts)


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 32, keep_fingerprint: bool = False):
    """Exact dedup on canonical text: hash-partition by fingerprint, keep
    min-id row per fingerprint. combiner-first: each batch pre-dedups
    before the shuffle."""

    def prep(t: pa.Table) -> pa.Table:
        t = add_fingerprint(t, text_col)
        t = _first_per_key(t, ["fingerprint"], [id_col])  # combiner
        part = (stable_hash(t["fingerprint"]) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def fold(g: pa.Table) -> pa.Table:
        g = _first_per_key(g, ["fingerprint"], [id_col])
        drop = ["_part"] + ([] if keep_fingerprint else ["fingerprint"])
        return g.drop_columns([c for c in drop if c in g.column_names])

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
    )


# --------------------------------------------------------------- simhash
def simhash_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3,
                       bucket_cap: int = DEFAULT_BUCKET_CAP):
    """Near-dup candidate pairs via banded SimHash: 4 bands of 16 bits —
    any pair within Hamming distance 3 shares ≥1 band (pigeonhole).
    Returns (id_a, id_b, hamming) pairs with id_a < id_b, deduplicated."""

    def sig(t: pa.Table) -> pa.Table:
        t = add_simhash(t, text_col)
        return t.select([id_col, "simhash"])

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col])
        sh = np.asarray(t["simhash"]).astype(np.uint64)
        parts = []
        for b in range(4):
            band = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), b, dtype=np.int8)),
                        "band_hash": pa.array(band),
                        id_col: pa.array(ids),
                        "simhash": pa.array(sh),
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        ids = np.asarray(g[id_col])
        sh = np.asarray(g["simhash"]).astype(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        ia, ib = _bucket_pair_indices(len(ids), bucket_cap)
        nonself = ids[ia] != ids[ib]  # guard duplicate doc_ids
        if not nonself.all():
            ia, ib = ia[nonself], ib[nonself]
        x = sh[ia] ^ sh[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):  # popcount via vectorized bit-clear loop
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - np.uint64(1))
        keep = ham <= max_hamming
        return pa.table(
            {"id_a": pa.array(ids[ia[keep]]), "id_b": pa.array(ids[ib[keep]]),
             "hamming": pa.array(ham[keep])}
        )

    out = (
        ds.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    # same pair can surface from multiple bands → vectorized distinct
    return _distinct_pairs(out)


# --------------------------------------------------------------- minhash
def minhash_signature_batch(texts, num_perm: int, shingle_k: int,
                            seed: int = 7) -> np.ndarray:
    """(n, num_perm) uint64 signatures over word k-shingles — fully
    vectorized (flat rolling shingle hashes + per-permutation segment-min
    reductions, ops/hashing.py); no per-document Python loop."""
    from datax_ray.ops.hashing import minhash_batch

    return minhash_batch(texts, num_perm, shingle_k, seed)


def minhash_lsh_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                           threshold: float = 0.5, seed: int = 7,
                           bucket_cap: int = DEFAULT_BUCKET_CAP,
                           num_partitions: int = 16):
    """MinHash + LSH near-dup pairs: shingle → minhash → band → bucket
    groupby → distinct candidate pairs → signature join-back verify
    (estimated Jaccard ≥ threshold). Returns (id_a, id_b, est_jaccard).

    Two-phase exchange plan: the band shuffle carries ONLY
    (band:int16, band_hash:u64, id:i64) ≈ 18 bytes × bands per doc; the
    full num_perm×u64 signature (~0.5 KB per doc at 64 perms) is shuffled
    ONCE in the verify join — not replicated into every band row, which
    at 16 bands would put ~16× the signature bytes through the exchange
    (the dominant cost at 100-TB corpus scale). Verify volume is
    2×|candidate pairs|, and pairs are rare by construction."""
    rows = num_perm // bands
    sig_type = pa.list_(pa.uint64(), num_perm)

    def sig_batch(t: pa.Table) -> pa.Table:
        # Arrow column straight into the kernel — tokenize stays in C++
        sigs = minhash_signature_batch(t[text_col], num_perm, shingle_k, seed)
        return pa.table(
            {id_col: t[id_col].cast(pa.int64()),
             "sig": pa.array(list(sigs), sig_type)}
        )

    # signatures computed ONCE, kept in the object store for the verify
    sig_ds = ds.map_batches(sig_batch, batch_format="pyarrow").materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        sig_col = t["sig"].combine_chunks()
        sigs = (sig_col.flatten().to_numpy(zero_copy_only=False)
                .reshape(len(sig_col), num_perm))
        ids = np.asarray(t[id_col])
        P = np.uint64(1099511628211)  # FNV prime; uint64 wraparound fold
        parts = []
        for b in range(bands):
            seg = sigs[:, b * rows : (b + 1) * rows]
            with np.errstate(over="ignore"):
                h = seg[:, 0].copy()
                for j in range(1, rows):
                    h = h * P + seg[:, j]
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), b, dtype=np.int16)),
                        "band_hash": pa.array(h),
                        id_col: pa.array(ids),
                    }
                )
            )
        return pa.concat_tables(parts)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if g.num_rows < 2:
            return empty
        ids = np.sort(np.asarray(g[id_col]))
        ia, ib = _bucket_pair_indices(len(ids), bucket_cap)
        # duplicate doc_ids in the input would otherwise emit (a, a)
        # self-pairs, whose two identical endpoint requests dedupe to ONE
        # attach row and silently shift the even/odd pairing in est_fold
        nonself = ids[ia] != ids[ib]
        if not nonself.all():
            ia, ib = ia[nonself], ib[nonself]
        return pa.table({"id_a": pa.array(ids[ia]), "id_b": pa.array(ids[ib])})

    cand = (
        sig_ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # no separate distinct pass: a pair surfacing from k bands sends k
    # identical endpoint requests to the SAME hash partition, where the
    # verify's attach stage drops duplicates in its one vectorized sort
    return _verify_sig_pairs(
        sig_ds, cand, threshold=threshold, num_perm=num_perm, id_col=id_col,
        num_partitions=num_partitions,
    )


def _verify_sig_pairs(sig_ds, pairs_ds, *, threshold: float, num_perm: int,
                      id_col: str = "doc_id", num_partitions: int = 16):
    """Join signatures back onto candidate pairs (duplicates from multiple
    bands welcome — deduped inside the attach fold) and keep pairs with
    estimated Jaccard ≥ threshold — (id_a, id_b, est_jaccard).

    Exchange 1 co-partitions signatures with pair-endpoint requests by
    hash(id) (sigs move ONCE); a vectorized searchsorted gather attaches
    each endpoint's signature. Exchange 2 re-partitions the two attached
    rows of each pair together by hash(pair key) and compares the
    signature matrices row-wise. Both folds are one numpy pass per
    partition — no per-pair Python."""
    sig_type = pa.list_(pa.uint64(), num_perm)

    def part_of(arr: np.ndarray) -> pa.Array:
        p = (stable_hash(arr) % np.uint64(num_partitions)).astype(np.int32)
        return pa.array(p, pa.int32())

    def tag_sigs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col])
        return pa.table(
            {
                "id": pa.array(ids),
                "sig": t["sig"],
                "key_a": pa.nulls(t.num_rows, pa.int64()),
                "key_b": pa.nulls(t.num_rows, pa.int64()),
                "_part": part_of(ids),
            }
        )

    def tag_requests(t: pa.Table) -> pa.Table:
        a = np.asarray(t["id_a"]).astype(np.int64)
        b = np.asarray(t["id_b"]).astype(np.int64)
        ids = np.concatenate([a, b])
        return pa.table(
            {
                "id": pa.array(ids),
                "sig": pa.nulls(2 * t.num_rows, sig_type),
                "key_a": pa.array(np.concatenate([a, a])),
                "key_b": pa.array(np.concatenate([b, b])),
                "_part": part_of(ids),
            }
        )

    def attach(g: pa.Table) -> pa.Table:
        is_req = pc.is_valid(g["key_a"])
        req = g.filter(is_req)
        sig = g.filter(pc.invert(is_req))
        empty = pa.table(
            {"key_a": pa.array([], pa.int64()), "key_b": pa.array([], pa.int64()),
             "sig": pa.array([], sig_type), "_p2": pa.array([], pa.int32())}
        )
        if req.num_rows == 0 or sig.num_rows == 0:
            return empty
        # dedupe requests: a pair found by k bands sends k identical rows
        # here (same endpoint hash) — one lexsort+mask distinct replaces a
        # whole extra shuffle pass over the pair set
        rid_all = np.asarray(req["id"])
        ka_all = np.asarray(req["key_a"]).astype(np.int64)
        kb_all = np.asarray(req["key_b"]).astype(np.int64)
        ordr = np.lexsort((rid_all, kb_all, ka_all))
        rid_all, ka_all, kb_all = rid_all[ordr], ka_all[ordr], kb_all[ordr]
        uniq = np.empty(len(rid_all), dtype=bool)
        uniq[0] = True
        uniq[1:] = (
            (ka_all[1:] != ka_all[:-1]) | (kb_all[1:] != kb_all[:-1])
            | (rid_all[1:] != rid_all[:-1])
        )
        rid = rid_all[uniq]
        ka = ka_all[uniq]
        kb = kb_all[uniq]

        sid = np.asarray(sig["id"])
        order = np.argsort(sid)
        sid_sorted = sid[order]
        sig_col = sig["sig"].combine_chunks()
        mat = (sig_col.flatten().to_numpy(zero_copy_only=False)
               .reshape(len(sig_col), num_perm))[order]
        pos = np.searchsorted(sid_sorted, rid)
        found = (pos < len(sid_sorted)) & (sid_sorted[np.minimum(pos, len(sid_sorted) - 1)] == rid)
        if not found.all():  # candidate ids always come from sig_ds
            ka, kb = ka[found], kb[found]
            pos = pos[found]
        key = ka * np.int64(1_000_003) + kb  # same key fold as _distinct_pairs
        p2 = (stable_hash(key) % np.uint64(num_partitions)).astype(np.int32)
        taken = mat[pos]
        return pa.table(
            {
                "key_a": pa.array(ka),
                "key_b": pa.array(kb),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(taken.ravel()), num_perm
                ),
                "_p2": pa.array(p2, pa.int32()),
            }
        )

    def est_fold(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
        if g.num_rows == 0:
            return empty
        # the even/odd split below REQUIRES exactly two attached rows per
        # pair; fail loudly rather than mispair if that invariant breaks
        if g.num_rows % 2 != 0:
            raise AssertionError(
                "est_fold: odd attached-row count — a candidate pair lost "
                "an endpoint (duplicate doc_ids upstream?)"
            )
        ka = np.asarray(g["key_a"])
        kb = np.asarray(g["key_b"])
        order = np.lexsort((kb, ka))
        sig_col = g["sig"].combine_chunks()
        mat = (sig_col.flatten().to_numpy(zero_copy_only=False)
               .reshape(len(sig_col), num_perm))[order]
        ka, kb = ka[order], kb[order]
        # two attached rows per pair, now adjacent
        a_side, b_side = mat[0::2], mat[1::2]
        est = (a_side == b_side).mean(axis=1)
        keep = est >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {"id_a": pa.array(ka[0::2][keep]), "id_b": pa.array(kb[0::2][keep]),
             "est_jaccard": pa.array(np.round(est[keep], 6))}
        )

    sigs_tagged = sig_ds.map_batches(tag_sigs, batch_format="pyarrow")
    reqs_tagged = pairs_ds.map_batches(tag_requests, batch_format="pyarrow")
    return (
        sigs_tagged.union(reqs_tagged)
        .groupby("_part")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(est_fold, batch_format="pyarrow")
    )


def ngram_jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.1,
                        max_df: int | None = None,
                        num_partitions: int = 16):
    """EXACT word n-gram Jaccard near-dup pairs via a distributed inverted
    index — no all-pairs stage anywhere:

    1. ``map_batches``: per-doc DISTINCT shingle hashes (Arrow tokenize →
       rolling polynomial fold, the same kernels as MinHash) → flat
       ``(gram, doc_id, set_size)`` postings, ~20 B each — the only thing
       that ever shuffles.
    2. hash-partition by gram; per partition one vectorized kernel turns
       each posting run into its doc pairs (triangular-number decode, no
       per-gram Python loop) — a pair surfaces once per SHARED gram.
    3. hash-partition by pair; run-length count = |intersection|, and
       ``jaccard = inter / (sz_a + sz_b - inter)`` exactly (set sizes ride
       along with the postings, so no join-back).

    Exactness caveat at scale: a gram appearing in ``df`` docs emits
    O(df²) pairs — stopword-like grams explode. ``max_df`` drops posting
    runs longer than that before pair generation: intersections are then
    undercounted by the dropped common grams, i.e. Jaccard is
    UNDER-estimated (recall loss on borderline pairs only, no false
    positives). Docs shorter than ``n`` tokens contribute one whole-doc
    gram (``ngram_jaccard`` scalar semantics); empty docs never pair.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.
    """
    from datax_ray.ops.hashing import (
        _ranges,
        flat_token_hashes,
        shingle_hashes,
    )

    P = np.uint64(num_partitions)

    def postings(t: pa.Table) -> pa.Table:
        th, off = flat_token_hashes(t[text_col])
        sh, soff = shingle_hashes(th, off, n)
        n_docs = t.num_rows
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(soff))
        order = np.lexsort((sh, doc))
        d, g = doc[order], sh[order]
        keep = np.ones(len(d), dtype=bool)  # distinct (doc, gram)
        keep[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
        d, g = d[keep], g[keep]
        sz = np.bincount(d, minlength=n_docs)
        ids = np.asarray(t[id_col]).astype(np.int64)
        return pa.table({
            "gram": pa.array(g),
            id_col: pa.array(ids[d]),
            "sz": pa.array(sz[d].astype(np.int64)),
            "_part": pa.array((stable_hash(g) % P).astype(np.int32)),
        })

    def _run_pairs(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Flat (a, b) in-run index pairs, a < b, for ALL runs at once:
        decode each pair's rank k within its run through the triangular
        root b = ⌈(1+√(1+8k))/2⌉ − fully vectorized."""
        p = counts * (counts - 1) // 2
        total = int(p.sum())
        if total == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        ends = np.cumsum(p)
        k = np.arange(total, dtype=np.int64) - np.repeat(ends - p, p)
        b = np.ceil((1.0 + np.sqrt(1.0 + 8.0 * k)) / 2.0).astype(np.int64)
        # float-precision guard: nudge b until tri(b-1) <= k < tri(b)
        tri = b * (b - 1) // 2
        b -= tri > k
        tri = b * (b - 1) // 2
        b += (tri + b) <= k
        a = k - b * (b - 1) // 2
        base = np.repeat(np.cumsum(counts) - counts, p)
        return base + a, base + b

    def pair_emit(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "sz_a": pa.array([], pa.int64()), "sz_b": pa.array([], pa.int64()),
            "_p2": pa.array([], pa.int32()),
        })
        if g.num_rows < 2:
            return empty
        g = g.sort_by([("gram", "ascending"), (id_col, "ascending")])
        gram = np.asarray(g["gram"]).astype(np.uint64)
        ids = np.asarray(g[id_col]).astype(np.int64)
        sz = np.asarray(g["sz"]).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], gram[1:] != gram[:-1])))
        counts = np.diff(np.append(starts, len(gram)))
        if max_df is not None:
            hot = counts > max_df
            if hot.any():
                drop = np.zeros(len(gram), dtype=bool)
                drop[np.repeat(starts[hot], counts[hot])
                     + _ranges(counts[hot])] = True
                gram, ids, sz = gram[~drop], ids[~drop], sz[~drop]
                starts = np.flatnonzero(np.concatenate(
                    ([True], gram[1:] != gram[:-1]))) if len(gram) else \
                    np.zeros(0, np.int64)
                counts = np.diff(np.append(starts, len(gram)))
        ia, ib = _run_pairs(counts)
        if len(ia) == 0:
            return empty
        id_a, id_b = ids[ia], ids[ib]
        nonself = id_a != id_b  # guard duplicate doc_ids
        id_a, id_b = id_a[nonself], id_b[nonself]
        sz_a, sz_b = sz[ia][nonself], sz[ib][nonself]
        key = id_a.astype(np.uint64) * np.uint64(1_000_003) \
            + id_b.astype(np.uint64)
        return pa.table({
            "id_a": pa.array(id_a), "id_b": pa.array(id_b),
            "sz_a": pa.array(sz_a), "sz_b": pa.array(sz_b),
            "_p2": pa.array((stable_hash(key) % P).astype(np.int32)),
        })

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
        a = np.asarray(g["id_a"]).astype(np.int64)
        b = np.asarray(g["id_b"]).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))))
        inter = np.diff(np.append(starts, len(a))).astype(np.int64)
        sz_a = np.asarray(g["sz_a"]).astype(np.int64)[starts]
        sz_b = np.asarray(g["sz_b"]).astype(np.int64)[starts]
        jac = inter / (sz_a + sz_b - inter)
        keep = jac >= threshold
        if not keep.any():
            return empty
        return pa.table({
            "id_a": pa.array(a[starts][keep]),
            "id_b": pa.array(b[starts][keep]),
            "jaccard": pa.array(np.round(jac[keep], 6)),
        })

    return (
        ds.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part").map_groups(pair_emit, batch_format="pyarrow")
        .groupby("_p2").map_groups(fold, batch_format="pyarrow")
    )


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (pair verification)."""

    def grams(s: str) -> set:
        toks = s.split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a or ""), grams(b or "")
    if not ga and not gb:
        return 1.0
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over candidate pairs → {id: component_min_id}. Driver-side;
    valid while the pair set is small (see module docstring for the
    at-scale label-propagation alternative)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# -------------------------------------------------------- embedding LSH
def embedding_neardup_pairs(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                            dim: int, n_bits: int = 8, threshold: float = 0.9,
                            seed: int = 11,
                            bucket_cap: int = DEFAULT_BUCKET_CAP):
    """Near-dup pairs by cosine ≥ threshold: sign-LSH random-hyperplane
    buckets, exact cosine inside buckets. Pairs in different buckets are
    missed with probability (1 - θ/π)^n_bits — the standard LSH recall
    tradeoff; raise n_bits or use multiple tables for higher recall.

    Hyperplanes come from ``ops.lsh_fixture.lsh_planes`` (float64) and the
    dot products run in float64 so DuckDB's ``list_inner_product`` over the
    planes fixture reproduces the sign decisions — the oracle bridge."""
    from datax_ray.ops.lsh_fixture import lsh_planes

    planes = lsh_planes(dim, n_bits, seed)

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 id_col: pa.array([], t.schema.field(id_col).type),
                 vec_col: pa.array([], t.schema.field(vec_col).type)}
            )
        from datax_ray.ops.similarity import _as_matrix

        vecs = _as_matrix(t[vec_col])
        signs = (vecs @ planes) > 0
        code = (signs.astype(np.uint32) << np.arange(n_bits, dtype=np.uint32)).sum(axis=1)
        return pa.table(
            {
                "bucket": pa.array(code.astype(np.int64)),
                id_col: t[id_col],
                vec_col: t[vec_col],
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if g.num_rows < 2:
            return empty
        ids = np.asarray(g[id_col])
        from datax_ray.ops.similarity import _as_matrix

        vecs = _as_matrix(g[vec_col])
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        # cosine only on the candidate index pairs (capped) — never the
        # full O(n²·d) bucket gram matrix
        ia, ib = _bucket_pair_indices(len(ids), bucket_cap)
        nonself = ids[ia] != ids[ib]  # guard duplicate vec_ids
        if not nonself.all():
            ia, ib = ia[nonself], ib[nonself]
        # round BEFORE the threshold compare — identical boundary behavior
        # to the exact all-pairs baseline and the SQL oracle
        cs = np.round(np.einsum("ij,ij->i", unit[ia], unit[ib]), 6)
        keep = cs >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {"id_a": pa.array(ids[ia[keep]]), "id_b": pa.array(ids[ib[keep]]),
             "cosine": pa.array(cs[keep])}
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )


def connected_components_distributed(pairs_ds, *, max_rounds: int = 20,
                                     id_a: str = "id_a", id_b: str = "id_b",
                                     num_partitions: int = 16):
    """Distributed connected components over candidate pairs by min-label
    propagation — the at-scale alternative to the driver-side union-find.

    Each round: labels, edges AND "parent edges" (label → id, the
    pointer-jumping double hop: joining labels onto these delivers
    label[label[id]], so the remaining label-chain depth halves — O(log
    diameter) rounds, not O(diameter)) are hash-co-partitioned by node
    in ONE exchange; inside each partition a single vectorized
    ``pa.Table.join`` propagates labels along edges, and a
    ``groupby(id).aggregate(Min)`` folds what each node heard with its
    own label. Python runs once per PARTITION on Arrow tables — no
    per-node calls, vs the per-group ``map_groups(emit)`` this replaces
    (one Python call per graph node per round, a scale-killer at
    millions of candidate nodes). (Ray's native ``Dataset.join`` was
    measured 6× slower here: its aggregator actor pools respawn every
    round, and CC is a many-round loop.)

    Partitioning assumption: near-dup candidate components are small —
    the pair generators guarantee it (capped buckets; the hot-bucket
    chunk links form a diameter-≤4 star). A single giant component still
    resolves correctly, but its hub label concentrates one partition and
    rounds slow down (the usual skewed-key caveat). Returns a Dataset of
    (id, component), component = min id of the cluster. Rounds
    materialize the (small) label set — pairs/labels are candidate-
    sized, orders of magnitude below the corpus.
    """
    from ray.data.aggregate import Min

    edges = pairs_ds.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [t[id_a].combine_chunks().cast(pa.int64()),
                     t[id_b].combine_chunks().cast(pa.int64())]
                ),
                "dst": pa.concat_arrays(
                    [t[id_b].combine_chunks().cast(pa.int64()),
                     t[id_a].combine_chunks().cast(pa.int64())]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # small: 2 × candidate pairs

    # labels start as self
    labels = edges.map_batches(
        lambda t: pa.table({"id": t["node"], "label": t["node"]}),
        batch_format="pyarrow",
    ).groupby("id").aggregate(Min("label", alias_name="label")).materialize()

    def part_of(col) -> pa.Array:
        p = (stable_hash(col) % np.uint64(num_partitions)).astype(np.int32)
        return pa.array(p, pa.int32())

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["id"], "dst": pa.nulls(t.num_rows, pa.int64()),
             "label": t["label"], "_part": part_of(t["id"])}
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "dst": t["dst"],
             "label": pa.nulls(t.num_rows, pa.int64()),
             "_part": part_of(t["node"])}
        )

    def tag_parent_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["label"], "dst": t["id"],
             "label": pa.nulls(t.num_rows, pa.int64()),
             "_part": part_of(t["label"])}
        )

    def propagate(g: pa.Table) -> pa.Table:
        """One partition: join labels onto co-partitioned (parent) edges,
        emit (dst, label) messages + label self-rows."""
        is_lab = pc.is_valid(g["label"])
        lab = g.filter(is_lab).select(["node", "label"])
        edg = g.filter(pc.invert(is_lab)).select(["node", "dst"])
        msgs = edg.join(lab, keys=["node"], join_type="inner")
        return pa.table(
            {
                "id": pa.concat_arrays(
                    [msgs["dst"].combine_chunks(), lab["node"].combine_chunks()]
                ),
                "label": pa.concat_arrays(
                    [msgs["label"].combine_chunks(), lab["label"].combine_chunks()]
                ),
            }
        )

    edg_tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()
    # converged when the total label sum stops decreasing; the previous
    # round's sum is CARRIED, not recomputed (labels is materialized, but
    # re-summing it still costs a per-round aggregate pass — measurable
    # when rounds are overhead-bound on small candidate sets)
    old_sum = labels.sum("label")
    for _ in range(max_rounds):
        lab_tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        par_tagged = labels.map_batches(tag_parent_edges, batch_format="pyarrow")
        new_labels = (
            lab_tagged.union(edg_tagged, par_tagged)
            .groupby("_part")
            .map_groups(propagate, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Min("label", alias_name="label"))
            # coalesce: without this the sort-groupby's output block count
            # compounds round over round (≈2× per round) and per-round
            # overhead balloons with block COUNT, not data size
            .repartition(num_partitions)
            .materialize()
        )
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            break
        old_sum = new_sum
    return labels.map_batches(
        lambda t: t.rename_columns(["id", "component"]), batch_format="pyarrow"
    )
