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
#: all pairs within each chunk + links between consecutive chunk
#: representatives (so a truly-degenerate all-duplicates bucket still forms
#: ONE connected component downstream). Work becomes O(n·cap). The recall
#: cost is only cross-chunk pairs inside oversized buckets — which are, by
#: construction, the buckets whose pair set nobody can afford anyway.
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
    ia_list.append(reps[:-1])
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
def minhash_signature_batch(texts: list[str | None], num_perm: int, shingle_k: int,
                            seed: int = 7) -> np.ndarray:
    """(n, num_perm) uint64 signatures over word k-shingles — fully
    vectorized (flat rolling shingle hashes + per-permutation segment-min
    reductions, ops/hashing.py); no per-document Python loop."""
    from datax_ray.ops.hashing import minhash_batch

    return minhash_batch(texts, num_perm, shingle_k, seed)


def minhash_lsh_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                           threshold: float = 0.5, seed: int = 7,
                           bucket_cap: int = DEFAULT_BUCKET_CAP):
    """MinHash + LSH near-dup pairs: shingle → minhash → band → bucket
    groupby → pairwise signature-estimated Jaccard ≥ threshold.
    Returns (id_a, id_b, est_jaccard)."""
    rows = num_perm // bands

    def sig_and_bands(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sigs = minhash_signature_batch(texts, num_perm, shingle_k, seed)
        ids = np.asarray(t[id_col])
        band_hashes = np.empty((len(ids), bands), dtype=np.uint64)
        P = np.uint64(1099511628211)  # FNV prime; uint64 wraparound fold
        for b in range(bands):
            seg = sigs[:, b * rows : (b + 1) * rows]
            with np.errstate(over="ignore"):
                h = seg[:, 0].copy()
                for j in range(1, rows):
                    h = h * P + seg[:, j]
            band_hashes[:, b] = h
        parts = []
        for b in range(bands):
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), b, dtype=np.int16)),
                        "band_hash": pa.array(band_hashes[:, b]),
                        id_col: pa.array(ids),
                        "sig": pa.array(list(sigs), pa.list_(pa.uint64(), num_perm)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
        if g.num_rows < 2:
            return empty
        ids = np.asarray(g[id_col])
        sig_col = g["sig"].combine_chunks()
        # fixed-size-list → zero-copy flat reshape (no per-row np.stack)
        sigs = (sig_col.flatten().to_numpy(zero_copy_only=False)
                .reshape(len(sig_col), sig_col.type.list_size))
        order = np.argsort(ids)
        ids, sigs = ids[order], sigs[order]
        ia, ib = _bucket_pair_indices(len(ids), bucket_cap)
        est = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = est >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {"id_a": pa.array(ids[ia[keep]]), "id_b": pa.array(ids[ib[keep]]),
             "est_jaccard": pa.array(np.round(est[keep], 6))}
        )

    out = (
        ds.map_batches(sig_and_bands, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    return _distinct_pairs(out)


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
    tradeoff; raise n_bits or use multiple tables for higher recall."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits)).astype(np.float32)

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 id_col: pa.array([], t.schema.field(id_col).type),
                 vec_col: pa.array([], t.schema.field(vec_col).type)}
            )
        from datax_ray.ops.similarity import _as_matrix

        vecs = _as_matrix(t[vec_col]).astype(np.float32)
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
        cs = np.einsum("ij,ij->i", unit[ia], unit[ib])
        keep = cs >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {"id_a": pa.array(ids[ia[keep]]), "id_b": pa.array(ids[ib[keep]]),
             "cosine": pa.array(np.round(cs[keep], 6))}
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
    )


def connected_components_distributed(pairs_ds, *, max_rounds: int = 20,
                                     id_a: str = "id_a", id_b: str = "id_b"):
    """Distributed connected components over candidate pairs by min-label
    propagation — the at-scale alternative to the driver-side union-find.

    Each round is two groupbys (no joins): nodes broadcast their current
    label along edges, every node takes the min of what it hears plus its
    own label. Converges in O(diameter) rounds; near-dup clusters are tiny
    (diameter ≤ a few), so 3–5 rounds typically suffice. Returns a Dataset
    of (id, component) with component = min id of the cluster.

    Rounds materialize the (small) label set — pairs/labels are candidate-
    sized, orders of magnitude below the corpus, so this is cheap relative
    to the candidate generation that produced them.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = pairs_ds.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t[id_a].combine_chunks(), t[id_b].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t[id_b].combine_chunks(), t[id_a].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # small: 2 × candidate pairs

    # labels start as self
    labels = edges.map_batches(
        lambda t: pa.table({"id": t["src"], "label": t["src"]}),
        batch_format="pyarrow",
    ).groupby("id").aggregate(Min("label", alias_name="label")).materialize()

    for _ in range(max_rounds):
        # message pass: tag labels and edges, group by node id, emit
        # (neighbor, my_label) for each edge + (me, my_label)
        lab = labels.map_batches(
            lambda t: pa.table(
                {"node": t["id"], "other": pa.nulls(t.num_rows, pa.int64()),
                 "label": t["label"]}
            ),
            batch_format="pyarrow",
        )
        edg = edges.map_batches(
            lambda t: pa.table(
                {"node": t["src"], "other": t["dst"],
                 "label": pa.nulls(t.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
        )

        def emit(g: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            my = _pc.min(g["label"]).as_py()
            neigh = g["other"].drop_null()
            ids = pa.concat_arrays([neigh.combine_chunks(),
                                    pa.array([g["node"][0].as_py()], pa.int64())])
            return pa.table(
                {"id": ids,
                 "label": pa.array([my] * len(ids), pa.int64())}
            )

        new_labels = (
            lab.union(edg)
            .groupby("node")
            .map_groups(emit, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # converged when total label sum stops decreasing
        old_sum = labels.sum("label")
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["id", "component"]), batch_format="pyarrow"
    )
