"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``  — exact top-k cosine: the query matrix is broadcast
  ONCE (``ray.put`` on the driver, ``ray.get`` in each task — never
  re-shipped per batch); each batch computes a numpy matmul against it and
  emits its local top-k per query; a final tiny groupby reduces per-query
  candidates to the global top-k. Deterministic: ties broken by neighbor id.
- ``knn_ivf``         — the scale path: coarse k-means-style centroids
  (seeded sample), each vector assigned to its nearest centroid bucket;
  queries probe only ``n_probe`` nearest buckets. Approximate; recall
  grows with n_probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: typed schema for candidate rows — every code path (including empties)
#: emits it, so no schema-less blocks reach the executor
_CAND_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("neighbor_id", pa.int64()),
     ("cosine", pa.float64())]
)


def _as_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column — zero-copy flat
    reshape for fixed-size or uniform-length lists; np.stack (per-row
    Python objects) only as the ragged fallback."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        return (col.flatten().to_numpy(zero_copy_only=False)
                .reshape(len(col), d).astype(np.float64))
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        widths = np.diff(np.asarray(col.offsets))
        if len(widths) and (widths == widths[0]).all():
            return (col.flatten().to_numpy(zero_copy_only=False)
                    .reshape(len(col), int(widths[0])).astype(np.float64))
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def knn_bruteforce(ds, query_ids: np.ndarray, query_matrix: np.ndarray, *, k: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   exclude_self: bool = True, digits: int = 6):
    """Exact cosine top-k for each query vector. Returns a Dataset of
    (query_id, neighbor_id, cosine, rank), rank 1..k ordered by
    (-cosine, neighbor_id)."""
    import ray

    q_unit = _unit(np.asarray(query_matrix, dtype=np.float64))
    qref = ray.put((np.asarray(query_ids), q_unit))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CAND_SCHEMA.empty_table()
        qids, qm = ray.get(qref)
        vecs = _unit(_as_matrix(t[vec_col]))
        ids = np.asarray(t[id_col])
        sim = np.round(qm @ vecs.T, digits)  # (Q, B); round BEFORE ranking
        if exclude_self:
            self_mask = qids[:, None] == ids[None, :]
            sim = np.where(self_mask, -np.inf, sim)
        kk = min(k, sim.shape[1])
        # top-k per query within this batch (argpartition then exact sort)
        part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(qids, kk)
        cand_ids = ids[part].ravel()
        cand_sim = np.take_along_axis(sim, part, axis=1).ravel()
        keep = np.isfinite(cand_sim)
        return pa.table(
            {
                "query_id": pa.array(rows[keep]),
                "neighbor_id": pa.array(cand_ids[keep]),
                "cosine": pa.array(cand_sim[keep]),
            },
            schema=_CAND_SCHEMA,
        )

    def reduce_topk(g: pa.Table) -> pa.Table:
        qid = g["query_id"][0].as_py()
        sim = np.asarray(g["cosine"])
        nid = np.asarray(g["neighbor_id"])
        order = np.lexsort((nid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
                "neighbor_id": pa.array(nid[order]),
                "cosine": pa.array(sim[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def knn_ivf(ds, query_ids: np.ndarray, query_matrix: np.ndarray, *, k: int = 5,
            vec_col: str = "embedding", id_col: str = "vec_id",
            n_centroids: int = 16, n_probe: int = 4, seed: int = 5,
            sample_size: int = 2048, digits: int = 6,
            centroids: np.ndarray | None = None):
    """IVF-style ANN: bucket vectors by nearest centroid; each query scans
    only its ``n_probe`` closest buckets. One small sample pass (skipped
    when explicit ``centroids`` are given) + one bucketed shuffle.

    ``centroids`` (n_centroids, dim raw vectors) makes the index fully
    deterministic and SQL-reproducible: assignment = argmax cosine rounded
    to ``digits`` with ties to the LOWEST centroid index (stable sorts),
    which DuckDB replays as ``ORDER BY round(cos, d) DESC, cidx``."""
    import ray

    if centroids is None:
        sample = ds.limit(sample_size).to_pandas()
        base = _unit(np.stack(sample[vec_col].to_numpy()))
        rng = np.random.default_rng(seed)
        centroids = base[
            rng.choice(len(base), size=min(n_centroids, len(base)),
                       replace=False)
        ]
    else:
        centroids = _unit(np.asarray(centroids, dtype=np.float64))
    q_unit = _unit(np.asarray(query_matrix, dtype=np.float64))
    # probe order on ROUNDED similarity, stable sort → ties to lowest idx
    qsim = np.round(q_unit @ centroids.T, digits)
    probe = np.argsort(-qsim, axis=1, kind="stable")[:, :n_probe]
    cref = ray.put((centroids, np.asarray(query_ids), q_unit, probe))

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_bucket", pa.array([], pa.int32()))
        cents, _, _, _ = ray.get(cref)
        vecs = _unit(_as_matrix(t[vec_col]))
        sim = np.round(vecs @ cents.T, digits)
        bucket = np.argmax(sim, axis=1).astype(np.int32)  # first max = low idx
        return t.append_column("_bucket", pa.array(bucket))

    def scan_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _CAND_SCHEMA.empty_table()
        cents, qids, qm, prb = ray.get(cref)
        b = g["_bucket"][0].as_py()
        q_sel = np.nonzero((prb == b).any(axis=1))[0]
        if len(q_sel) == 0:
            return _CAND_SCHEMA.empty_table()
        vecs = _unit(_as_matrix(g[vec_col]))
        ids = np.asarray(g[id_col])
        sim = np.round(qm[q_sel] @ vecs.T, digits)
        self_mask = qids[q_sel][:, None] == ids[None, :]
        sim = np.where(self_mask, -np.inf, sim)
        kk = min(k, sim.shape[1])
        part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(qids[q_sel], kk)
        cand_ids = ids[part].ravel()
        cand_sim = np.take_along_axis(sim, part, axis=1).ravel()
        keep = np.isfinite(cand_sim)
        return pa.table(
            {"query_id": pa.array(rows[keep]), "neighbor_id": pa.array(cand_ids[keep]),
             "cosine": pa.array(cand_sim[keep])},
            schema=_CAND_SCHEMA,
        )

    def reduce_topk(g: pa.Table) -> pa.Table:
        qid = g["query_id"][0].as_py()
        sim = np.asarray(g["cosine"])
        nid = np.asarray(g["neighbor_id"])
        order = np.lexsort((nid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), qid, dtype=np.int64)),
                "neighbor_id": pa.array(nid[order]),
                "cosine": pa.array(sim[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan_bucket, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )
