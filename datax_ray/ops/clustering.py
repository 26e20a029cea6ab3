"""Distributed k-means (Lloyd iterations) over an embedding column.

The topic-clustering step of a curation pipeline: group documents by
embedding so sampling/filtering can balance topics. Each Lloyd iteration
is ONE streaming pass — map_batches emits per-batch partial sums
(k × D doubles + k counts, independent of batch size) and the driver
folds #blocks such partials into new centroids; assignment never
shuffles, and the full dataset is never materialized. At 100 TB per
iteration cost = one read + k×D×#blocks tiny rows to the driver.

Determinism: init centroids are caller-provided (e.g. the k smallest-id
vectors), every assignment breaks distance ties toward the lowest
cluster id (np.argmin), empty clusters keep their previous centroid.
Arithmetic is float64 end-to-end (float32 inputs upcast exactly), so a
SQL oracle replaying the same unrolled iterations agrees on every
assignment as long as no point sits within float-noise of two centroids
(with continuous random embeddings that is probability ~0; integer-grid
fixtures in tests use separated clusters).

Reference contrast: DataX has no ML operators; this is engine surface
for the LLM-curation pipelines the north rule targets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(col, dtype=np.float64) -> np.ndarray:
    lists = col.to_numpy(zero_copy_only=False)
    if len(lists) == 0:
        return np.zeros((0, 0), dtype=dtype)
    return np.stack(lists).astype(dtype, copy=False)


def _assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # exact squared-L2 (no |v|²−2v·c expansion: keeps floats closest to
    # the oracle's per-pair distance and argmin ties toward low cluster)
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
    return d.argmin(axis=1)


def kmeans_fit(ds, init_centroids: np.ndarray, *, iters: int = 2,
               vec_col: str = "embedding") -> np.ndarray:
    """Run ``iters`` Lloyd updates from ``init_centroids`` (k × D);
    returns the final centroids (float64)."""
    cents = np.asarray(init_centroids, dtype=np.float64)
    k, dim = cents.shape
    for _ in range(iters):
        frozen = cents  # bind current value into the batch closure

        def partial(t: pa.Table) -> pa.Table:
            vecs = _batch_matrix(t[vec_col])
            if vecs.shape[0] == 0:
                cnt = np.zeros(k, dtype=np.int64)
                sums = np.zeros((k, dim), dtype=np.float64)
            else:
                a = _assign(vecs, frozen)
                cnt = np.bincount(a, minlength=k)
                sums = np.empty((k, dim), dtype=np.float64)
                for j in range(dim):  # D bincount kernels, no row loop
                    sums[:, j] = np.bincount(a, weights=vecs[:, j],
                                             minlength=k)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            })

        def fold(g: pa.Table) -> pa.Table:
            # per-cluster distributed fold: the driver must see k rows,
            # not #batches × k (at 10^5-10^6 blocks the raw partials are
            # a driver-side materialization of GBs of vector sums)
            col = g["vsum"].combine_chunks()
            vs = np.asarray(col.flatten(), dtype=np.float64).reshape(
                g.num_rows, -1)
            return pa.table({
                "cluster": pa.array([g["cluster"][0].as_py()], pa.int64()),
                "cnt": pa.array([int(np.asarray(g["cnt"]).sum())],
                                pa.int64()),
                "vsum": pa.array([vs.sum(axis=0)], pa.list_(pa.float64())),
            })

        rows = (ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("cluster")
                .map_groups(fold, batch_format="pyarrow")
                .take_all())  # exactly k rows
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in rows:
            cnt[r["cluster"]] += r["cnt"]
            sums[r["cluster"]] += np.asarray(r["vsum"], dtype=np.float64)
        nonempty = cnt > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / cnt[nonempty, None]
        cents = new
    return cents


def kmeans_assign(ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Map-only final assignment: Dataset of (id_col, cluster)."""
    cents = np.asarray(centroids, dtype=np.float64)

    def assign(t: pa.Table) -> pa.Table:
        vecs = _batch_matrix(t[vec_col])
        a = (_assign(vecs, cents) if vecs.shape[0] else
             np.zeros(0, dtype=np.int64))
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(a.astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def kmeans(ds, init_centroids: np.ndarray, *, iters: int = 2,
           vec_col: str = "embedding", id_col: str = "vec_id"):
    """Fit + assign. Returns (assignments Dataset, final centroids)."""
    cents = kmeans_fit(ds, init_centroids, iters=iters, vec_col=vec_col)
    return kmeans_assign(ds, cents, vec_col=vec_col, id_col=id_col), cents
