"""Distributed top-k without a global sort.

``ds.sort(cols).limit(k)`` runs an all-to-all Sort over the WHOLE input —
the limit does not push into the shuffle, so at 100× data the exchange
moves every row to rank 10 of them. The scale-right plan (same shape as
ops/similarity.knn_bruteforce's local-topk → tiny reduce) is:

    map_batches(local top-k per block)   # ≤ k rows leave each block
    → repartition(1)                     # ≤ k × n_blocks tiny rows move
    → map_batches(exact top-k)           # one vectorized final rank

Exchange volume drops from O(N) to O(k · blocks); per-block selection is
``np.argpartition`` (O(rows)) + an exact sort of k rows. The reference has
no analogous operator (its closest is Oracle SAMPLE split-point selection,
SingleTableSplitUtil.java:294-389); this is the Ray-native design.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _topk_table(t: pa.Table, cols: list[str], descending: list[bool],
                k: int) -> pa.Table:
    """Exact top-k of one table by (cols, descending) — argpartition then
    sort of only the k survivors. Nulls sort last (never in the top-k
    unless fewer than k non-null rows exist)."""
    order = [(c, "descending" if d else "ascending")
             for c, d in zip(cols, descending)]
    prim_type = t.schema.field(cols[0]).type
    if t.num_rows <= k or not (
        pa.types.is_integer(prim_type) or pa.types.is_floating(prim_type)
    ):
        # tiny block, or non-numeric primary key: block-local exact sort
        return t.sort_by(order).slice(0, k)
    # rank by the primary column first (argpartition is single-key);
    # take a safety margin then break ties exactly on all columns
    prim = t[cols[0]].to_numpy(zero_copy_only=False).astype(np.float64)
    nan = np.isnan(prim)
    if descending[0]:
        prim = np.where(nan, -np.inf, prim)
        part = np.argpartition(-prim, k - 1)
    else:
        prim = np.where(nan, np.inf, prim)
        part = np.argpartition(prim, k - 1)
    # margin: rows tied with the k-th primary value must stay in play so
    # secondary keys can decide among them
    kth = prim[part[k - 1]]
    tied = prim == kth
    keep = np.zeros(len(prim), dtype=bool)
    keep[part[:k]] = True
    keep |= tied
    cand = t.filter(pa.array(keep))
    return cand.sort_by(order).slice(0, k)


def topk(ds, cols: list[str], *, descending: list[bool] | bool = True,
         k: int = 10):
    """Global top-k rows of ``ds`` ordered by ``cols`` — no AllToAll sort.
    Returns a 1-block Dataset of exactly k rows (fewer if the input is
    smaller)."""
    if isinstance(descending, bool):
        descending = [descending] * len(cols)

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return _topk_table(t, cols, descending, k)

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    )
