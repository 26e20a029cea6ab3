"""Joins and lookups — the patterns DataX itself never had (its topology is
strictly 1 reader : 1 writer) but any real pipeline needs.

- ``broadcast_join``  — small side (dimension table) is ``ray.put`` ONCE on
  the driver and merged per batch with pandas inside ``map_batches``: no
  shuffle at all; the canonical dimension-lookup at 100 TB.
- ``semi_filter`` / ``anti_filter`` — broadcast the key set and mask inside
  ``map_batches``.
- For large-large joins use the bucketed pattern: add ``hash(key) % B`` to
  both sides, groupby bucket, merge per bucket (see SNIPPETS/ray guide) —
  not needed by any current pipeline, so not built speculatively.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def broadcast_join(ds, small: pd.DataFrame, *, on: str | list[str], how: str = "inner",
                   suffix: str = "_r"):
    import ray

    ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how, suffixes=("", suffix))

    return ds.map_batches(merge, batch_format="pandas")


def semi_filter(ds, keys, *, on: str):
    """Keep rows whose ``on`` value is in ``keys`` (broadcast key set)."""
    import ray

    ref = ray.put(set(keys))

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks = ray.get(ref)
        return batch.filter(pc.is_in(batch[on], value_set=pa.array(list(ks))))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_filter(ds, keys, *, on: str):
    import ray

    ref = ray.put(set(keys))

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks = ray.get(ref)
        return batch.filter(
            pc.invert(pc.is_in(batch[on], value_set=pa.array(list(ks))))
        )

    return ds.map_batches(f, batch_format="pyarrow")
