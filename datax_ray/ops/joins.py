"""Joins and lookups — the patterns DataX itself never had (its topology is
strictly 1 reader : 1 writer) but any real pipeline needs.

- ``broadcast_join``  — small side (dimension table) is ``ray.put`` ONCE on
  the driver as an Arrow table and joined per batch with the zero-copy
  ``pa.Table.join`` hash join inside ``map_batches``: no shuffle, no
  pandas round-trip; the canonical dimension-lookup at 100 TB.
- ``semi_filter`` / ``anti_filter`` — broadcast the key set and mask inside
  ``map_batches``.
- For large-large joins use the bucketed pattern: add ``hash(key) % B`` to
  both sides, groupby bucket, merge per bucket (see SNIPPETS/ray guide) —
  not needed by any current pipeline, so not built speculatively.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def broadcast_join(ds, small: "pd.DataFrame | pa.Table", *,
                   on: str | list[str], how: str = "inner",
                   suffix: str = "_r"):
    import ray

    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    ref = ray.put(small.combine_chunks())
    keys = [on] if isinstance(on, str) else list(on)
    join_type = _JOIN_TYPES.get(how, how)

    def merge(batch: pa.Table) -> pa.Table:
        rhs = ray.get(ref)  # zero-copy read from the local object store
        return batch.join(rhs, keys=keys, join_type=join_type,
                          right_suffix=suffix)

    return ds.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


def semi_filter(ds, keys, *, on: str):
    """Keep rows whose ``on`` value is in ``keys`` (broadcast key set,
    converted to an Arrow value_set ONCE — not per batch; unsorted so
    None/mixed-type key sets stay legal)."""
    import ray

    ref = ray.put(pa.array(list(set(keys))))

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch[on], value_set=ray.get(ref)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def anti_filter(ds, keys, *, on: str):
    import ray

    ref = ray.put(pa.array(list(set(keys))))

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.invert(pc.is_in(batch[on], value_set=ray.get(ref)))
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
