"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor anything in ``datax_ray`` calls ``ray.init()`` /
``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001: derive a CDC changelog from the events
    table and replay it through the engine's LWW upsert merge (combiner →
    hash shuffle → vectorized fold → tombstone drop)."""
    from datax_ray.pipelines.queries import q_cdc_lww_merge

    return q_cdc_lww_merge("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data ops suite; see datax_ray/pipelines/queries.py."""
    from datax_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same tables, same column
    names, same rounding). The multimodal oracles read the deterministic
    media fixture parquet, and the LSH oracles read the engine-signature
    fixture for sf0.01 (both written here so the oracle side can run
    before the query side)."""
    from datax_ray.ops.lsh_fixture import (
        ensure_lsh_fixture,
        ensure_planes_fixture,
    )
    from datax_ray.ops.multimodal import ensure_media_fixture
    from datax_ray.pipelines.queries import ORACLES

    ensure_media_fixture()
    ensure_lsh_fixture("/root/testdata/sf0.01")  # driver compares at sf0.01
    ensure_planes_fixture()
    return dict(ORACLES)
