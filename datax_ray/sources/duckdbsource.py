"""querySql-mode reader: arbitrary relational SQL over lake files.

Reference: every DataX RDBMS reader accepts raw ``querySql`` as its slice
unit instead of table/column/where — each configured SQL string becomes
one task's read (plugin-rdbms-util/.../reader/util/ReaderSplitUtil.java:
92-102, "ifQuerySqlType: 不做split"). DataX users lean on it constantly
for joins/projections the reader DSL can't express.

Here the same contract runs against parquet/CSV files through DuckDB:

    {"reader": {"name": "duckdb", "parameter": {
        "sql": ["SELECT ... WHERE k % 2 = 0", "SELECT ... WHERE k % 2 = 1"],
        "views": {"orders": "/data/orders.parquet"}}}}

Each SQL string is ONE slice, executed inside its own Ray task (DuckDB →
Arrow, zero-copy into the object store via ``from_arrow_refs``) — the
driver never materializes data, and slice parallelism is the user's
split contract exactly as in the reference. ``views`` registers each
name over a parquet/CSV path (glob patterns allowed) before the query
runs.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _run_slice(sql: str, views: dict[str, str]) -> "object":
    import duckdb

    con = duckdb.connect()
    for name, path in (views or {}).items():
        if not _IDENT.match(name):
            raise ValueError(f"invalid view name: {name!r}")
        p = str(path).replace("'", "''")
        reader = ("read_csv_auto" if p.endswith((".csv", ".csv.gz", ".tsv"))
                  else "read_parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {reader}('{p}')")
    return con.execute(sql).fetch_arrow_table()


def read_sql(sql: str | list[str], views: dict[str, str] | None = None):
    """Dataset over one or more querySql slices (one Ray task per slice)."""
    import ray
    import ray.data as rd

    sqls = [sql] if isinstance(sql, str) else list(sql)
    if not sqls:
        raise ValueError("querySql reader needs at least one SQL string")
    run = ray.remote(num_cpus=1)(_run_slice)
    refs = [run.remote(s, views or {}) for s in sqls]
    return rd.from_arrow_refs(refs)


def build(parameter: dict):
    """Plugin-SPI entry (cli reader name ``duckdb``)."""
    return read_sql(parameter["sql"], parameter.get("views"))
