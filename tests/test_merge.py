"""Unit tests for the LWW merge kernel (no Ray needed) and the distributed
merge pipeline (Ray). Oracle: DuckDB window-function fold of the same
events — the same check the driver runs at sf0.01."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from datax_ray.cdc.merge import (
    EVENT_WEIGHT_COL,
    lww_fold_table,
    lww_merge,
    partial_lww_combiner,
    stable_hash,
)
from datax_ray.schema import CHANGELOG_SCHEMA, align_to_schema, unify_schemas
from datax_ray.sources.generators import ChangelogSpec, generate_changelog_block

ORACLE_SQL = """
SELECT conv_id, turn_idx, role, text, tool, ts FROM (
  SELECT *, row_number() OVER (
     PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ev)
WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""


def oracle_fold(events: pa.Table) -> pa.Table:
    con = duckdb.connect()
    con.register("ev", events)
    out = con.execute(ORACLE_SQL).fetch_arrow_table()
    con.close()
    return out


def mk_events(rows):
    cols = list(zip(*rows))
    t = pa.table(
        {
            "lsn": pa.array(cols[0], pa.int64()),
            "op": pa.array(cols[1], pa.string()),
            "conv_id": pa.array(cols[2], pa.string()),
            "turn_idx": pa.array(cols[3], pa.int32()),
            "role": pa.array(cols[4], pa.string()),
            "text": pa.array(cols[5], pa.string()),
            "tool": pa.array(cols[6], pa.string()),
            "ts": pa.array(cols[7], pa.int64()).cast(pa.timestamp("ms")),
        }
    )
    return t


def sorted_table(t: pa.Table) -> pa.Table:
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


class TestFoldKernel:
    def test_insert_update_lww(self):
        ev = mk_events(
            [
                (1, "I", "a", 0, "user", "v1", None, 100),
                (2, "U", "a", 0, "user", "v2", None, 200),
                (3, "U", "b", 0, "user", "w1", None, 150),
            ]
        )
        out = lww_fold_table(ev, drop_deletes=True)
        assert out.num_rows == 2
        assert out["text"].to_pylist() == ["v2", "w1"]

    def test_out_of_order_ts_late_update_loses(self):
        # lsn 3 arrives later in the log but with an OLDER ts → must lose
        ev = mk_events(
            [
                (1, "I", "a", 0, "user", "v1", None, 100),
                (2, "U", "a", 0, "user", "v2", None, 300),
                (3, "U", "a", 0, "user", "late", None, 200),
            ]
        )
        out = lww_fold_table(ev, drop_deletes=True)
        assert out["text"].to_pylist() == ["v2"]

    def test_ts_tie_broken_by_lsn(self):
        ev = mk_events(
            [
                (5, "U", "a", 0, "user", "lsn5", None, 100),
                (9, "U", "a", 0, "user", "lsn9", None, 100),
                (7, "U", "a", 0, "user", "lsn7", None, 100),
            ]
        )
        out = lww_fold_table(ev, drop_deletes=True)
        assert out["text"].to_pylist() == ["lsn9"]

    def test_delete_kills_row_and_later_insert_revives(self):
        ev = mk_events(
            [
                (1, "I", "a", 0, "user", "v1", None, 100),
                (2, "D", "a", 0, None, None, None, 200),
                (3, "I", "b", 1, "user", "w1", None, 100),
                (4, "D", "b", 1, None, None, None, 200),
                (5, "I", "b", 1, "user", "w2", None, 300),
            ]
        )
        out = lww_fold_table(ev, drop_deletes=True)
        assert sorted_table(out)["text"].to_pylist() == ["w2"]

    def test_tombstone_retained_in_partial_fold(self):
        ev = mk_events(
            [
                (1, "I", "a", 0, "user", "v1", None, 100),
                (2, "D", "a", 0, None, None, None, 200),
            ]
        )
        partial = lww_fold_table(ev, drop_deletes=False)
        assert partial.num_rows == 1
        assert partial["op"].to_pylist() == ["D"]

    def test_duplicate_delivery_idempotent(self):
        base = [
            (1, "I", "a", 0, "user", "v1", None, 100),
            (2, "U", "a", 0, "user", "v2", None, 200),
        ]
        clean = lww_fold_table(mk_events(base), drop_deletes=True)
        duped = lww_fold_table(mk_events(base + base + base[1:]), drop_deletes=True)
        assert clean.equals(duped)

    def test_fold_associative_vs_oracle(self):
        spec = ChangelogSpec(
            n_events=20_000, n_convs=300, max_turns=12, n_blocks=7,
            ooo_fraction=0.15, dup_fraction=0.1, zipf_a=1.5, seed=7,
        )
        blocks = [generate_changelog_block(spec, b) for b in range(spec.n_blocks)]
        all_events = pa.concat_tables(blocks)
        # two-level fold (combine each block, then fold partials) == oracle
        partials = [partial_lww_combiner(b) for b in blocks]
        folded = lww_fold_table(pa.concat_tables(partials), drop_deletes=True)
        got = sorted_table(folded).select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        want = oracle_fold(all_events)
        assert got.equals(want.cast(got.schema))

    def test_weighted_fold_counts_exact(self):
        spec = ChangelogSpec(n_events=5000, n_convs=50, max_turns=8, n_blocks=3, seed=3)
        blocks = [generate_changelog_block(spec, b) for b in range(spec.n_blocks)]
        partials = [partial_lww_combiner(b, with_weights=True) for b in blocks]
        merged = lww_fold_table(
            pa.concat_tables(partials), drop_deletes=False, weight_col=EVENT_WEIGHT_COL
        )
        import pyarrow.compute as pc

        assert pc.sum(merged[EVENT_WEIGHT_COL]).as_py() == sum(
            b.num_rows for b in blocks
        )

    def test_stable_hash_deterministic(self):
        a = stable_hash(pa.array(["x", "y", "z"]))
        b = stable_hash(np.array(["x", "y", "z"], dtype=object))
        assert list(a) == list(b)


class TestSchemaEvolution:
    def test_unify_and_align(self):
        s1 = pa.schema([("a", pa.int32()), ("b", pa.string())])
        s2 = pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.string())])
        u = unify_schemas([s1, s2])
        assert u.field("a").type == pa.int64()
        assert u.names == ["a", "b", "c"]
        t1 = pa.table({"a": pa.array([1, 2], pa.int32()), "b": ["x", "y"]})
        at = align_to_schema(t1, u)
        assert at.schema.equals(u)
        assert at["c"].null_count == 2

    def test_evolved_changelog_folds(self):
        spec = ChangelogSpec(
            n_events=4000, n_convs=60, max_turns=8, n_blocks=4,
            evolve_from_lsn=2000, seed=11,
        )
        blocks = [generate_changelog_block(spec, b) for b in range(spec.n_blocks)]
        u = unify_schemas([b.schema for b in blocks])
        assert "tool_args" in u.names
        assert u.field("turn_idx").type == pa.int64()
        aligned = [align_to_schema(b, u) for b in blocks]
        out = lww_fold_table(pa.concat_tables(aligned), drop_deletes=True)
        assert out.schema.field("tool_args").type == pa.string()
        # rows whose winner predates evolution have null tool_args
        assert out["tool_args"].null_count > 0


@pytest.mark.usefixtures("ray_session")
class TestDistributedMerge:
    def _run(self, spec: ChangelogSpec, **merge_kw):
        from datax_ray.sources.generators import changelog_dataset

        ds = changelog_dataset(spec)
        merged = lww_merge(ds, num_partitions=8, **merge_kw)
        got = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
        got = sorted_table(got).select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        blocks = [generate_changelog_block(spec, b) for b in range(spec.n_blocks)]
        want = oracle_fold(pa.concat_tables(blocks))
        assert got.cast(want.schema).equals(want)

    def test_merge_matches_oracle(self):
        self._run(
            ChangelogSpec(
                n_events=30_000, n_convs=400, max_turns=10, n_blocks=8,
                ooo_fraction=0.1, dup_fraction=0.05, seed=5,
            )
        )

    def test_salted_merge_matches_oracle_on_skew(self):
        self._run(
            ChangelogSpec(
                n_events=30_000, n_convs=400, max_turns=10, n_blocks=8,
                zipf_a=1.2, ooo_fraction=0.1, seed=6,
            ),
            salt=4,
        )
