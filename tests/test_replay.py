"""End-to-end CDC replay: epochs, exactly-once manifest commit, resume after
a simulated crash, compaction, schema evolution through the lake, metrics.
(FIXTURES.md F6; reference contracts: ShardCheckpoint resume semantics +
hdfswriter tmp+rename commit.)"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datax_ray.cdc.replay import plan_epochs, replay
from datax_ray.sinks.lake import read_lake, read_lake_table
from datax_ray.sources.generators import (
    ChangelogSpec,
    generate_changelog_block,
    write_changelog_parquet,
)
from datax_ray.sources.parquet import read_changelog
from datax_ray.state.manifest import Manifest
from tests.test_merge import oracle_fold

SPEC = ChangelogSpec(
    n_events=24_000, n_convs=300, max_turns=10, n_blocks=6,
    ooo_fraction=0.1, dup_fraction=0.05, seed=13,
)


def all_events(spec) -> pa.Table:
    from datax_ray.schema import concat_aligned

    return concat_aligned(
        [generate_changelog_block(spec, b) for b in range(spec.n_blocks)]
    )


@pytest.fixture(scope="module")
def changelog_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("changelog")
    return write_changelog_parquet(SPEC, str(d))


def expected_final(spec=SPEC) -> pa.Table:
    return oracle_fold(all_events(spec))


def check_final(lake_dir, want=None):
    got = read_lake_table(lake_dir).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    want = want if want is not None else expected_final()
    assert got.num_rows == want.num_rows
    assert got.cast(want.schema).equals(want)


@pytest.mark.usefixtures("ray_session")
class TestReplay:
    def test_plan_epochs(self):
        assert plan_epochs(10, None) == [(0, 10)]
        assert plan_epochs(10, 4) == [(0, 4), (4, 8), (8, 10)]

    def test_single_epoch_replay(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        res = replay(
            lambda lo, hi: read_changelog(changelog_dir, lsn_range=(lo, hi)),
            lake_dir=lake,
            max_lsn_exclusive=SPEC.n_events,
            num_partitions=8,
        )
        assert res.epochs_run == 1
        # events_applied counts raw events incl. duplicate re-deliveries
        assert res.events_applied == all_events(SPEC).num_rows
        check_final(lake)

    def test_multi_epoch_replay_and_metrics(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        res = replay(
            lambda lo, hi: read_changelog(changelog_dir, lsn_range=(lo, hi)),
            lake_dir=lake,
            max_lsn_exclusive=SPEC.n_events,
            num_partitions=8,
            epoch_size=6000,
            compact_every=3,
        )
        assert res.epochs_run == 4
        check_final(lake)
        m = Manifest.load(lake)
        # per-partition lineage: offset → epoch → files + metrics
        for p, st in m.state["partitions"].items():
            assert st["last_lsn"] >= 0
            met = st["metrics"]
            assert met["events_applied"] > 0 and met["events_per_sec"] > 0
            assert "lag_ms" in met
        # compaction happened (delta chains were capped)
        assert any(st["base"] for st in m.state["partitions"].values())
        assert m.last_lsn == SPEC.n_events - 1

    def test_resume_after_crash_is_exactly_once(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        src = lambda lo, hi: read_changelog(changelog_dir, lsn_range=(lo, hi))
        # run only the first 2 of 4 epochs ("crash" after epoch 1)
        replay(
            src, lake_dir=lake, max_lsn_exclusive=12_000,
            num_partitions=8, epoch_size=6000, run_id="run-A",
        )
        m = Manifest.load(lake)
        assert m.committed_epochs() == {0, 1}
        # leave a stray uncommitted staging-ish file: a re-run must overwrite
        # deltas idempotently, and visibility is manifest-gated anyway
        res = replay(
            src, lake_dir=lake, max_lsn_exclusive=SPEC.n_events,
            num_partitions=8, epoch_size=6000, run_id="run-B",
        )
        assert res.epochs_skipped == 2 and res.epochs_run == 2
        check_final(lake)
        m2 = Manifest.load(lake)
        assert m2.run_id == "run-B"  # fencing: new run took ownership
        # exactly one committed delta per (partition, epoch)
        for p, st in m2.state["partitions"].items():
            assert len(st["deltas"]) == len(set(st["deltas"]))

    def test_rerun_of_committed_epochs_is_noop(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        src = lambda lo, hi: read_changelog(changelog_dir, lsn_range=(lo, hi))
        kw = dict(
            lake_dir=lake, max_lsn_exclusive=SPEC.n_events,
            num_partitions=8, epoch_size=8000,
        )
        replay(src, **kw)
        before = read_lake_table(lake)
        res2 = replay(src, **kw)
        assert res2.epochs_run == 0 and res2.events_applied == 0
        assert read_lake_table(lake).equals(before)

    def test_window_filter_skips_out_of_window_events(self, tmp_path):
        # otsstreamreader window contract: events with ts outside
        # [start, end) are skipped (RecordProcessor.java:208-216)
        spec = ChangelogSpec(n_events=8000, n_convs=100, max_turns=8, n_blocks=4, seed=21)
        d = str(tmp_path / "cl")
        write_changelog_parquet(spec, d)
        ev = all_events(spec)
        import pyarrow.compute as pc

        ts_lo = pc.min(ev["ts"]).as_py()
        ts_hi = pc.max(ev["ts"]).as_py()
        mid = ts_lo + (ts_hi - ts_lo) / 2
        lake = str(tmp_path / "lake")
        replay(
            lambda lo, hi: read_changelog(d, lsn_range=(lo, hi), window=(ts_lo, mid)),
            lake_dir=lake, max_lsn_exclusive=spec.n_events, num_partitions=4,
        )
        in_window = ev.filter(
            pc.and_(pc.greater_equal(ev["ts"], pa.scalar(ts_lo)), pc.less(ev["ts"], pa.scalar(mid)))
        )
        check_final(lake, oracle_fold(in_window))

    def test_schema_evolution_through_lake(self, tmp_path):
        # F3: column add + int widen mid-stream; epoch 0 commits files with
        # the old schema, epoch 1 the evolved one; the lake read unifies.
        spec = ChangelogSpec(
            n_events=8000, n_convs=100, max_turns=8, n_blocks=4,
            evolve_from_lsn=4000, seed=23,
        )
        d = str(tmp_path / "cl")
        write_changelog_parquet(spec, d)
        lake = str(tmp_path / "lake")
        # epoch boundary == evolution point: first epoch sees only old schema
        for lo, hi in [(0, 4000), (4000, 8000)]:
            replay(
                lambda a, b: read_changelog(d, lsn_range=(a, b)),
                lake_dir=lake, max_lsn_exclusive=hi, epoch_size=4000,
                num_partitions=4,
            )
        got = read_lake_table(lake)
        assert "tool_args" in got.column_names
        assert got.schema.field("turn_idx").type == pa.int64()
        ev = all_events(spec)
        want = oracle_fold_evolved(ev)
        got = got.select(want.column_names)
        assert got.cast(want.schema).equals(want)

    def test_read_lake_dataset_matches_table(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        replay(
            lambda lo, hi: read_changelog(changelog_dir, lsn_range=(lo, hi)),
            lake_dir=lake, max_lsn_exclusive=SPEC.n_events, num_partitions=8,
        )
        ds = read_lake(lake)
        got = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        got = got.drop_columns([c for c in ("part",) if c in got.column_names])
        got = got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        want = read_lake_table(lake)
        assert got.select(want.column_names).cast(want.schema).equals(want)


def oracle_fold_evolved(events: pa.Table) -> pa.Table:
    import duckdb

    con = duckdb.connect()
    con.register("ev", events)
    out = con.execute(
        """
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text,
               tool, ts, tool_args FROM (
          SELECT *, row_number() OVER (
             PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
          FROM ev)
        WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).fetch_arrow_table()
    con.close()
    return out
