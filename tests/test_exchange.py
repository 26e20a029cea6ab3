"""The raw-Ray hash-exchange replay path must be semantically identical to
the Dataset path: same final state (DuckDB oracle), same resume/exactly-
once behavior, same window and schema-evolution handling."""

import pyarrow as pa
import pytest

from datax_ray.cdc.replay import replay_files
from datax_ray.sinks.lake import read_lake_table
from datax_ray.sources.generators import ChangelogSpec, write_changelog_parquet
from datax_ray.state.manifest import Manifest
from tests.test_merge import oracle_fold
from tests.test_replay import all_events, oracle_fold_evolved

SPEC = ChangelogSpec(
    n_events=24_000, n_convs=300, max_turns=10, n_blocks=6,
    ooo_fraction=0.1, dup_fraction=0.05, zipf_a=1.3, seed=17,
)


@pytest.fixture(scope="module")
def changelog_dir(tmp_path_factory):
    return write_changelog_parquet(SPEC, str(tmp_path_factory.mktemp("xch")))


def check(lake, want):
    got = read_lake_table(lake).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    assert got.num_rows == want.num_rows
    assert got.cast(want.schema).equals(want)


@pytest.mark.usefixtures("ray_session")
class TestExchangeReplay:
    def test_final_state_matches_oracle(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        res = replay_files(
            changelog_dir, lake_dir=lake, max_lsn_exclusive=SPEC.n_events,
            num_partitions=8, epoch_size=6000, compact_every=3,
        )
        assert res.epochs_run == 4
        assert res.events_applied == all_events(SPEC).num_rows
        check(lake, oracle_fold(all_events(SPEC)))

    def test_resume_exactly_once(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        replay_files(changelog_dir, lake_dir=lake, max_lsn_exclusive=12_000,
                     num_partitions=8, epoch_size=6000, run_id="A")
        res = replay_files(changelog_dir, lake_dir=lake,
                           max_lsn_exclusive=SPEC.n_events,
                           num_partitions=8, epoch_size=6000, run_id="B")
        assert res.epochs_skipped == 2 and res.epochs_run == 2
        check(lake, oracle_fold(all_events(SPEC)))
        assert Manifest.load(lake).run_id == "B"

    def test_window(self, changelog_dir, tmp_path):
        import pyarrow.compute as pc

        ev = all_events(SPEC)
        lo = pc.min(ev["ts"]).as_py()
        hi = pc.max(ev["ts"]).as_py()
        mid = lo + (hi - lo) / 2
        lake = str(tmp_path / "lake")
        replay_files(changelog_dir, lake_dir=lake,
                     max_lsn_exclusive=SPEC.n_events,
                     num_partitions=4, window=(lo, mid))
        in_w = ev.filter(
            pc.and_(pc.greater_equal(ev["ts"], pa.scalar(lo)),
                    pc.less(ev["ts"], pa.scalar(mid)))
        )
        check(lake, oracle_fold(in_w))

    def test_schema_evolution(self, tmp_path):
        spec = ChangelogSpec(
            n_events=8000, n_convs=100, max_turns=8, n_blocks=4,
            evolve_from_lsn=4000, seed=29,
        )
        d = write_changelog_parquet(spec, str(tmp_path / "cl"))
        lake = str(tmp_path / "lake")
        replay_files(d, lake_dir=lake, max_lsn_exclusive=spec.n_events,
                     num_partitions=4, epoch_size=4000)
        got = read_lake_table(lake)
        want = oracle_fold_evolved(all_events(spec))
        assert got.select(want.column_names).cast(want.schema).equals(want)

    def test_single_partition_edge(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake1")
        replay_files(changelog_dir, lake_dir=lake,
                     max_lsn_exclusive=SPEC.n_events, num_partitions=1)
        check(lake, oracle_fold(all_events(SPEC)))
