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


@pytest.mark.usefixtures("ray_session")
class TestDirtyEventsAndVacuum:
    def test_malformed_events_routed_to_dead_letter(self, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from datax_ray.sources.generators import generate_changelog_block
        from datax_ray.transforms.chain import read_dead_letters

        spec = ChangelogSpec(n_events=2000, n_convs=50, max_turns=6,
                             n_blocks=1, seed=61)
        t = generate_changelog_block(spec, 0)
        # corrupt 10 rows: invalid op; 5 rows: null conv_id
        op = t["op"].to_pylist()
        conv = t["conv_id"].to_pylist()
        for i in range(10):
            op[i * 3] = "X"
        for i in range(5):
            conv[i * 7 + 1] = None
        t = t.set_column(t.schema.get_field_index("op"), "op",
                         pa.array(op, pa.string()))
        t = t.set_column(t.schema.get_field_index("conv_id"), "conv_id",
                         pa.array(conv, pa.string()))
        d = tmp_path / "cl"
        d.mkdir()
        pq.write_table(t, str(d / "block-00000.parquet"))
        lake = str(tmp_path / "lake")
        dl = str(tmp_path / "dl")
        res = replay_files(str(d), lake_dir=lake, max_lsn_exclusive=2000,
                           num_partitions=4, dead_letter_dir=dl)
        dead = read_dead_letters(dl)
        # overlap between the two corruptions is possible; at least each set
        assert dead.num_rows >= 13
        assert set(dead["_error"].to_pylist()) == {"invalid_event"}
        assert res.events_applied == 2000 - dead.num_rows

    def test_vacuum_removes_unreferenced_files(self, changelog_dir, tmp_path):
        import os

        from datax_ray.sinks.lake import delta_path, vacuum

        lake = str(tmp_path / "lake")
        replay_files(changelog_dir, lake_dir=lake,
                     max_lsn_exclusive=SPEC.n_events, num_partitions=4,
                     epoch_size=12_000, compact_every=0)
        before = read_lake_table(lake)
        # orphan: a delta written by a "crashed" epoch that never committed
        orphan = delta_path(lake, 0, 99)
        os.makedirs(os.path.dirname(orphan), exist_ok=True)
        open(orphan, "wb").write(b"junk")
        victims = vacuum(lake, dry_run=True)
        assert orphan in victims
        vacuum(lake)
        assert not os.path.exists(orphan)
        assert read_lake_table(lake).equals(before)
