"""Stateful actor-pool merge: must be byte-equivalent to the stateless
exchange path, snapshot compaction must preserve state, reads must serve
from resident state."""

import pyarrow as pa
import pytest

from datax_ray.cdc.actor_merge import MergeActorPool, replay_files_stateful
from datax_ray.cdc.replay import replay_files
from datax_ray.sinks.lake import read_lake_table
from datax_ray.sources.generators import ChangelogSpec, write_changelog_parquet
from datax_ray.state.manifest import Manifest
from tests.test_merge import oracle_fold
from tests.test_replay import all_events

SPEC = ChangelogSpec(
    n_events=16_000, n_convs=200, max_turns=8, n_blocks=4,
    ooo_fraction=0.1, dup_fraction=0.05, seed=37,
)


@pytest.fixture(scope="module")
def changelog_dir(tmp_path_factory):
    return write_changelog_parquet(SPEC, str(tmp_path_factory.mktemp("am")))


@pytest.mark.usefixtures("ray_session")
class TestActorMerge:
    def test_equivalent_to_stateless_path(self, changelog_dir, tmp_path):
        lake_a = str(tmp_path / "lake_actors")
        lake_s = str(tmp_path / "lake_stateless")
        res = replay_files_stateful(
            changelog_dir, lake_dir=lake_a, max_lsn_exclusive=SPEC.n_events,
            num_partitions=8, num_actors=3, epoch_size=4000, snapshot_every=0,
        )
        assert res.epochs_run == 4
        replay_files(changelog_dir, lake_dir=lake_s,
                     max_lsn_exclusive=SPEC.n_events,
                     num_partitions=8, epoch_size=4000, compact_every=0)
        ta = read_lake_table(lake_a)
        ts = read_lake_table(lake_s)
        assert ta.equals(ts)
        want = oracle_fold(all_events(SPEC))
        got = ta.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        assert got.cast(want.schema).equals(want)

    def test_snapshot_compaction_preserves_state(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        replay_files_stateful(
            changelog_dir, lake_dir=lake, max_lsn_exclusive=SPEC.n_events,
            num_partitions=8, num_actors=2, epoch_size=4000, snapshot_every=2,
        )
        m = Manifest.load(lake)
        # snapshots replaced delta chains with bases
        assert any(st["base"] for st in m.state["partitions"].values())
        want = oracle_fold(all_events(SPEC))
        got = read_lake_table(lake).select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        assert got.cast(want.schema).equals(want)

    def test_resident_read_and_evict(self, changelog_dir, tmp_path):
        import ray

        lake = str(tmp_path / "lake")
        pool = MergeActorPool(lake, 2)
        replay_files_stateful(
            changelog_dir, lake_dir=lake, max_lsn_exclusive=SPEC.n_events,
            num_partitions=4, num_actors=2, epoch_size=8000,
            snapshot_every=0, pool=pool,
        )
        m = Manifest.load(lake)
        part = 0
        st = ray.get(pool.owner(part).read_state.remote(part, m.partition_files(part)))
        assert st is not None and st.num_rows > 0
        assert "op" in st.column_names
        rb = ray.get(pool.owner(part).resident_bytes.remote())
        assert rb > 0
        path = ray.get(pool.owner(part).evict.remote(part, 99))
        assert path and path.endswith("base-000099.parquet")

    def test_resume_with_fresh_actors_rebuilds_from_lake(self, changelog_dir, tmp_path):
        lake = str(tmp_path / "lake")
        replay_files_stateful(
            changelog_dir, lake_dir=lake, max_lsn_exclusive=8000,
            num_partitions=4, num_actors=2, epoch_size=4000, snapshot_every=0,
        )
        # "crash": new pool (fresh actors), resume the remaining epochs,
        # snapshot at the end — the snapshot must include pre-crash state
        res = replay_files_stateful(
            changelog_dir, lake_dir=lake, max_lsn_exclusive=SPEC.n_events,
            num_partitions=4, num_actors=2, epoch_size=4000, snapshot_every=2,
        )
        assert res.epochs_skipped == 2 and res.epochs_run == 2
        want = oracle_fold(all_events(SPEC))
        got = read_lake_table(lake).select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        assert got.cast(want.schema).equals(want)
