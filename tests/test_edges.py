"""Edge cases: unicode text through merge + CSV, delete-only changelog,
empty epoch ranges, stable (conv_id, turn_idx) output ordering."""

import numpy as np
import pyarrow as pa
import pytest

from datax_ray.cdc.merge import lww_fold_table
from tests.test_merge import mk_events


class TestEdgesLocal:
    def test_unicode_text_lww(self):
        ev = mk_events(
            [
                (1, "I", "α", 0, "user", "héllo wörld 你好 🙂", None, 100),
                (2, "U", "α", 0, "user", "ÅÄÖ ß 水 — em–dash", None, 200),
            ]
        )
        out = lww_fold_table(ev, drop_deletes=True)
        assert out["text"].to_pylist() == ["ÅÄÖ ß 水 — em–dash"]

    def test_delete_only_log_yields_empty(self):
        ev = mk_events(
            [
                (1, "D", "a", 0, None, None, None, 100),
                (2, "D", "b", 1, None, None, None, 200),
            ]
        )
        assert lww_fold_table(ev, drop_deletes=True).num_rows == 0
        # but tombstones survive a partial fold
        assert lww_fold_table(ev, drop_deletes=False).num_rows == 2

    def test_empty_table(self):
        ev = mk_events([(1, "I", "a", 0, "u", "x", None, 1)]).slice(0, 0)
        assert lww_fold_table(ev, drop_deletes=True).num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestEdgesRay:
    def test_unicode_csv_roundtrip(self, tmp_path):
        import ray.data as rd

        from datax_ray.sinks.csvsink import list_output_files, write_csv
        from datax_ray.sources.csvsource import read_csv

        src = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "text": ["héllo, wörld", "你好\n水", 'quo"te 🙂'],
        })
        out = str(tmp_path / "csv")
        write_csv(rd.from_arrow(src), out, write_mode="truncate")
        back = read_csv(list_output_files(out), columns=[
            {"index": 0, "type": "long", "name": "id"},
            {"index": 1, "type": "string", "name": "text"},
        ]).to_pandas().sort_values("id")
        assert back["text"].tolist() == src["text"].to_pylist()

    def test_epoch_range_beyond_data_is_noop(self, tmp_path):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sinks.lake import read_lake_table
        from datax_ray.sources.generators import ChangelogSpec, write_changelog_parquet

        spec = ChangelogSpec(n_events=1000, n_convs=20, max_turns=4,
                             n_blocks=1, seed=71)
        cl = write_changelog_parquet(spec, str(tmp_path / "cl"))
        lake = str(tmp_path / "lake")
        # plan far beyond the actual data: empty epochs commit zero events
        res = replay_files(cl, lake_dir=lake, max_lsn_exclusive=5000,
                           num_partitions=2, epoch_size=1000)
        assert res.epochs_run == 5
        assert res.events_applied == 1000
        t = read_lake_table(lake)
        assert t.num_rows > 0

    def test_output_ordering_invariant(self, tmp_path):
        """read_lake_table returns stable (conv_id, turn_idx) ordering —
        the per-turn text equality invariant's ordering half."""
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sinks.lake import read_lake_table
        from datax_ray.sources.generators import ChangelogSpec, write_changelog_parquet

        spec = ChangelogSpec(n_events=3000, n_convs=40, max_turns=6,
                             n_blocks=2, seed=73)
        cl = write_changelog_parquet(spec, str(tmp_path / "cl"))
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=3000, num_partitions=4)
        t = read_lake_table(lake)
        keys = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
        assert keys == sorted(keys)
        assert len(set(keys)) == len(keys)  # key uniqueness after fold


@pytest.mark.usefixtures("ray_session")
class TestPointLookup:
    def test_lookup_conversation_reads_one_partition(self, tmp_path):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sinks.lake import lookup_conversation, read_lake_table
        from datax_ray.sources.generators import ChangelogSpec, write_changelog_parquet

        spec = ChangelogSpec(n_events=4000, n_convs=60, max_turns=6,
                             n_blocks=2, seed=79)
        cl = write_changelog_parquet(spec, str(tmp_path / "cl"))
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=4000, num_partitions=8)
        full = read_lake_table(lake)
        conv = full["conv_id"][0].as_py()
        got = lookup_conversation(lake, conv)
        want = full.filter(
            pa.compute.equal(full["conv_id"], pa.scalar(conv))
        ).sort_by([("turn_idx", "ascending")])
        assert got.select(want.column_names).equals(want)
        assert got.num_rows > 0
        assert lookup_conversation(lake, "conv_does_not_exist").num_rows == 0
