"""Round-2 fixes: manifest fencing, resume plan validation, actor
evict/reload safety, CDC dead-letter + error budget, speed throttle,
JSON-spec'able dx_python, hot-bucket caps, bz2 CSV, byte-identical lakes."""

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datax_ray.state.manifest import FencedError, Manifest
from datax_ray.util import TokenBucket


# ------------------------------------------------------- manifest fencing
class TestFencing:
    def test_stale_run_commit_is_fenced(self, tmp_path):
        lake = str(tmp_path / "lake")
        m_old = Manifest.load_or_create(lake, num_partitions=4, run_id="run-A")
        # a newer run takes ownership
        Manifest.load_or_create(lake, num_partitions=4, run_id="run-B")
        with pytest.raises(FencedError):
            m_old.commit_epoch(0, 0, 100, [], 0.1)
        with pytest.raises(FencedError):
            m_old.commit_compaction(0, "base.parquet", removed=[])
        # the new owner's manifest is untouched
        assert Manifest.load(lake).run_id == "run-B"
        assert Manifest.load(lake).state["epochs"] == []

    def test_commit_merges_fresh_disk_state(self, tmp_path):
        # two Manifest objects of the SAME run: a commit through one must
        # not clobber a commit through the other (merge, not overwrite)
        lake = str(tmp_path / "lake")
        m1 = Manifest.load_or_create(lake, num_partitions=2, run_id="r")
        m2 = Manifest(lake, json.loads(json.dumps(m1.state)))
        m1.commit_epoch(0, 0, 10, [], 0.1)
        m2.commit_epoch(1, 10, 20, [], 0.1)
        assert Manifest.load(lake).committed_epochs() == {0, 1}

    def test_fenced_when_manifest_deleted(self, tmp_path):
        lake = str(tmp_path / "lake")
        m = Manifest.load_or_create(lake, num_partitions=2, run_id="r")
        os.remove(m.path)
        with pytest.raises(FencedError):
            m.commit_epoch(0, 0, 10, [], 0.1)


# -------------------------------------------------- resume plan validation
class TestResumeValidation:
    def _manifest_with_epoch(self, tmp_path, lo, hi):
        lake = str(tmp_path / "lake")
        m = Manifest.load_or_create(lake, num_partitions=2, run_id="r")
        m.commit_epoch(0, lo, hi, [], 0.1)
        return m

    def test_plan_resuming_adopts_committed_prefix(self, tmp_path):
        from datax_ray.cdc.replay import plan_epochs_resuming

        m = self._manifest_with_epoch(tmp_path, 0, 100)
        plan, committed = plan_epochs_resuming(m, 200, 100)
        assert plan == [(0, 100), (100, 200)]
        assert committed == {0}

    def test_plan_resuming_retiles_remainder_with_new_size(self, tmp_path):
        """Changing epoch_size on resume only affects UNcommitted lsns —
        the committed range is adopted verbatim, never renumbered."""
        from datax_ray.cdc.replay import plan_epochs_resuming

        m = self._manifest_with_epoch(tmp_path, 0, 100)
        plan, committed = plan_epochs_resuming(m, 200, 50)
        assert plan == [(0, 100), (100, 150), (150, 200)]
        assert committed == {0}

    def test_plan_resuming_rejects_noncontiguous_commits(self, tmp_path):
        from datax_ray.cdc.replay import plan_epochs_resuming

        m = self._manifest_with_epoch(tmp_path, 0, 100)
        m.commit_epoch(1, 150, 200, [], 0.1)  # gap 100..150
        with pytest.raises(ValueError, match="corrupted manifest"):
            plan_epochs_resuming(m, 300, 100)

    def test_plan_resuming_adopts_ragged_prefix(self, tmp_path):
        """The committed (possibly max_lsn-truncated) ranges become the
        plan prefix verbatim; new epoch_size tiles only the remainder —
        a lake whose last run stopped mid-epoch stays resumable."""
        from datax_ray.cdc.replay import plan_epochs_resuming

        lake = str(tmp_path / "lake")
        m = Manifest.load_or_create(lake, num_partitions=2, run_id="r")
        m.commit_epoch(0, 0, 1000, [], 0.1)
        m.commit_epoch(1, 1000, 1500, [], 0.1)  # ragged tail
        plan, committed = plan_epochs_resuming(m, 3000, 1000)
        assert plan == [(0, 1000), (1000, 1500), (1500, 2500), (2500, 3000)]
        assert committed == {0, 1}

    def test_plan_resuming_rejects_corrupt_manifest(self, tmp_path):
        from datax_ray.cdc.replay import plan_epochs_resuming

        lake = str(tmp_path / "lake")
        m = Manifest.load_or_create(lake, num_partitions=2, run_id="r")
        m.commit_epoch(0, 0, 1000, [], 0.1)
        m.commit_epoch(1, 1200, 1500, [], 0.1)  # gap: not contiguous
        with pytest.raises(ValueError, match="corrupted manifest"):
            plan_epochs_resuming(m, 3000, 1000)

    @pytest.mark.usefixtures("ray_session")
    def test_replay_files_resumes_ragged_lake_with_new_epoch_size(self, tmp_path):
        import duckdb

        from datax_ray.cdc.replay import replay_files
        from datax_ray.sinks.lake import read_lake_table
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        spec = ChangelogSpec(n_events=4000, n_convs=50, max_turns=8,
                             n_blocks=2, seed=31)
        d = str(tmp_path / "cl")
        write_changelog_parquet(spec, d)
        lake = str(tmp_path / "lake")
        # first run: max_lsn NOT aligned to epoch_size (ragged tail epoch)
        replay_files(d, lake_dir=lake, max_lsn_exclusive=1500,
                     num_partitions=4, epoch_size=1000)
        # resume with a DIFFERENT epoch_size over the full range
        res = replay_files(d, lake_dir=lake, max_lsn_exclusive=4000,
                           num_partitions=4, epoch_size=1000)
        assert res.epochs_skipped == 2
        got = read_lake_table(lake).select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        con = duckdb.connect()
        want = con.execute(f"""
            SELECT conv_id, turn_idx, role, text, tool, ts FROM (
              SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                             ORDER BY ts DESC, lsn DESC) AS rn
              FROM read_parquet('{d}/*.parquet'))
            WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx
        """).fetch_arrow_table()
        assert got.num_rows == want.num_rows
        assert got.cast(want.schema).equals(want)


# --------------------------------------------------- actor evict data-loss
class TestActorEvictReload:
    def test_evicted_partition_reloads_from_lake(self, tmp_path):
        """The ADVICE scenario: apply → evict (spill) → apply again with the
        committed file list → state must include pre-evict rows."""
        from datax_ray.cdc.actor_merge import _MergeActorImpl
        from datax_ray.cdc.merge import EVENT_WEIGHT_COL

        lake = str(tmp_path / "lake")
        os.makedirs(lake)
        actor = _MergeActorImpl(lake)

        def ev(lsn, turn, text):
            return pa.table({
                "lsn": pa.array([lsn], pa.int64()),
                "op": pa.array(["I"], pa.string()),
                "conv_id": pa.array(["c0"], pa.string()),
                "turn_idx": pa.array([turn], pa.int32()),
                "role": pa.array(["user"], pa.string()),
                "text": pa.array([text], pa.string()),
                "tool": pa.array([None], pa.string()),
                "ts": pa.array([lsn], pa.timestamp("ms")),
                EVENT_WEIGHT_COL: pa.array([1], pa.int64()),
            })

        r0 = actor.apply(0, 0, [], ev(1, 0, "first"))
        committed = [r0["file"]]
        actor.evict(0, epoch=0)  # spill + drop from memory
        assert 0 not in actor.state
        # next epoch arrives with the manifest's committed file list
        actor.apply(1, 0, committed, ev(2, 1, "second"))
        state = actor.read_state(0, committed)
        assert state.num_rows == 2
        assert sorted(state["text"].to_pylist()) == ["first", "second"]

    def test_evict_then_empty_list_would_have_lost_data(self, tmp_path):
        """Regression guard documenting the old bug shape: loading with []
        after evict rebuilds empty — replay_files_stateful must never do
        that (it now always passes manifest.partition_files)."""
        from datax_ray.cdc.actor_merge import _MergeActorImpl

        actor = _MergeActorImpl(str(tmp_path))
        actor._ensure_loaded(3, [])
        assert actor.state[3] is None  # empty: the dangerous rebuild


# --------------------------------------------- CDC dead-letter + budget
@pytest.mark.usefixtures("ray_session")
class TestCdcDeadLetter:
    def _changelog_with_bad_rows(self, tmp_path):
        from datax_ray.sources.generators import (
            ChangelogSpec,
            generate_changelog_block,
        )

        spec = ChangelogSpec(n_events=2000, n_convs=40, max_turns=8,
                             n_blocks=1, seed=37)
        t = generate_changelog_block(spec, 0)
        # corrupt 10 events: unknown op
        op = t["op"].to_pylist()
        for i in range(0, 100, 10):
            op[i] = "X"
        t = t.set_column(t.schema.get_field_index("op"), "op",
                         pa.array(op, pa.string()))
        d = tmp_path / "cl"
        d.mkdir()
        pq.write_table(t, str(d / "block-00000.parquet"))
        return str(d), t.num_rows

    def test_dead_letter_routed_and_counted(self, tmp_path):
        from datax_ray.cli import run_job

        d, n = self._changelog_with_bad_rows(tmp_path)
        dl = str(tmp_path / "dead")
        spec = {"job": {
            "content": {
                "reader": {"name": "changelog", "parameter": {
                    "path": d, "maxLsnExclusive": 2000}},
                "writer": {"name": "lake_upsert", "parameter": {
                    "path": str(tmp_path / "lake"), "numPartitions": 4}},
            },
            "setting": {"deadLetterDir": dl,
                        "errorLimit": {"record": 100}},
        }}
        rep = run_job(spec)
        assert rep["ok"]
        assert rep["result"]["dead_lettered"] == 10
        assert rep["counters"]["dirty"] == 10
        files = [f for f in os.listdir(dl) if f.endswith(".parquet")]
        assert sum(pq.read_metadata(os.path.join(dl, f)).num_rows
                   for f in files) == 10

    def test_error_budget_enforced_for_cdc(self, tmp_path):
        from datax_ray.cli import run_job
        from datax_ray.transforms import ErrorLimitExceeded

        d, _ = self._changelog_with_bad_rows(tmp_path)
        spec = {"job": {
            "content": {
                "reader": {"name": "changelog", "parameter": {
                    "path": d, "maxLsnExclusive": 2000}},
                "writer": {"name": "lake_upsert", "parameter": {
                    "path": str(tmp_path / "lake"), "numPartitions": 4}},
            },
            "setting": {"deadLetterDir": str(tmp_path / "dead"),
                        "errorLimit": {"record": 0}},
        }}
        with pytest.raises(ErrorLimitExceeded):
            run_job(spec)


# ----------------------------------------------------------- flow control
class TestSpeed:
    def test_token_bucket_oversized_acquire_terminates(self):
        tb = TokenBucket(rate=10_000, burst=10)
        t0 = time.monotonic()
        tb.acquire(100)  # 10× the burst: must not deadlock
        slept = tb.acquire(100)
        assert time.monotonic() - t0 < 2.0
        assert slept > 0.0

    @pytest.mark.usefixtures("ray_session")
    def test_job_with_record_speed_is_throttled(self, tmp_path):
        from datax_ray.cli import run_job

        out = str(tmp_path / "out")
        base = {"job": {
            "content": {
                "reader": {"name": "stream", "parameter": {
                    "sliceRecordCount": 500, "slices": 2,
                    "column": [{"type": "long", "value": 1, "name": "x"}]}},
                "writer": {"name": "csv", "parameter": {
                    "path": out, "writeMode": "truncate"}},
            },
            "setting": {"speed": {"record": 900, "channel": 2}},
        }}
        t0 = time.monotonic()
        rep = run_job(base)
        wall = time.monotonic() - t0
        assert rep["ok"] and rep["result"]["rows"] == 1000
        # 1000 records at 900 rec/s with burst 900 → ≥ ~0.1 s of waiting;
        # generous bound (CI noise) but strictly > un-throttled
        assert wall >= 0.1


    @pytest.mark.usefixtures("ray_session")
    def test_cdc_record_rate_paces_epochs(self, tmp_path):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        spec = ChangelogSpec(n_events=4000, n_convs=50, max_turns=8,
                             n_blocks=2, seed=43)
        d = str(tmp_path / "cl")
        write_changelog_parquet(spec, d)
        t0 = time.monotonic()
        replay_files(d, lake_dir=str(tmp_path / "lake"),
                     max_lsn_exclusive=4000, num_partitions=4,
                     epoch_size=1000, record_rate=8000)
        # ~4000+ events at 8000 ev/s with burst 8000 → some pacing, but the
        # bucket's burst covers most of it; just assert it completed and
        # the lake is full (pacing must not drop events)
        assert time.monotonic() - t0 < 60
        from datax_ray.state.manifest import Manifest

        assert len(Manifest.load(str(tmp_path / "lake")).state["epochs"]) == 4


# ------------------------------------------------------ dx_python via JSON
@pytest.mark.usefixtures("ray_session")
class TestDxPythonSpec:
    def test_module_function_string(self, tmp_path):
        from datax_ray.cli import run_job

        out = str(tmp_path / "out")
        spec = {"job": {
            "content": {
                "reader": {"name": "parquet", "parameter": {
                    "path": "/root/testdata/sf0.001/documents.parquet",
                    "columns": ["doc_id", "text"]}},
                "transformer": [
                    {"name": "dx_python",
                     "parameter": {"fn": "tests.test_round2:upper_text"}},
                ],
                "writer": {"name": "parquet", "parameter": {
                    "path": out, "writeMode": "truncate"}},
            },
        }}
        rep = run_job(spec)
        assert rep["ok"]
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        t = pq.read_table(os.path.join(out, files[0]))
        texts = [x for x in t["text"].to_pylist() if x]
        assert texts and all(x == x.upper() for x in texts)

    def test_bad_fn_spec_raises(self):
        from datax_ray.transforms import build_transform

        with pytest.raises(TypeError):
            build_transform({"name": "dx_python", "parameter": {"fn": 42}})


def upper_text(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return t.set_column(t.schema.get_field_index("text"), "text",
                        pc.utf8_upper(t["text"]))


# -------------------------------------------------------- hot-bucket caps
class TestBucketCap:
    def test_pair_indices_linear_and_connected(self):
        from datax_ray.ops.dedup import _bucket_pair_indices, connected_components

        n, cap = 10_000, 128
        ia, ib = _bucket_pair_indices(n, cap)
        # O(n·cap) pairs, not O(n²)
        assert len(ia) <= n * cap
        assert (ia < ib).all()
        # chunk-representative links keep the bucket ONE component
        comp = connected_components(list(zip(ia.tolist(), ib.tolist())))
        assert len(set(comp.values())) == 1

    def test_small_bucket_unchanged(self):
        from datax_ray.ops.dedup import _bucket_pair_indices

        ia, ib = _bucket_pair_indices(10, 128)
        ja, jb = np.triu_indices(10, k=1)
        assert (ia == ja).all() and (ib == jb).all()

    @pytest.mark.usefixtures("ray_session")
    def test_degenerate_corpus_completes_fast(self):
        """10k near-identical docs → one LSH bucket per band; capped pair
        generation must stay ~linear and still connect everything."""
        import ray.data as rd

        from datax_ray.ops.dedup import connected_components, simhash_candidates

        n = 10_000
        t = pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["the same boilerplate text"] * n),
        })
        t0 = time.monotonic()
        pairs = simhash_candidates(rd.from_arrow(t), max_hamming=3,
                                   bucket_cap=512).to_pandas()
        assert time.monotonic() - t0 < 120
        # bounded output: ≤ bands × n × cap (plus rep links)
        assert len(pairs) <= 4 * n * 512
        comp = connected_components(
            list(zip(pairs["id_a"].tolist(), pairs["id_b"].tolist()))
        )
        assert len(set(comp.values())) == 1  # all dups in one cluster


# -------------------------------------------------- winnowing fingerprints
class TestWinnow:
    def test_shared_substring_yields_shared_fingerprint(self):
        from datax_ray.ops.hashing import winnow_batch

        shared = "the quick brown fox jumps over the lazy dog"
        texts = ["AAAA " + shared + " BBBB",
                 "CCCC " + shared + " DDDD",
                 "zzzz completely different content here yyyy"]
        d, f = winnow_batch(texts, k=8, w=4)
        fps = [set(f[d == i].tolist()) for i in range(3)]
        # winnowing guarantee: substring ≥ k+w-1 chars shared ⇒ fp shared
        assert fps[0] & fps[1]
        assert not (fps[0] & fps[2])

    def test_identical_docs_identical_sets(self):
        from datax_ray.ops.hashing import winnow_batch

        t = "some document body that is long enough to fingerprint"
        d, f = winnow_batch([t, "  SOME   document body that is long "
                                "enough to fingerprint  "], k=8, w=4)
        # normalization: case + whitespace collapse ⇒ identical sets
        assert set(f[d == 0].tolist()) == set(f[d == 1].tolist())

    def test_short_and_null_docs_emit_nothing(self):
        from datax_ray.ops.hashing import winnow_batch

        d, f = winnow_batch(["ab", None, ""], k=8, w=4)
        assert len(d) == 0 and len(f) == 0

    def test_md5_mode_matches_fast_mode_selection_counts(self):
        """Same window-min rule in both modes: per-doc fingerprint counts
        agree (hash domains differ; the selection positions coincide only
        statistically, but set sizes track the same windows)."""
        import pyarrow as pa2

        from datax_ray.ops.text import winnow_fingerprints

        t = pa2.table({
            "doc_id": pa2.array([1], pa2.int64()),
            "text": pa2.array(["one two three four five six seven eight"]),
        })
        fast = winnow_fingerprints(t, mode="fast")
        slow = winnow_fingerprints(t, mode="md5")
        assert fast.num_rows > 0
        # both select from the same number of windows; distinct counts are
        # within the window count
        n_windows = len(" ".join(t["text"][0].as_py().split())) - 8 + 1
        assert fast.num_rows <= n_windows and slow.num_rows <= n_windows


# ------------------------------------------------------------ bz2 CSV io
@pytest.mark.usefixtures("ray_session")
class TestBz2Csv:
    def test_roundtrip_bz2(self, tmp_path):
        import bz2

        from datax_ray.sinks.csvsink import write_csv
        from datax_ray.sources.csvsource import read_csv

        src = tmp_path / "in.csv.bz2"
        with bz2.open(str(src), "wt") as f:
            f.write("1,alpha\n2,beta\n3,\\N\n")
        ds = read_csv(str(src), columns=[
            {"index": 0, "type": "long", "name": "id"},
            {"index": 1, "type": "string", "name": "name"},
        ])
        rows = sorted(ds.to_pandas().to_dict("records"), key=lambda r: r["id"])
        assert [r["id"] for r in rows] == [1, 2, 3]
        assert rows[2]["name"] is None
        # write side
        out = str(tmp_path / "out")
        report = write_csv(ds, out, write_mode="truncate", compress="bzip2")
        files = [f for f in os.listdir(out) if f.endswith(".csv.bz2")]
        assert files and sum(r["rows"] for r in report) == 3

    def test_date_extra_formats_chain(self, tmp_path):
        """ColumnCast.java:87-117: primary format first, extraFormats
        fall-through per row; rows failing every format go dirty."""
        from datax_ray.sources.csvsource import read_csv

        src = tmp_path / "in.csv"
        src.write_text("1,2024-01-02 03:04:05\n"
                       "2,2024/01/03\n"
                       "3,05:06:07\n"
                       "4,notadate\n")
        dl = str(tmp_path / "dead")
        ds = read_csv(str(src), columns=[
            {"index": 0, "type": "long", "name": "id"},
            {"index": 1, "type": "date", "name": "at",
             "format": "yyyy-MM-dd HH:mm:ss",
             "extraFormats": ["yyyy/MM/dd", "HH:mm:ss"]},
        ], dead_letter_dir=dl)
        df = ds.to_pandas().sort_values("id").reset_index(drop=True)
        assert df["id"].tolist() == [1, 2, 3]  # row 4 dead-lettered
        assert str(df.loc[0, "at"]) == "2024-01-02 03:04:05"
        assert str(df.loc[1, "at"]) == "2024-01-03 00:00:00"
        assert os.listdir(dl)

    def test_zip_archive_read(self, tmp_path):
        import zipfile

        from datax_ray.sources.csvsource import read_csv

        src = tmp_path / "in.zip"
        with zipfile.ZipFile(str(src), "w") as zf:
            zf.writestr("a.csv", "1,alpha\n2,beta\n")
            zf.writestr("sub/b.csv", "3,gamma\n")
        ds = read_csv(str(src), columns=[
            {"index": 0, "type": "long", "name": "id"},
            {"index": 1, "type": "string", "name": "name"},
        ])
        rows = sorted(ds.to_pandas().to_dict("records"), key=lambda r: r["id"])
        assert [r["name"] for r in rows] == ["alpha", "beta", "gamma"]


# --------------------------------------------- byte-identical lake deltas
@pytest.mark.usefixtures("ray_session")
class TestLakePathParity:
    def test_dataset_path_deltas_have_no_part_column(self, tmp_path):
        from datax_ray.cdc.replay import replay
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )
        from datax_ray.sources.parquet import read_changelog
        from datax_ray.state.manifest import Manifest

        spec = ChangelogSpec(n_events=4000, n_convs=50, max_turns=8,
                             n_blocks=2, seed=41)
        d = str(tmp_path / "cl")
        write_changelog_parquet(spec, d)
        lake = str(tmp_path / "lake")
        replay(
            lambda lo, hi: read_changelog(d, lsn_range=(lo, hi)),
            lake_dir=lake, max_lsn_exclusive=spec.n_events, num_partitions=4,
        )
        m = Manifest.load(lake)
        for p in range(4):
            for f in m.partition_files(p):
                assert "part" not in pq.read_schema(f).names


# --------------------------------------------------------- multimodal a/v
@pytest.mark.usefixtures("ray_session")
class TestMultimodalAV:
    def test_audio_features_deterministic(self):
        import ray.data as rd

        from datax_ray.ops.multimodal import (
            extract_audio_features,
            synthetic_audio_table,
        )

        t = synthetic_audio_table(64, seed=5)
        a = extract_audio_features(rd.from_arrow(t), concurrency=2,
                                   batch_size=16).to_pandas()
        b = extract_audio_features(rd.from_arrow(t), concurrency=2,
                                   batch_size=16).to_pandas()
        a = a.sort_values("media_id").reset_index(drop=True)
        b = b.sort_values("media_id").reset_index(drop=True)
        assert len(a) == 64
        assert (a["duration_s"] > 0).all()
        assert all((x == y).all() for x, y in zip(a["features"], b["features"]))

    def test_video_frame_sampling_shape(self):
        import ray.data as rd

        from datax_ray.ops.multimodal import (
            sample_video_frames,
            synthetic_video_table,
        )

        t = synthetic_video_table(32, seed=6)
        df = sample_video_frames(rd.from_arrow(t), k=4, concurrency=2,
                                 batch_size=8).to_pandas()
        # ≤ k frames per video, ≥ 1, frame_idx within range, ts monotone
        g = df.groupby("media_id")
        assert (g.size() <= 4).all() and (g.size() >= 1).all()
        nf = {r["media_id"]: r["n_frames"] for r in t.to_pylist()}
        for mid, grp in g:
            assert (grp["frame_idx"] < nf[mid]).all()
            assert grp.sort_values("frame_idx")["ts_ms"].is_monotonic_increasing
        assert (df["frame"].str.len() > 0).any()

    def test_strict_mode_raises(self):
        from datax_ray.ops.multimodal import AudioFeatureExtractor, VideoFrameSampler

        with pytest.raises(NotImplementedError):
            AudioFeatureExtractor(strict=True)(None)
        with pytest.raises(NotImplementedError):
            VideoFrameSampler(strict=True)(None)

    def test_media_stage_edge_cases(self):
        from datax_ray.ops.multimodal import (
            AUDIO_SCHEMA,
            AudioFeatureExtractor,
            ImageFeatureExtractor,
            MEDIA_SCHEMA,
            VIDEO_SCHEMA,
            VideoFrameSampler,
        )

        # empty batches must not crash (Ray can deliver zero-row blocks)
        assert ImageFeatureExtractor()(MEDIA_SCHEMA.empty_table()).num_rows == 0
        assert AudioFeatureExtractor()(AUDIO_SCHEMA.empty_table()).num_rows == 0
        assert VideoFrameSampler()(VIDEO_SCHEMA.empty_table()).num_rows == 0
        # null sample_rate → null duration (not a 1 Hz guess)
        audio = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "mime": pa.array(["audio/fake"] * 2),
            "payload": pa.array([b"xx", b"yy"], pa.binary()),
            "sample_rate": pa.array([None, 16000], pa.int32()),
            "n_samples": pa.array([44100, 32000], pa.int64()),
        })
        out = AudioFeatureExtractor()(audio)
        assert out["duration_s"][0].as_py() is None
        assert out["duration_s"][1].as_py() == 2.0
        # n_frames=0 emits nothing; NaN fps falls back; oversized n_frames
        # still yields non-empty frame bytes
        video = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "mime": pa.array(["video/fake"] * 2),
            "payload": pa.array([b"abcd", b"0123456789"], pa.binary()),
            "n_frames": pa.array([0, 100], pa.int32()),
            "fps": pa.array([24.0, float("nan")], pa.float32()),
        })
        vout = VideoFrameSampler(k=4)(video)
        assert set(vout["media_id"].to_pylist()) == {2}
        assert all(len(f) > 0 for f in vout["frame"].to_pylist())
        assert all(t >= 0 for t in vout["ts_ms"].to_pylist())
