"""Round-3 additions: resume-safe dead-letter accounting, mid-run error
budget abort, global top-k without a sort shuffle."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ------------------------------------------- dead-letter range accounting
class TestDeadLetterAccounting:
    def _write_dl(self, d, name, rows):
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"x": list(range(rows))}),
                       os.path.join(d, name))

    def test_rows_for_ranges(self, tmp_path):
        from datax_ray.cdc.replay import dead_letter_rows_for_ranges

        d = str(tmp_path / "dl")
        self._write_dl(d, "dl-0-1000-abc.parquet", 5)
        self._write_dl(d, "dl-1000-2000-def.parquet", 3)
        self._write_dl(d, "dl-ffffffff.parquet", 7)  # untagged: ignored
        assert dead_letter_rows_for_ranges(d, [(0, 1000)]) == 5
        assert dead_letter_rows_for_ranges(d, [(0, 1000), (1000, 2000)]) == 8
        assert dead_letter_rows_for_ranges(d, [(2000, 3000)]) == 0
        assert dead_letter_rows_for_ranges(None, [(0, 1000)]) == 0
        assert dead_letter_rows_for_ranges(d, []) == 0


def _changelog_with_bad_rows(tmp_path, n_events=2000, n_bad=10):
    """Changelog parquet with ``n_bad`` unknown-op events in lsn [0, 100)."""
    from datax_ray.sources.generators import ChangelogSpec, generate_changelog_block

    spec = ChangelogSpec(n_events=n_events, n_convs=40, max_turns=8,
                         n_blocks=1, seed=37)
    t = generate_changelog_block(spec, 0)
    op = t["op"].to_pylist()
    for i in range(0, n_bad * 10, 10):
        op[i] = "X"
    t = t.set_column(t.schema.get_field_index("op"), "op",
                     pa.array(op, pa.string()))
    d = tmp_path / "cl"
    d.mkdir()
    pq.write_table(t, str(d / "block-00000.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestResumeDeadLetterBudget:
    def test_resume_with_all_epochs_committed_counts_zero_dirty(self, tmp_path):
        """A resumed run that SKIPS every epoch executed nothing — the
        pre-existing dead-letter files belong to prior runs' budgets."""
        from datax_ray.cli import run_job

        d = _changelog_with_bad_rows(tmp_path)
        dl = str(tmp_path / "dead")
        spec = {"job": {
            "content": {
                "reader": {"name": "changelog", "parameter": {
                    "path": d, "maxLsnExclusive": 2000}},
                "writer": {"name": "lake_upsert", "parameter": {
                    "path": str(tmp_path / "lake"), "numPartitions": 4}},
            },
            "setting": {"deadLetterDir": dl, "errorLimit": {"record": 100}},
        }}
        rep1 = run_job(spec)
        assert rep1["result"]["dead_lettered"] == 10
        rep2 = run_job(spec, resume=True)
        assert rep2["result"]["epochs_skipped"] >= 1
        assert rep2["result"]["dead_lettered"] == 0
        assert rep2["counters"]["dirty"] == 0

    def test_reexecuted_crashed_epoch_counts_its_dirty_rows(self, tmp_path):
        """Crash AFTER the dead-letter file is written but BEFORE the epoch
        commits: the re-run overwrites the same deterministic file name and
        must still count those rows against ITS budget (the round-2 logic
        keyed on 'files absent before' silently excluded them)."""
        from datax_ray.cdc.replay import replay_files
        from datax_ray.state.manifest import Manifest

        d = _changelog_with_bad_rows(tmp_path)
        dl = str(tmp_path / "dead")
        lake = str(tmp_path / "lake")

        # crash the first run at the first commit
        orig = Manifest.commit_epoch
        calls = {"n": 0}

        def crashing(self, *a, **k):
            calls["n"] += 1
            raise RuntimeError("injected crash before commit")

        Manifest.commit_epoch = crashing
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                replay_files(d, lake_dir=lake, max_lsn_exclusive=2000,
                             num_partitions=4, epoch_size=1000,
                             compact_every=0, dead_letter_dir=dl)
        finally:
            Manifest.commit_epoch = orig
        assert calls["n"] == 1
        dl_files = [f for f in os.listdir(dl) if f.endswith(".parquet")]
        assert dl_files, "dead-letter file must exist from the crashed epoch"

        res = replay_files(d, lake_dir=lake, max_lsn_exclusive=2000,
                           num_partitions=4, epoch_size=1000,
                           compact_every=0, dead_letter_dir=dl)
        assert res.epochs_run == 2 and res.epochs_skipped == 0
        from datax_ray.cdc.replay import dead_letter_rows_for_ranges

        assert dead_letter_rows_for_ranges(dl, res.executed_ranges) == 10

    def test_error_budget_aborts_mid_run(self, tmp_path):
        """Over-budget stops BEFORE publishing the offending epoch: with
        the bad rows all in epoch 0 and record=0, the breach is detected
        from epoch 0's dead-letter files before its commit, so the
        manifest must NOT contain epoch 0 (nor anything after it)."""
        from datax_ray.cdc.replay import replay_files
        from datax_ray.state.manifest import Manifest
        from datax_ray.transforms import ErrorLimit, ErrorLimitExceeded

        d = _changelog_with_bad_rows(tmp_path)
        dl = str(tmp_path / "dead")
        lake = str(tmp_path / "lake")
        with pytest.raises(ErrorLimitExceeded):
            replay_files(d, lake_dir=lake, max_lsn_exclusive=2000,
                         num_partitions=4, epoch_size=200, compact_every=0,
                         dead_letter_dir=dl, error_limit=ErrorLimit(record=0))
        committed = Manifest.load(lake).committed_epochs()
        assert 0 not in committed, "offending epoch must not publish"
        assert len(committed) < 10, "remaining epochs must NOT have published"


# ---------------------------------------------------------------- top-k
@pytest.mark.usefixtures("ray_session")
class TestTopK:
    def _ds(self, n=5000, seed=3):
        import ray.data as rd

        rng = np.random.default_rng(seed)
        t = pa.table({
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.normal(size=n)),
        })
        return rd.from_arrow(t).repartition(8), t

    def test_matches_full_sort(self):
        from datax_ray.ops.topk import topk

        ds, t = self._ds()
        got = topk(ds, ["v", "k"], descending=[True, False], k=10).to_pandas()
        exp = (t.to_pandas().sort_values(["v", "k"], ascending=[False, True])
               .head(10).reset_index(drop=True))
        assert got.reset_index(drop=True).equals(exp)

    def test_ascending_and_ties(self):
        import ray.data as rd

        from datax_ray.ops.topk import topk

        t = pa.table({
            "v": pa.array([1.0, 1.0, 1.0, 2.0, 0.5] * 20),
            "k": pa.array(np.arange(100, dtype=np.int64)),
        })
        got = topk(rd.from_arrow(t).repartition(4), ["v", "k"],
                   descending=[False, False], k=7).to_pandas()
        exp = (t.to_pandas().sort_values(["v", "k"], ascending=[True, True])
               .head(7).reset_index(drop=True))
        assert got.reset_index(drop=True).equals(exp)

    def test_k_larger_than_input(self):
        import ray.data as rd

        from datax_ray.ops.topk import topk

        t = pa.table({"v": pa.array([3.0, 1.0]), "k": pa.array([1, 2])})
        got = topk(rd.from_arrow(t), ["v"], descending=True, k=10).to_pandas()
        assert list(got["v"]) == [3.0, 1.0]

    def test_string_primary_falls_back(self):
        import ray.data as rd

        from datax_ray.ops.topk import topk

        t = pa.table({"s": pa.array(list("zebrafoxcat")),
                      "k": pa.array(np.arange(11, dtype=np.int64))})
        got = topk(rd.from_arrow(t).repartition(3), ["s", "k"],
                   descending=[True, False], k=4).to_pandas()
        exp = (t.to_pandas().sort_values(["s", "k"], ascending=[False, True])
               .head(4).reset_index(drop=True))
        assert got.reset_index(drop=True).equals(exp)


# ----------------------------------------------------- multimodal round 3
@pytest.mark.usefixtures("ray_session")
class TestVideoSamplerVectorized:
    def test_pick_rule_matches_reference_loop(self):
        """The vectorized sampler must equal the obvious per-row loop."""
        from datax_ray.ops.multimodal import VideoFrameSampler, synthetic_video_table

        t = synthetic_video_table(64, seed=9)
        out = VideoFrameSampler(k=4)(t)
        got = out.to_pandas().to_records(index=False)
        exp = []
        for r in t.to_pylist():
            nf = int(r["n_frames"] or 0)
            if nf <= 0:
                continue
            k = min(4, nf)
            blob = r["payload"] or b""
            step = max(len(blob) // nf, 1)
            for i in range(k):
                f = 0 if k == 1 else i * (nf - 1) // (k - 1)
                lo = f * len(blob) // nf if blob else 0
                exp.append((r["media_id"], r["mime"], f,
                            int(f * 1000.0 / r["fps"]), blob[lo:lo + step]))
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            assert tuple(g) == e

    def test_edge_metadata(self):
        """Zero/None n_frames emit nothing; empty payload emits empty
        frames; k'=1 emits frame 0."""
        from datax_ray.ops.multimodal import VIDEO_SCHEMA, VideoFrameSampler

        t = pa.table({
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "mime": pa.array(["v"] * 4),
            "payload": pa.array([b"abcdef", b"", None, b"xy"], pa.binary()),
            "n_frames": pa.array([1, 5, 0, None], pa.int32()),
            "fps": pa.array([24.0, 0.0, 24.0, 24.0], pa.float32()),
        }).cast(VIDEO_SCHEMA)
        out = VideoFrameSampler(k=4)(t).to_pandas()
        assert list(out["media_id"].unique()) == [1, 2]
        one = out[out["media_id"] == 1]
        assert list(one["frame_idx"]) == [0] and list(one["frame"]) == [b"abcdef"]
        two = out[out["media_id"] == 2]
        assert list(two["frame_idx"]) == [0, 1, 2, 4]  # i*(5-1)//3
        assert all(f == b"" for f in two["frame"])     # empty payload
        # fps<=0 falls back to 1.0 fps for ts
        assert list(two["ts_ms"]) == [0, 1000, 2000, 4000]

    def test_fixture_deterministic(self, tmp_path):
        import pyarrow.parquet as pq

        from datax_ray.ops.multimodal import ensure_media_fixture

        d1 = ensure_media_fixture(str(tmp_path / "m1"))
        d2 = ensure_media_fixture(str(tmp_path / "m2"))
        for name in ("media.parquet", "audio.parquet", "video.parquet"):
            a = pq.read_table(os.path.join(d1, name))
            b = pq.read_table(os.path.join(d2, name))
            assert a.equals(b)


# -------------------------------------- distributed connected components
@pytest.mark.usefixtures("ray_session")
class TestDistributedCCScale:
    def test_30k_node_graph_matches_union_find(self):
        """~30k-node candidate graph: the vectorized join-propagation
        rounds must complete quickly (no per-node Python) and agree with
        the driver union-find on every node."""
        import time

        import ray.data as rd

        from datax_ray.ops.dedup import (
            connected_components,
            connected_components_distributed,
        )

        rng = np.random.default_rng(17)
        n = 30_000
        # realistic near-dup candidate graph (the op's documented
        # partitioning assumption): many SMALL components — chains of 8
        # (what capped buckets + star links produce) plus random
        # intra-cluster links
        a = np.arange(n - 1, dtype=np.int64)
        mask = (a % 8) != 7          # break every 8th edge → 12.5k chains
        chain = np.stack([a[mask], a[mask] + 1], axis=1)
        base = rng.integers(0, n // 8, size=3_000, dtype=np.int64) * 8
        off = rng.integers(0, 8, size=(3_000, 2))
        rnd = base[:, None] + off    # random links inside a cluster
        rnd = rnd[rnd[:, 0] != rnd[:, 1]]
        pairs = np.concatenate([chain, rnd])
        t = pa.table({"id_a": pa.array(pairs[:, 0]),
                      "id_b": pa.array(pairs[:, 1])})
        t0 = time.perf_counter()
        got = connected_components_distributed(
            rd.from_arrow(t).repartition(8)
        ).to_pandas()
        secs = time.perf_counter() - t0
        want = connected_components([tuple(p) for p in pairs])
        got_map = dict(zip(got["id"], got["component"]))
        assert got_map == want
        assert secs < 180, f"distributed CC took {secs:.0f}s"


# ------------------------------------------- querySql reader + ORC writer
@pytest.mark.usefixtures("ray_session")
class TestQuerySqlAndOrc:
    def test_duckdb_reader_job_into_orc_writer(self, tmp_path):
        """An arbitrary SQL read (querySql mode) flowing into any writer
        through the job spec — here two SQL slices into the ORC sink."""
        from pyarrow import orc

        from datax_ray.cli import run_job

        src = str(tmp_path / "src.parquet")
        pq.write_table(
            pa.table({"k": pa.array(range(100), pa.int64()),
                      "v": pa.array([f"r{i}" for i in range(100)])}),
            src,
        )
        out = str(tmp_path / "out")
        spec = {"job": {"content": {
            "reader": {"name": "duckdb", "parameter": {
                "sql": ["SELECT k, v FROM t WHERE k % 2 = 0",
                        "SELECT k, v FROM t WHERE k % 2 = 1"],
                "views": {"t": src}}},
            "writer": {"name": "orc", "parameter": {
                "path": out, "writeMode": "truncate"}},
        }}}
        rep = run_job(spec)
        assert rep["ok"] and rep["result"]["rows"] == 100
        files = [f for f in os.listdir(out) if f.endswith(".orc")]
        assert len(files) >= 2  # one part per slice
        back = pa.concat_tables(
            [orc.read_table(os.path.join(out, f)) for f in files]
        ).sort_by("k")
        assert back.column("k").to_pylist() == list(range(100))

    def test_orc_roundtrip_values(self, tmp_path):
        from datax_ray.sinks.orcsink import list_output_files, write_orc
        from datax_ray.sources.files import read_orc

        import ray.data as rd

        t = pa.table({
            "a": pa.array(np.arange(1000, dtype=np.int64)),
            "b": pa.array(np.linspace(0, 1, 1000)),
            "s": pa.array([f"x{i}" for i in range(1000)]),
        })
        out = str(tmp_path / "orc")
        write_orc(rd.from_arrow(t).repartition(4), out, write_mode="truncate")
        back = read_orc(list_output_files(out)).to_pandas().sort_values("a")
        assert back["a"].tolist() == list(range(1000))
        assert back["s"].tolist() == [f"x{i}" for i in range(1000)]

    def test_orc_write_modes(self, tmp_path):
        import ray.data as rd

        from datax_ray.sinks.csvsink import WriteModeError
        from datax_ray.sinks.orcsink import write_orc

        t = pa.table({"a": [1, 2]})
        out = str(tmp_path / "orc")
        write_orc(rd.from_arrow(t), out, write_mode="truncate")
        with pytest.raises(WriteModeError):
            write_orc(rd.from_arrow(t), out, write_mode="nonConflict")
        write_orc(rd.from_arrow(t), out, write_mode="append")

    def test_duckdb_reader_rejects_bad_view_name(self):
        from datax_ray.sources.duckdbsource import _run_slice

        with pytest.raises(ValueError, match="invalid view name"):
            _run_slice("SELECT 1", {"bad-name; DROP": "/tmp/x.parquet"})


# ----------------------------------------------------------- time travel
@pytest.mark.usefixtures("ray_session")
class TestTimeTravel:
    def _lake(self, tmp_path, n=4000, epochs=4, compact_every=0):
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        spec = ChangelogSpec(n_events=n, n_convs=60, max_turns=8,
                             n_blocks=2, seed=23)
        cl = str(tmp_path / "cl")
        write_changelog_parquet(spec, cl)
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=n,
                     num_partitions=4, epoch_size=n // epochs,
                     compact_every=compact_every)
        return cl, lake

    def test_snapshot_equals_prefix_replay(self, tmp_path):
        """State as of epoch e must equal a fresh replay of only the
        epochs ≤ e."""
        import duckdb

        from datax_ray.sinks.lake import read_lake_table

        cl, lake = self._lake(tmp_path)
        for epoch, hi in ((0, 1000), (1, 2000), (2, 3000)):
            got = read_lake_table(lake, as_of_epoch=epoch).to_pandas()
            exp = duckdb.connect().execute(f"""
                SELECT conv_id, turn_idx, role, text, tool, ts, lsn FROM (
                  SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn
                  FROM read_parquet('{cl}/*.parquet') WHERE lsn < {hi})
                WHERE rn = 1 AND op <> 'D'
                ORDER BY conv_id, turn_idx
            """).df()
            got = got[exp.columns.tolist()].reset_index(drop=True)
            got["ts"] = got["ts"].astype("datetime64[us]")
            assert got.equals(exp), f"epoch {epoch} snapshot mismatch"

    def test_full_read_unchanged(self, tmp_path):
        from datax_ray.sinks.lake import read_lake_table

        _, lake = self._lake(tmp_path)
        cur = read_lake_table(lake)
        asof_last = read_lake_table(lake, as_of_epoch=3)
        assert cur.equals(asof_last)

    def test_compacted_history_raises(self, tmp_path):
        from datax_ray.sinks.lake import read_lake_table

        _, lake = self._lake(tmp_path, compact_every=2)
        with pytest.raises(ValueError, match="compacted"):
            read_lake_table(lake, as_of_epoch=0)

    def test_lake_reader_in_job_spec(self, tmp_path):
        from datax_ray.cli import run_job

        _, lake = self._lake(tmp_path)
        out = str(tmp_path / "snap")
        spec = {"job": {"content": {
            "reader": {"name": "lake", "parameter": {
                "path": lake, "asOfEpoch": 1}},
            "writer": {"name": "parquet", "parameter": {
                "path": out, "writeMode": "truncate"}},
        }}}
        rep = run_job(spec)
        assert rep["ok"]
        assert pq.read_table(out).num_rows > 0


# ------------------------------------------ config path DSL + ${params}
class TestConfigDsl:
    def test_path_get(self):
        from datax_ray.config import path_get

        spec = {"job": {"content": {"transformer": [
            {"name": "dx_substr"}, {"name": "dx_pad"}]}}}
        assert path_get(spec, "job.content.transformer[1].name") == "dx_pad"
        assert path_get(spec, "job.content.transformer[5].name", "x") == "x"
        assert path_get(spec, "job.missing.deep", 42) == 42

    def test_path_set_creates_intermediates(self):
        from datax_ray.config import path_get, path_set

        spec = {}
        path_set(spec, "job.setting.speed.record", 1000)
        path_set(spec, "job.content.transformer[1].name", "dx_pad")
        assert spec["job"]["setting"]["speed"]["record"] == 1000
        assert spec["job"]["content"]["transformer"][1]["name"] == "dx_pad"
        assert path_get(spec, "job.content.transformer[0]") == {}

    def test_substitute_params(self):
        from datax_ray.config import substitute_params

        raw = '{"path": "/data/${bizdate}/in", "n": ${n}}'
        out = substitute_params(raw, {"bizdate": "20260817", "n": "5"})
        assert out == '{"path": "/data/20260817/in", "n": 5}'

    def test_substitute_missing_left_literal(self):
        # reference contract (StrUtil.replaceVariable): unfilled ${...}
        # stays literal — a ${...} occurrence in DATA must not kill the job
        from datax_ray.config import substitute_params

        with pytest.warns(UserWarning, match="bizdate"):
            out = substitute_params('{"p": "${bizdate}"}', {})
        assert out == '{"p": "${bizdate}"}'
        with pytest.raises(KeyError, match="bizdate"):
            substitute_params('{"p": "${bizdate}"}', {}, strict=True)

    def test_cli_param_dry_run(self, tmp_path):
        import json
        import subprocess
        import sys

        src = tmp_path / "in.parquet"
        pq.write_table(pa.table({"a": [1, 2]}), str(src))
        job = tmp_path / "job.json"
        job.write_text(json.dumps({"job": {"content": {
            "reader": {"name": "parquet", "parameter": {"path": "${src}"}},
            "writer": {"name": "stdout", "parameter": {}},
        }}}).replace('"${src}"', '"${src}"'))
        p = subprocess.run(
            [sys.executable, "-m", "datax_ray.cli", str(job), "--dry-run",
             "-p", f"src={src}"],
            capture_output=True, text=True,
        )
        assert p.returncode == 0, p.stderr
        assert json.loads(p.stdout.strip().splitlines()[-1])["ok"]


# -------------------------------------------------------------- sampling
@pytest.mark.usefixtures("ray_session")
class TestSampling:
    def test_hash_sample_fast_deterministic_and_sized(self):
        import ray.data as rd

        from datax_ray.ops.sample import hash_sample

        t = pa.table({"k": pa.array(np.arange(20_000, dtype=np.int64))})
        ds = rd.from_arrow(t).repartition(4)
        a = hash_sample(ds, key_col="k", fraction=0.2).to_pandas()
        b = hash_sample(ds, key_col="k", fraction=0.2).to_pandas()
        assert a["k"].tolist() == b["k"].tolist()  # repeatable
        assert 0.17 < len(a) / 20_000 < 0.23       # ≈ fraction
        # subset property: a smaller fraction is a subset of a larger one
        small = set(hash_sample(ds, key_col="k", fraction=0.05)
                    .to_pandas()["k"])
        assert small <= set(a["k"])

    def test_hash_sample_md5_matches_duckdb(self):
        import duckdb
        import ray.data as rd

        from datax_ray.ops.sample import hash_sample, md5_sample_sql_predicate

        t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))})
        got = hash_sample(rd.from_arrow(t), key_col="k", fraction=0.1,
                          mode="md5").to_pandas()["k"].tolist()
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        exp = con.execute(
            "SELECT k FROM t WHERE "
            + md5_sample_sql_predicate("k", 0.1) + " ORDER BY k"
        ).df()["k"].tolist()
        assert sorted(got) == exp

    def test_reservoir_sample_exact_k_and_uniformish(self):
        import ray.data as rd

        from datax_ray.ops.sample import reservoir_sample

        t = pa.table({"k": pa.array(np.arange(10_000, dtype=np.int64))})
        ds = rd.from_arrow(t).repartition(8)
        s1 = reservoir_sample(ds, k=100, seed=1)
        assert s1.num_rows == 100
        assert len(set(s1["k"].to_pylist())) == 100
        # deterministic per seed; different seeds differ
        s1b = reservoir_sample(ds, k=100, seed=1)
        s2 = reservoir_sample(ds, k=100, seed=2)
        assert s1["k"].to_pylist() == s1b["k"].to_pylist()
        assert s1["k"].to_pylist() != s2["k"].to_pylist()
        # coverage across the whole range, not one block
        vals = np.array(s1["k"].to_pylist())
        assert vals.min() < 2000 and vals.max() > 8000

    def test_reservoir_k_larger_than_input(self):
        import ray.data as rd

        from datax_ray.ops.sample import reservoir_sample

        t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        s = reservoir_sample(rd.from_arrow(t), k=10)
        assert sorted(s["k"].to_pylist()) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestStratifiedSample:
    def test_caps_per_key_and_deterministic(self):
        import ray.data as rd

        from datax_ray.ops.sample import stratified_sample

        rng = np.random.default_rng(7)
        n = 20_000
        t = pa.table({
            "key": pa.array(rng.integers(0, 200, n).astype(np.int64)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        })
        ds = rd.from_arrow(t).repartition(8)
        a = stratified_sample(ds, key_col="key", id_col="id", k=5).to_pandas()
        b = stratified_sample(ds, key_col="key", id_col="id", k=5).to_pandas()
        assert sorted(a["id"]) == sorted(b["id"])      # deterministic
        per_key = a.groupby("key").size()
        assert per_key.max() <= 5
        assert len(per_key) == 200                     # every key kept
        # keys with ≥5 rows are capped at exactly 5
        full = t.to_pandas().groupby("key").size()
        for key in full[full >= 5].index[:20]:
            assert per_key[key] == 5

    def test_md5_mode_matches_duckdb(self):
        import duckdb
        import ray.data as rd

        from datax_ray.ops.sample import stratified_sample

        rng = np.random.default_rng(8)
        t = pa.table({
            "key": pa.array(rng.integers(0, 50, 2000).astype(np.int64)),
            "id": pa.array(np.arange(2000, dtype=np.int64)),
        })
        got = stratified_sample(rd.from_arrow(t).repartition(4),
                                key_col="key", id_col="id", k=2,
                                mode="md5").to_pandas()
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        exp = con.execute("""
            SELECT key, id FROM (
              SELECT key, id, row_number() OVER (PARTITION BY key
                ORDER BY md5(CAST(key AS VARCHAR) || '|' ||
                             CAST(id AS VARCHAR)), id) rn
              FROM t) WHERE rn <= 2 ORDER BY key, id
        """).df()
        got = got.sort_values(["key", "id"]).reset_index(drop=True)
        assert got.equals(exp)
