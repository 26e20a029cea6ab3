"""Tests: framework utils (retry, token bucket, range split, path filter),
extra file readers (ORC, jsonl, binary), and the lake bootstrap + tail."""

import os
import time

import numpy as np
import pyarrow as pa
import pytest

from datax_ray.util import (
    TokenBucket,
    filter_paths,
    retry_call,
    split_ascii_range,
    split_range,
)


class TestUtils:
    def test_retry_succeeds_after_failures(self):
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise ValueError("boom")
            return "ok"

        assert retry_call(flaky, retries=5, sleep_s=0.001) == "ok"
        assert len(calls) == 3

    def test_retry_exhausts(self):
        with pytest.raises(ZeroDivisionError):
            retry_call(lambda: 1 / 0, retries=2, sleep_s=0.001,
                       retry_on=(ZeroDivisionError,))

    def test_token_bucket_throttles(self):
        tb = TokenBucket(rate=1000, burst=10)
        t0 = time.monotonic()
        for _ in range(5):
            tb.acquire(10)
        # 50 units at 1000/s with burst 10 → ≥ ~40ms of waiting
        assert time.monotonic() - t0 >= 0.03

    def test_split_range(self):
        assert split_range(0, 9, 2) == [(0, 4), (5, 9)]
        assert split_range(0, 9, 3) == [(0, 3), (4, 6), (7, 9)]
        assert split_range(5, 5, 4) == [(5, 5)]
        chunks = split_range(0, 10**12, 7)
        assert chunks[0][0] == 0 and chunks[-1][1] == 10**12
        assert all(a <= b for a, b in chunks)

    def test_split_ascii_range(self):
        bounds = split_ascii_range("a", "z", 4)
        assert bounds[0] == "a" and bounds[-1] == "z"
        assert bounds == sorted(bounds)
        assert len(bounds) == 5

    def test_filter_paths(self):
        ps = ["/d/pt=1/a.csv", "/d/pt=2/b.csv", "/d/other/c.csv"]
        assert filter_paths(ps, r"pt=\d") == ps[:2]
        assert filter_paths(ps, None) == ps


@pytest.mark.usefixtures("ray_session")
class TestExtraReaders:
    def test_read_orc_roundtrip(self, tmp_path):
        from pyarrow import orc

        from datax_ray.sources.files import read_orc

        t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        f1, f2 = str(tmp_path / "p1.orc"), str(tmp_path / "p2.orc")
        orc.write_table(t, f1)
        orc.write_table(t, f2)
        ds = read_orc(str(tmp_path), columns=["a"])
        df = ds.to_pandas()
        assert len(df) == 6 and list(df.columns) == ["a"]

    def test_read_binary_media(self, tmp_path):
        from datax_ray.sources.files import read_binary_media

        (tmp_path / "x.bin").write_bytes(b"\x01\x02\x03")
        (tmp_path / "y.bin").write_bytes(b"\x04")
        ds = read_binary_media(str(tmp_path), mime="image/fake")
        df = ds.to_pandas().sort_values("media_path")
        assert len(df) == 2
        assert df["payload"].iloc[0] == b"\x01\x02\x03"
        assert set(df["mime"]) == {"image/fake"}

    def test_path_regex_filter(self, tmp_path):
        from datax_ray.sources.files import list_files

        (tmp_path / "pt=1").mkdir()
        (tmp_path / "pt=2").mkdir()
        (tmp_path / "pt=1" / "a.txt").write_text("x")
        (tmp_path / "pt=2" / "b.txt").write_text("y")
        files = list_files(str(tmp_path), path_regex=r"pt=1")
        assert len(files) == 1 and "pt=1" in files[0]


@pytest.mark.usefixtures("ray_session")
class TestBootstrap:
    def test_bootstrap_then_tail(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from datax_ray.cdc.bootstrap import bootstrap_lake
        from datax_ray.cdc.replay import replay_files
        from datax_ray.sinks.lake import read_lake_table
        from datax_ray.sources.generators import (
            ChangelogSpec,
            TranscriptSpec,
            generate_transcripts_block,
            write_changelog_parquet,
        )

        tspec = TranscriptSpec(n_convs=80, turns_per_conv=6, n_blocks=2, seed=41)
        base_dir = tmp_path / "base"
        base_dir.mkdir()
        for b in range(tspec.n_blocks):
            pq.write_table(
                generate_transcripts_block(tspec, b),
                str(base_dir / f"part-{b}.parquet"),
            )
        cspec = ChangelogSpec(n_events=5000, n_convs=80, max_turns=6,
                              n_blocks=2, seed=43,
                              step_ms=1000)
        cl = write_changelog_parquet(cspec, str(tmp_path / "cl"))

        lake = str(tmp_path / "lake")
        m = bootstrap_lake(str(base_dir), lake, num_partitions=4)
        assert sum(1 for p in range(4) if m.partition_files(p)) > 0
        base_only = read_lake_table(lake)
        assert base_only.num_rows == tspec.n_convs * tspec.turns_per_conv

        replay_files(cl, lake_dir=lake, max_lsn_exclusive=cspec.n_events,
                     num_partitions=4, epoch_size=2500)

        got = read_lake_table(lake).select(
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        # oracle: base rows as (op=I, lsn=-1) unioned with the changelog
        from tests.test_replay import all_events

        base_tabs = [generate_transcripts_block(tspec, b) for b in range(2)]
        base_t = pa.concat_tables(base_tabs)
        base_ev = base_t.add_column(0, "op", pa.array(["I"] * base_t.num_rows))
        base_ev = base_ev.add_column(
            0, "lsn", pa.array(np.full(base_t.num_rows, -1, np.int64))
        )
        con = duckdb.connect()
        con.register("base_ev", base_ev)
        con.register("cl_ev", all_events(cspec))
        want = con.execute("""
            WITH ev AS (SELECT * FROM base_ev UNION ALL SELECT * FROM cl_ev)
            SELECT conv_id, turn_idx, role, text, tool, ts FROM (
              SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                 ORDER BY ts DESC, lsn DESC) rn FROM ev)
            WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx
        """).fetch_arrow_table()
        con.close()
        assert got.num_rows == want.num_rows
        assert got.cast(want.schema).equals(want)


class TestFsspecPassthrough:
    """scheme:// URIs route through fsspec (the ftp/oss reader spirit);
    exercised with the in-process memory:// filesystem."""

    def _seed_memfs(self):
        import fsspec

        fs = fsspec.filesystem("memory")
        fs.makedirs("/inbox", exist_ok=True)
        with fs.open("/inbox/a.jsonl", "wb") as f:
            f.write(b'{"x": 1}\n{"x": 2}\n')
        with fs.open("/inbox/b.jsonl", "wb") as f:
            f.write(b'{"x": 3}\n')
        with fs.open("/inbox/skip.txt", "wb") as f:
            f.write(b"nope\n")
        return fs

    def test_list_files_memory_uri(self):
        from datax_ray.sources.files import list_files

        self._seed_memfs()
        got = list_files("memory://inbox/*.jsonl")
        assert got == ["memory://inbox/a.jsonl", "memory://inbox/b.jsonl"]
        # dir listing + regex filter
        got = list_files("memory://inbox", path_regex=r"\.jsonl$")
        assert got == ["memory://inbox/a.jsonl", "memory://inbox/b.jsonl"]

    def test_open_input_memory_uri(self):
        from datax_ray.sources.files import open_input

        self._seed_memfs()
        with open_input("memory://inbox/b.jsonl") as f:
            assert f.read() == b'{"x": 3}\n'

    def test_ray_fs_wrapper_for_non_arrow_scheme(self):
        """memory:// gets an fsspec-backed pyarrow filesystem + stripped
        paths (the FS object itself is per-process, so the distributed
        read is exercised over file:// below)."""
        from pyarrow.fs import PyFileSystem

        from datax_ray.sources.files import _ray_fs_paths, list_files

        self._seed_memfs()
        fs, paths = _ray_fs_paths(list_files("memory://inbox/*.jsonl"))
        assert isinstance(fs, PyFileSystem)
        assert paths == ["/inbox/a.jsonl", "/inbox/b.jsonl"]
        with fs.open_input_stream(paths[1]) as f:
            assert f.read() == b'{"x": 3}\n'

    def test_read_jsonl_file_uri(self, ray_session, tmp_path):
        """Arrow-native scheme URIs pass straight through to Ray Data."""
        from datax_ray.sources.files import read_jsonl

        (tmp_path / "a.jsonl").write_text('{"x": 1}\n{"x": 2}\n')
        (tmp_path / "b.jsonl").write_text('{"x": 3}\n')
        ds = read_jsonl(f"file://{tmp_path}/*.jsonl")
        assert sorted(r["x"] for r in ds.take_all()) == [1, 2, 3]
