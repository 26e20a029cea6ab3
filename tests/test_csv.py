"""CSV round-trip (FIXTURES.md F4): typed projection, constants, nullFormat,
skipHeader, gzip, date parse, dirty routing + error budget; writer modes."""

import glob
import gzip
import os

import pyarrow as pa
import pytest

from datax_ray.sinks.csvsink import (
    WriteModeError,
    list_output_files,
    prepare_dir,
    write_csv,
)
from datax_ray.sources.csvsource import ColumnEntry, CsvProjection, read_csv
from datax_ray.transforms import ErrorLimit, ErrorLimitExceeded
from datax_ray.transforms.chain import read_dead_letters

CSV_BODY = "\n".join(
    [
        "1,alice,3.5,true,2024-01-02 03:04:05",
        "2,\\N,1.25,false,2024-02-03 04:05:06",
        "notanint,bob,2.0,true,2024-03-04 05:06:07",   # dirty: long cast
        "4,carol,2.5,true,notadate",                   # dirty: date cast
        "5,dave,0.5,false,2024-05-06 07:08:09",
    ]
)

COLUMNS = [
    {"index": 0, "type": "long", "name": "id"},
    {"index": 1, "type": "string", "name": "who"},
    {"index": 2, "type": "double", "name": "score"},
    {"index": 3, "type": "boolean", "name": "flag"},
    {"index": 4, "type": "date", "format": "yyyy-MM-dd HH:mm:ss", "name": "at"},
    {"value": "fixed", "type": "string", "name": "constcol"},
]


class TestProjectionKernel:
    def test_typed_projection_and_dirty(self, tmp_path):
        dl = str(tmp_path / "dl")
        t = pa.table({f"f{i}": col for i, col in enumerate(
            zip(*[r.split(",") for r in CSV_BODY.split("\n")])
        )})
        proj = CsvProjection(
            [ColumnEntry(**c) for c in COLUMNS], dead_letter_dir=dl
        )
        out = proj(t)
        assert out.column_names == ["id", "who", "score", "flag", "at", "constcol"]
        assert out["id"].to_pylist() == [1, 2, 5]
        assert out["who"].to_pylist() == ["alice", None, "dave"]  # nullFormat
        assert out["constcol"].to_pylist() == ["fixed"] * 3
        assert out.schema.field("at").type == pa.timestamp("ms")
        dead = read_dead_letters(dl)
        assert dead.num_rows == 2
        with pytest.raises(ErrorLimitExceeded):
            ErrorLimit(record=1).check(dead.num_rows, t.num_rows)

    def test_index_out_of_bounds_all_dirty(self):
        t = pa.table({"f0": ["a", "b"]})
        out = CsvProjection([ColumnEntry(type="string", index=5)])(t)
        assert out.num_rows == 0

    def test_long_truncates_like_bigdecimal(self):
        t = pa.table({"f0": ["2.9", "-3.7", "1e3"]})
        out = CsvProjection([ColumnEntry(type="long", index=0, name="v")])(t)
        assert out["v"].to_pylist() == [2, -3, 1000]


@pytest.mark.usefixtures("ray_session")
class TestReadWrite:
    def test_read_csv_typed(self, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text(CSV_BODY + "\n")
        ds = read_csv(str(p), columns=COLUMNS, dead_letter_dir=str(tmp_path / "dl"))
        df = ds.to_pandas().sort_values("id")
        assert list(df["id"]) == [1, 2, 5]

    def test_read_csv_gzip_and_header(self, tmp_path):
        p = tmp_path / "in.csv.gz"
        body = "id,who\n1,alice\n2,\\N\n"
        with gzip.open(p, "wt") as f:
            f.write(body)
        ds = read_csv(str(p), skip_header=True)
        df = ds.to_pandas()
        assert list(df.columns) == ["id", "who"]
        assert df["who"].tolist()[1] is None

    def test_encoding_gbk_roundtrip(self, tmp_path, ray_session):
        # encoding per UnstructuredStorageReaderUtil.java:95-100 (GBK is
        # the common non-default); write GBK, verify raw bytes, read back
        import ray.data as rd

        src = pa.table({"id": [1, 2], "who": ["中文测试", "编码"]})
        out = str(tmp_path / "out")
        write_csv(rd.from_arrow(src), out, write_mode="truncate",
                  encoding="gbk")
        files = list_output_files(out, "part")
        raw = open(os.path.join(out, files[0]), "rb").read()
        assert "中文测试".encode("gbk") in raw
        df = read_csv(os.path.join(out, "*.csv"), encoding="gbk").to_pandas()
        assert sorted(df["f1"].tolist()) == sorted(["中文测试", "编码"])
        # gzip + gbk compose
        write_csv(rd.from_arrow(src), out, write_mode="truncate",
                  encoding="gbk", compress="gzip")
        df = read_csv(os.path.join(out, "*.csv.gz"),
                      encoding="gbk").to_pandas()
        assert sorted(df["f1"].tolist()) == sorted(["中文测试", "编码"])

    def test_read_csv_glob_and_dir(self, tmp_path):
        # TxtFileReader.java path entries may be globs or directories
        for i in range(3):
            (tmp_path / f"part{i}.csv").write_text(f"{i},row{i}\n")
        (tmp_path / "other.txt").write_text("9,nope\n")
        df = read_csv(str(tmp_path / "*.csv")).to_pandas()
        assert sorted(df["f0"].tolist()) == ["0", "1", "2"]
        d = tmp_path / "sub"
        d.mkdir()
        (d / "a.csv").write_text("7,seven\n")
        assert read_csv(str(d)).to_pandas()["f1"].tolist() == ["seven"]
        with pytest.raises(FileNotFoundError):
            read_csv(str(tmp_path / "nope-*.csv"))

    def test_roundtrip_with_quoting_and_newlines(self, tmp_path):
        import ray.data as rd

        src = pa.table(
            {
                "a": ["plain", 'has "quotes"', "has,comma", "multi\nline", None],
                "n": pa.array([1, 2, 3, 4, 5], pa.int64()),
            }
        )
        out_dir = str(tmp_path / "out")
        write_csv(rd.from_arrow(src), out_dir, write_mode="truncate", header=False)
        files = list_output_files(out_dir)
        assert files and all("__" in os.path.basename(f) for f in files)
        back = read_csv(
            files,
            columns=[
                {"index": 0, "type": "string", "name": "a"},
                {"index": 1, "type": "long", "name": "n"},
            ],
        )
        df = back.to_pandas().sort_values("n").reset_index(drop=True)
        want = src.to_pandas()
        assert df["a"].tolist() == want["a"].tolist()

    def test_write_modes(self, tmp_path):
        d = str(tmp_path / "w")
        os.makedirs(d)
        open(os.path.join(d, "part__old.csv"), "w").write("x\n")
        with pytest.raises(WriteModeError):
            prepare_dir(d, "nonConflict", "part")
        prepare_dir(d, "append", "part")
        assert os.path.exists(os.path.join(d, "part__old.csv"))
        prepare_dir(d, "truncate", "part")
        assert not glob.glob(os.path.join(d, "part__*"))
        with pytest.raises(WriteModeError):
            prepare_dir(d, "bogus", "part")

    def test_transcripts_roundtrip(self, tmp_path):
        """F4: the lake table itself round-trips through CSV with embedded
        newlines/quotes/commas in text (CsvWriterImpl strict quoting)."""
        import ray.data as rd

        from datax_ray.sources.generators import TranscriptSpec, generate_transcripts_block

        spec = TranscriptSpec(n_convs=40, turns_per_conv=6, n_blocks=2, seed=3)
        src = pa.concat_tables(
            [generate_transcripts_block(spec, b) for b in range(spec.n_blocks)]
        )
        out_dir = str(tmp_path / "csv")
        write_csv(rd.from_arrow(src), out_dir, write_mode="truncate")
        back = read_csv(
            list_output_files(out_dir),
            columns=[
                {"index": 0, "type": "string", "name": "conv_id"},
                {"index": 1, "type": "long", "name": "turn_idx"},
                {"index": 2, "type": "string", "name": "role"},
                {"index": 3, "type": "string", "name": "text"},
                {"index": 4, "type": "string", "name": "tool"},
                {"index": 5, "type": "date", "format": "yyyy-MM-dd HH:mm:ss", "name": "ts"},
            ],
        )
        got = pa.Table.from_pandas(back.to_pandas(), preserve_index=False).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        # per-turn text equality under stable ordering — the invariant
        assert got["text"].to_pylist() == src.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )["text"].to_pylist()


class TestCodecs:
    """Snappy framings (UnstructuredStorageReaderUtil.java:144-154:
    hadoop-snappy / framing-snappy) + modern zstd/lz4, read and write."""

    BODY = "\n".join(f"{i},name{i},{i}.5,true,2024-01-02 03:04:0{i % 10}"
                     for i in range(200))

    COLS = [
        {"index": 0, "type": "long", "name": "id"},
        {"index": 1, "type": "string", "name": "who"},
    ]

    def test_snappy_framings_pure(self):
        from datax_ray.sources import snappy_codec as sc

        data = self.BODY.encode() * 7  # > one 64 KiB framed chunk
        for enc, dec in ((sc.encode_framing_snappy, sc.decode_framing_snappy),
                         (sc.encode_hadoop_snappy, sc.decode_hadoop_snappy)):
            blob = enc(data)
            assert dec(blob) == data
            assert sc.decode_snappy_auto(blob) == data
        assert sc.decode_framing_snappy(
            sc.encode_framing_snappy(b"")) == b""
        assert sc.decode_hadoop_snappy(sc.encode_hadoop_snappy(b"")) == b""
        # known-answer CRC32C vector (RFC 3720 test pattern)
        assert sc.crc32c(b"123456789") == 0xE3069283
        # a flipped CRC byte must be detected
        blob = bytearray(sc.encode_framing_snappy(b"x" * 1000))
        blob[15] ^= 0x01
        with pytest.raises(ValueError):
            sc.decode_framing_snappy(bytes(blob))

    @pytest.mark.parametrize("compress", ["framing-snappy", "hadoop-snappy"])
    def test_snappy_read_named_variant(self, tmp_path, compress, ray_session):
        from datax_ray.sources import snappy_codec as sc

        enc = (sc.encode_framing_snappy if compress == "framing-snappy"
               else sc.encode_hadoop_snappy)
        p = str(tmp_path / "t.csv.snappy")
        with open(p, "wb") as f:
            f.write(enc(self.BODY.encode()))
        ds = read_csv(p, columns=self.COLS, compress=compress)
        df = ds.to_pandas().sort_values("id").reset_index(drop=True)
        assert len(df) == 200 and df["who"][7] == "name7"

    @pytest.mark.parametrize("compress", ["zstd", "lz4", "framing-snappy",
                                          "hadoop-snappy"])
    def test_write_read_roundtrip(self, tmp_path, compress, ray_session):
        import ray.data as rd

        src = pa.table({"id": list(range(50)),
                        "who": [f"u{i}" for i in range(50)]})
        out = str(tmp_path / "out")
        report = write_csv(rd.from_arrow(src), out, write_mode="truncate",
                           compress=compress)
        files = list_output_files(out)
        assert files and all(
            f.endswith((".zst", ".lz4", ".snappy")) for f in files)
        back = read_csv(files, columns=[
            {"index": 0, "type": "long", "name": "id"},
            {"index": 1, "type": "string", "name": "who"},
        ]).to_pandas().sort_values("id").reset_index(drop=True)
        assert back["id"].tolist() == list(range(50))
        assert back["who"].tolist() == [f"u{i}" for i in range(50)]

    def test_mixed_snappy_plain_rejected(self, tmp_path):
        plain = str(tmp_path / "a.csv")
        snap = str(tmp_path / "b.csv.snappy")
        for p in (plain, snap):
            with open(p, "wb") as f:
                f.write(b"1,x\n")
        with pytest.raises(ValueError, match="cannot mix"):
            read_csv([plain, snap], columns=self.COLS)
