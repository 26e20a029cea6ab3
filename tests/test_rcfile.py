"""Pure-Python RCFile container (sources/rcfile.py): golden bytes pinned
from the published Hive layout, cell-length RLE, roundtrips, the legacy
SEQ-magic header, and the reference's rows-of-strings read semantics
(DFSUtil.java:244-291)."""

import io
import struct
import zlib

import pytest

from datax_ray.sources.rcfile import (
    COLUMN_NUMBER_KEY,
    LEGACY_KEY_CLASS,
    LEGACY_VALUE_CLASS,
    RCFileReader,
    RCFileWriter,
    _read_lengths_rle,
    _write_lengths_rle,
    read_rc_csv,
    write_rc,
)
from datax_ray.sources.seqfile import DEFAULT_CODEC, GZIP_CODEC, write_vint


class TestLengthsRLE:
    @pytest.mark.parametrize("lengths", [
        [], [5], [5, 5, 5], [1, 2, 3], [4, 4, 9, 9, 9, 2], [0, 0, 0, 7],
    ])
    def test_roundtrip(self, lengths):
        buf = _write_lengths_rle(lengths)
        assert _read_lengths_rle(buf, len(lengths)) == lengths

    def test_run_is_encoded_compactly(self):
        # 100 equal lengths must encode as 2 VInts, not 100
        buf = _write_lengths_rle([7] * 100)
        assert buf == write_vint(7) + write_vint(~99)


def golden_rc_bytes() -> bytes:
    """A 1-group, 2-column, 2-row uncompressed RCFile built BY HAND from
    the published layout — independent of RCFileWriter."""
    sync = bytes(range(16))
    meta_key = COLUMN_NUMBER_KEY.encode()
    out = [b"RCF\x01", b"\x00",                       # v1, uncompressed
           struct.pack(">i", 1),                       # one metadata pair
           write_vint(len(meta_key)), meta_key,
           write_vint(1), b"2",                        # ncols = 2
           sync]
    # columns: c0 cells b"1", b"2"; c1 cells b"alice", b"bob"
    c0, c1 = b"12", b"alicebob"
    key = (write_vint(2)                               # numberRows
           + write_vint(len(c0)) + write_vint(len(c0))
           + write_vint(len(_write_lengths_rle([1, 1])))
           + _write_lengths_rle([1, 1])
           + write_vint(len(c1)) + write_vint(len(c1))
           + write_vint(len(_write_lengths_rle([5, 3])))
           + _write_lengths_rle([5, 3]))
    out.append(struct.pack(">I", 0xFFFFFFFF) + sync)   # sync escape
    out.append(struct.pack(">iii", len(key) + len(c0) + len(c1),
                           len(key), len(key)))
    out.append(key + c0 + c1)
    return b"".join(out)


class TestGolden:
    def test_read_hand_built_file(self, tmp_path):
        p = tmp_path / "g.rc"
        p.write_bytes(golden_rc_bytes())
        with RCFileReader(str(p)) as r:
            assert r.version == 1 and not r.compressed
            assert r.n_columns == 2
            rows = list(r)
        assert rows == [(b"1", b"alice"), (b"2", b"bob")]

    def test_writer_layout_matches_spec(self, tmp_path):
        """Writer output parsed with raw struct ops (no RCFileReader)."""
        p = tmp_path / "w.rc"
        with RCFileWriter(str(p), 2) as w:
            w.append([b"1", b"alice"])
            w.append([b"2", b"bob"])
        raw = p.read_bytes()
        assert raw[:5] == b"RCF\x01\x00"
        f = io.BytesIO(raw[5:])
        from datax_ray.sources.seqfile import read_vint
        (n_meta,) = struct.unpack(">i", f.read(4))
        meta = {f.read(read_vint(f)).decode(): f.read(read_vint(f)).decode()
                for _ in range(n_meta)}
        assert meta[COLUMN_NUMBER_KEY] == "2"
        sync = f.read(16)
        (esc,) = struct.unpack(">I", f.read(4))
        assert esc == 0xFFFFFFFF and f.read(16) == sync
        rec_len, key_len, ckey_len = struct.unpack(">iii", f.read(12))
        assert key_len == ckey_len                     # uncompressed
        kf = io.BytesIO(f.read(ckey_len))
        assert read_vint(kf) == 2                      # rows
        # col 0: sizes 2/2, lengths [1,1] → RLE 0x01 0xFE(~1)
        assert (read_vint(kf), read_vint(kf)) == (2, 2)
        assert kf.read(read_vint(kf)) == write_vint(1) + write_vint(~1)
        # col 1: sizes 8/8, lengths [5,3]
        assert (read_vint(kf), read_vint(kf)) == (8, 8)
        assert kf.read(read_vint(kf)) == write_vint(5) + write_vint(3)
        assert f.read(2) == b"12" and f.read(8) == b"alicebob"
        assert f.read() == b""

    def test_compressed_sections_are_zlib(self, tmp_path):
        p = tmp_path / "c.rc"
        with RCFileWriter(str(p), 1, codec=DEFAULT_CODEC) as w:
            w.append([b"payload-payload-payload"])
        raw = p.read_bytes()
        f = io.BytesIO(raw[5:])
        from datax_ray.sources.seqfile import read_vint
        assert f.read(read_vint(f)).decode() == DEFAULT_CODEC
        (n_meta,) = struct.unpack(">i", f.read(4))
        for _ in range(n_meta):
            f.read(read_vint(f)); f.read(read_vint(f))
        f.read(16); f.read(20)                         # sync, escape+sync
        rec_len, key_len, ckey_len = struct.unpack(">iii", f.read(12))
        key = zlib.decompress(f.read(ckey_len))
        assert len(key) == key_len
        kf = io.BytesIO(key)
        assert read_vint(kf) == 1
        disk = read_vint(kf)
        assert read_vint(kf) == 23                     # uncompressed size
        assert zlib.decompress(f.read(disk)) == b"payload-payload-payload"

    def test_legacy_seq_header_accepted(self, tmp_path):
        sync = bytes(range(16))
        out = [b"SEQ\x06",
               write_vint(len(LEGACY_KEY_CLASS)), LEGACY_KEY_CLASS.encode(),
               write_vint(len(LEGACY_VALUE_CLASS)), LEGACY_VALUE_CLASS.encode(),
               b"\x00", b"\x00",                      # uncompressed, !block
               struct.pack(">i", 1),
               write_vint(len(COLUMN_NUMBER_KEY)), COLUMN_NUMBER_KEY.encode(),
               write_vint(1), b"1", sync]
        cells = b"xy"
        key = (write_vint(2) + write_vint(2) + write_vint(2)
               + write_vint(len(_write_lengths_rle([1, 1])))
               + _write_lengths_rle([1, 1]))
        out.append(struct.pack(">I", 0xFFFFFFFF) + sync)
        out.append(struct.pack(">iii", len(key) + 2, len(key), len(key)))
        out.append(b"".join([key, cells]))
        p = tmp_path / "legacy.rc"
        p.write_bytes(b"".join(out))
        with RCFileReader(str(p)) as r:
            assert list(r) == [(b"x",), (b"y",)]

    def test_corrupt_sync_detected(self, tmp_path):
        raw = bytearray(golden_rc_bytes())
        idx = raw.find(struct.pack(">I", 0xFFFFFFFF))
        raw[idx + 5] ^= 0xFF                           # flip a sync byte
        p = tmp_path / "bad.rc"
        p.write_bytes(bytes(raw))
        with RCFileReader(str(p)) as r:
            with pytest.raises(ValueError, match="sync marker mismatch"):
                list(r)


class TestRoundtrip:
    @pytest.mark.parametrize("kw", [
        dict(codec=None),
        dict(codec=DEFAULT_CODEC),
        dict(codec=GZIP_CODEC),
        dict(codec=DEFAULT_CODEC, group_rows=7),       # multi row-group
    ])
    def test_roundtrip(self, tmp_path, kw):
        rows = [(str(i).encode(), f"name{i % 3}".encode(),
                 b"z" * (i % 5)) for i in range(30)]
        p = tmp_path / "t.rc"
        with RCFileWriter(str(p), 3, **kw) as w:
            for row in rows:
                w.append(row)
        with RCFileReader(str(p)) as r:
            assert list(r) == rows

    def test_width_mismatch_rejected(self, tmp_path):
        with RCFileWriter(str(tmp_path / "x.rc"), 2) as w:
            with pytest.raises(ValueError, match="cells"):
                w.append([b"only-one"])
            w.append([b"a", b"b"])


@pytest.mark.usefixtures("ray_session")
class TestRcCsvDataset:
    def test_gbk_cells_roundtrip(self, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        src = pa.table({"id": [1, 2], "who": ["中文测试", "编码"]})
        out = str(tmp_path / "gbkrc")
        write_rc(rd.from_arrow(src), out, write_mode="truncate",
                 encoding="gbk")
        df = read_rc_csv(out + "/*.rc", encoding="gbk").to_pandas()
        assert sorted(df["f1"].tolist()) == sorted(["中文测试", "编码"])

    def test_write_read_roundtrip_typed(self, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        src = pa.table({
            "id": [1, 2, 3],
            "who": ["alice", None, "carol"],
            "flag": [True, False, True],
        })
        out = str(tmp_path / "rcdir")
        report = write_rc(rd.from_arrow(src), out, write_mode="truncate")
        assert sum(r["rows"] for r in report) == 3
        ds = read_rc_csv(out + "/*.rc", columns=[
            {"index": 0, "type": "long"},
            {"index": 1, "type": "string"},
            {"index": 2, "type": "boolean"},
        ])
        df = ds.to_pandas().sort_values("col0").reset_index(drop=True)
        assert df["col0"].tolist() == [1, 2, 3]
        assert df["col1"][1] is None
        assert df["col2"].tolist() == [True, False, True]
