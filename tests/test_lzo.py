"""LZO1X codec: roundtrips, hand-derived instruction vectors for the
decode paths our encoder never emits (M2 matches, state-1..3 and
state-4 short matches), framings, and CSV reader/writer integration
(UnstructuredStorageReaderUtil.java:124-133 lzo / lzo_deflate)."""

import random

import pyarrow as pa
import pytest

from datax_ray.sources.lzo_codec import (
    LzoError,
    decode_lzo_block_stream,
    decode_lzop,
    encode_lzo_block_stream,
    encode_lzop,
    lzo1x_compress,
    lzo1x_decompress,
)

EOS = b"\x11\x00\x00"


class TestLzo1x:
    def test_roundtrip_shapes(self):
        random.seed(7)
        cases = [
            b"", b"a", b"ab", b"abc", b"abcd",
            b"hello world " * 500,
            bytes(random.randrange(256) for _ in range(5000)),
            b"\x00" * 70000,                      # overlapping / RLE copies
            bytes(random.choice(b"ab") for _ in range(20000)),
            ("x" * 239),                           # > first-byte max literals
        ]
        for d in cases:
            d = d if isinstance(d, bytes) else d.encode()
            assert lzo1x_decompress(lzo1x_compress(d)) == d

    # ---- hand-derived vectors: instruction classes the encoder skips ----

    def test_m2_short_match(self):
        # 4 leading literals (first-byte 17+4), M2 len-4 dist-4 match:
        # t = 64 | 1<<5 | (dist-1)<<2 = 108, h = 0
        s = bytes([21]) + b"abcd" + bytes([108, 0]) + EOS
        assert lzo1x_decompress(s) == b"abcdabcd"

    def test_m2_long_form(self):
        # 5 literals, M2 len-5 dist-5: t = 128 | (5-5)<<5 | (5-1)<<2 = 144
        s = bytes([22]) + b"abcde" + bytes([144, 0]) + EOS
        assert lzo1x_decompress(s) == b"abcdeabcde"

    def test_state1_two_byte_match(self):
        # first-byte 18 → 1 literal, state=1; then opcode 0x00 with h=0:
        # copy 2 bytes from distance 1
        s = bytes([18]) + b"A" + bytes([0, 0]) + EOS
        assert lzo1x_decompress(s) == b"AAA"

    def test_state4_three_byte_match(self):
        # extended literal run of 2052 (state 4), then opcode 0x00 h=0:
        # copy 3 bytes from distance 2049
        n = 2052
        rem = n - 18
        run = bytes([0]) + b"\x00" * ((rem - 1) // 255) + bytes(
            [(rem - 1) % 255 + 1])
        s = run + b"X" * n + bytes([0, 0]) + EOS
        assert lzo1x_decompress(s) == b"X" * (n + 3)

    def test_bad_distance_rejected(self):
        # match before any output
        with pytest.raises(LzoError):
            lzo1x_decompress(bytes([108, 0]) + EOS)

    def test_truncation_rejected(self):
        good = lzo1x_compress(b"hello world " * 100)
        with pytest.raises(LzoError):
            lzo1x_decompress(good[:-4])

    def test_framings(self):
        data = ("line,%d\n" * 3000 % tuple(range(3000))).encode()
        assert decode_lzo_block_stream(encode_lzo_block_stream(data)) == data
        assert decode_lzop(encode_lzop(data)) == data
        # multi-block
        assert decode_lzop(encode_lzop(data, block_size=1024)) == data
        assert decode_lzo_block_stream(
            encode_lzo_block_stream(data, block_size=1024)) == data

    def test_lzop_checksum_detects_corruption(self):
        blob = bytearray(encode_lzop(b"y" * 10000))
        blob[-20] ^= 0xFF
        with pytest.raises(LzoError):
            decode_lzop(bytes(blob))

    def test_lzop_bad_magic(self):
        with pytest.raises(LzoError):
            decode_lzop(b"not an lzop file")


class TestLzoCsv:
    COLS = [
        {"index": 0, "type": "long", "name": "id"},
        {"index": 1, "type": "string", "name": "who"},
    ]

    @pytest.mark.parametrize("compress,ext", [("lzo", ".csv.lzo"),
                                              ("lzo_deflate", ".csv.lzo_deflate")])
    def test_read_named_variant(self, tmp_path, compress, ext, ray_session):
        from datax_ray.sources.csvsource import read_csv

        body = "".join(f"{i},user{i}\n" for i in range(500)).encode()
        enc = encode_lzop if compress == "lzo" else encode_lzo_block_stream
        p = str(tmp_path / f"t{ext}")
        with open(p, "wb") as f:
            f.write(enc(body))
        df = (read_csv(p, columns=self.COLS, compress=compress)
              .to_pandas().sort_values("id").reset_index(drop=True))
        assert len(df) == 500 and df["who"][499] == "user499"

    @pytest.mark.parametrize("compress", ["lzo", "lzo_deflate"])
    def test_write_read_roundtrip(self, tmp_path, compress, ray_session):
        import ray.data as rd

        from datax_ray.sinks.csvsink import list_output_files, write_csv
        from datax_ray.sources.csvsource import read_csv

        src = pa.table({"id": list(range(80)),
                        "who": [f"u{i}" for i in range(80)]})
        out = str(tmp_path / "out")
        write_csv(rd.from_arrow(src), out, write_mode="truncate",
                  compress=compress)
        files = list_output_files(out)
        assert files and all(".lzo" in f for f in files)
        back = (read_csv(files, columns=self.COLS)
                .to_pandas().sort_values("id").reset_index(drop=True))
        assert back["id"].tolist() == list(range(80))
        assert back["who"].tolist() == [f"u{i}" for i in range(80)]
