"""Snappy stream codecs for CSV files — pure Python framing over
pyarrow's block codec (no python-snappy dependency in the sandbox).

The reference reader dispatches on compress name
(UnstructuredStorageReaderUtil.java:124-154): ``hadoop-snappy`` =
Hadoop's BlockCompressorStream framing around raw snappy blocks,
``framing-snappy`` = the official snappy framing format (sNaPpY magic,
RFC chunks with masked CRC32C). Both framings are byte protocols around
the raw snappy *block* format, which pyarrow exposes as
``pa.Codec("snappy")`` — so the only thing to implement is the framing,
done here exactly once per FILE (not per record); decode output feeds
``pyarrow.csv.read_csv`` unchanged.

Raw snappy blocks self-describe their uncompressed size as a leading
varint32 (the snappy "compressed format" preamble); Arrow's decompress
requires that size explicitly, so ``_raw_uncompressed_len`` parses the
preamble instead of trusting the framing headers (which are then
validated against it).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_FRAMED_MAGIC = b"\xff\x06\x00\x00sNaPpY"
_MAX_FRAME_UNCOMPRESSED = 65536  # framing spec: chunk limit
_HADOOP_BLOCK = 256 * 1024  # BlockCompressorStream default block size


def _codec() -> pa.Codec:
    return pa.Codec("snappy")


def _raw_uncompressed_len(block: bytes) -> tuple[int, int]:
    """Parse the varint32 preamble of a raw snappy block →
    (uncompressed_len, preamble_width)."""
    n = 0
    shift = 0
    for i, b in enumerate(block[:5]):
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i + 1
        shift += 7
    raise ValueError("invalid snappy block: unterminated length varint")


def _decompress_block(block: bytes) -> bytes:
    n, _ = _raw_uncompressed_len(block)
    if n == 0:
        return b""
    return _codec().decompress(block, decompressed_size=n).to_pybytes()


# ---------------------------------------------------------------- CRC32C

_CRC32C_POLY = np.uint32(0x82F63B78)  # Castagnoli, reflected


def _crc32c_table() -> np.ndarray:
    tab = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        tab = np.where(tab & 1, (tab >> 1) ^ _CRC32C_POLY, tab >> 1)
    return tab


_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    """Table-driven CRC32C. Per-byte Python loop — used only on the
    framing-snappy read/write path (≤64 KiB chunks), never in a
    per-record hot loop."""
    crc = 0xFFFFFFFF
    tab = _TABLE
    for b in data:
        crc = int(tab[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- framing-snappy


def decode_framing_snappy(data: bytes, *, verify_crc: bool = True) -> bytes:
    """Official snappy framing format (SnappyFramedInputStream parity)."""
    if not data.startswith(_FRAMED_MAGIC):
        raise ValueError("not a framed snappy stream (missing sNaPpY magic)")
    out: list[bytes] = []
    pos = len(_FRAMED_MAGIC)
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("truncated framed snappy chunk header")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1:pos + 4], "little")
        pos += 4
        if n - pos < clen:
            raise ValueError("truncated framed snappy chunk body")
        body = data[pos:pos + clen]
        pos += clen
        if ctype == 0xFF:  # stream identifier (may legally repeat)
            if body != b"sNaPpY":
                raise ValueError("bad stream identifier chunk")
        elif ctype == 0x00:  # compressed data
            chunk = _decompress_block(body[4:])
            if len(chunk) > _MAX_FRAME_UNCOMPRESSED:
                raise ValueError("framed snappy chunk exceeds 64 KiB limit")
            if verify_crc and _masked_crc(chunk) != struct.unpack(
                    "<I", body[:4])[0]:
                raise ValueError("framed snappy CRC mismatch")
            out.append(chunk)
        elif ctype == 0x01:  # uncompressed data
            chunk = body[4:]
            if verify_crc and _masked_crc(chunk) != struct.unpack(
                    "<I", body[:4])[0]:
                raise ValueError("framed snappy CRC mismatch")
            out.append(chunk)
        elif 0x02 <= ctype <= 0x7F:
            raise ValueError(f"unskippable framed snappy chunk 0x{ctype:02x}")
        # 0x80–0xfe: skippable padding — ignore
    return b"".join(out)


def encode_framing_snappy(data: bytes) -> bytes:
    codec = _codec()
    parts = [_FRAMED_MAGIC]
    for off in range(0, len(data), _MAX_FRAME_UNCOMPRESSED):
        chunk = data[off:off + _MAX_FRAME_UNCOMPRESSED]
        crc = struct.pack("<I", _masked_crc(chunk))
        comp = codec.compress(chunk).to_pybytes()
        if len(comp) < len(chunk):
            body = crc + comp
            parts.append(b"\x00" + len(body).to_bytes(3, "little") + body)
        else:  # spec: store incompressible chunks uncompressed
            body = crc + chunk
            parts.append(b"\x01" + len(body).to_bytes(3, "little") + body)
    return b"".join(parts)


# -------------------------------------------------------- hadoop-snappy


def decode_hadoop_snappy(data: bytes) -> bytes:
    """Hadoop BlockCompressorStream framing: repeated
    [uint32be uncompressed block len][loop of uint32be chunk len + raw
    snappy chunk] until the block is filled, blocks until EOF."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("truncated hadoop-snappy block header")
        want = struct.unpack(">I", data[pos:pos + 4])[0]
        pos += 4
        got = 0
        while got < want:
            if n - pos < 4:
                raise ValueError("truncated hadoop-snappy chunk header")
            clen = struct.unpack(">I", data[pos:pos + 4])[0]
            pos += 4
            if n - pos < clen:
                raise ValueError("truncated hadoop-snappy chunk body")
            chunk = _decompress_block(data[pos:pos + clen])
            pos += clen
            got += len(chunk)
            out.append(chunk)
        if got != want:
            raise ValueError("hadoop-snappy block length mismatch")
    return b"".join(out)


def encode_hadoop_snappy(data: bytes, *, block_size: int = _HADOOP_BLOCK) -> bytes:
    codec = _codec()
    parts: list[bytes] = []
    for off in range(0, len(data), block_size):
        chunk = data[off:off + block_size]
        comp = codec.compress(chunk).to_pybytes()
        parts.append(struct.pack(">I", len(chunk)))
        parts.append(struct.pack(">I", len(comp)))
        parts.append(comp)
    if not data:
        parts.append(struct.pack(">I", 0))
    return b"".join(parts)


# ------------------------------------------------------------ dispatch


def decode_snappy_auto(data: bytes) -> bytes:
    """Decode a ``.snappy`` file whose framing variant is unknown:
    framed magic first, then hadoop framing (strict structural parse),
    then a single raw snappy block. Mirrors how the reference forces the
    user to *name* the variant (Key.COMPRESS) — we keep explicit names
    too, this is only the extension-based fallback."""
    if data.startswith(_FRAMED_MAGIC):
        return decode_framing_snappy(data)
    try:
        return decode_hadoop_snappy(data)
    except (ValueError, pa.ArrowInvalid, OSError):
        pass
    return _decompress_block(data)
