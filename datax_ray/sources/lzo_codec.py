"""Pure-Python LZO1X codec + the two LZO framings the reference reader
dispatches on (UnstructuredStorageReaderUtil.java:124-133): ``lzo`` =
the lzop container (ExpandLzopInputStream) and ``lzo_deflate`` = the
raw block stream (LzoInputStream: [BE4 ulen][BE4 clen][block] repeated).

No LZO library exists in this sandbox (liblzo is GPL C), so the block
codec itself is implemented from the publicly documented LZO1X
instruction set (Linux ``Documentation/staging/lzo.rst``; the same
spec lzop and lzo-java implement):

* ``lzo1x_decompress`` handles the FULL instruction set — literal runs,
  M2/M3/M4 matches, state-dependent short matches, length extensions,
  the first-byte special, and the 0x11 0x00 0x00 end-of-stream marker —
  so it can decode streams produced by any conformant compressor, not
  just ours.
* ``lzo1x_compress`` is a greedy hash-table matcher that emits only
  M3/M4 matches (length ≥ 3) and standalone/SS literal runs — a strict
  subset of the format, decodable by liblzo et al.; it favours
  simplicity and obvious correctness over ratio.

Both are per-byte Python loops: this is a FORMAT-COMPATIBILITY path for
exotic legacy inputs (the reference kept lzo for the same reason), not
a throughput path — hot pipelines use zstd/parquet. Decode cost is
paid once per file at read time, never per record.
"""

from __future__ import annotations

import struct
import zlib


class LzoError(ValueError):
    pass


# ------------------------------------------------------------ LZO1X core


def lzo1x_decompress(src: bytes) -> bytes:
    """Decode one raw LZO1X block (full instruction set)."""
    out = bytearray()
    ip = 0
    n = len(src)

    def need(k: int) -> None:
        if ip + k > n:
            raise LzoError("truncated LZO1X stream")

    def ext_length(base: int) -> int:
        # length extension: run of 0x00 bytes (255 each) + final nonzero
        nonlocal ip
        total = base
        while True:
            need(1)
            b = src[ip]
            ip += 1
            if b == 0:
                total += 255
            else:
                return total + b

    def copy_match(distance: int, length: int) -> None:
        if distance < 1 or distance > len(out):
            raise LzoError(f"bad match distance {distance} at output "
                           f"offset {len(out)}")
        start = len(out) - distance
        if distance >= length:
            out.extend(out[start:start + length])
        else:  # overlapping copy — byte-at-a-time RLE semantics
            for i in range(length):
                out.append(out[start + i])

    state = 0
    if n == 0:
        raise LzoError("empty LZO1X stream")
    # first-byte special: > 17 means (byte - 17) leading literals
    if src[0] > 17:
        t = src[0] - 17
        ip = 1
        need(t)
        out += src[ip:ip + t]
        ip += t
        state = 4 if t >= 4 else t

    while True:
        need(1)
        t = src[ip]
        ip += 1
        if t < 16:
            if state == 0:
                # literal run
                length = (t + 3) if t else ext_length(3 + 15)
                need(length)
                out += src[ip:ip + length]
                ip += length
                state = 4
                continue
            if state == 4:
                # short match 3 bytes, far-ish distance
                need(1)
                h = src[ip]
                ip += 1
                dist = (h << 2) + (t >> 2) + 2049
                copy_match(dist, 3)
            else:
                # state 1..3: short match 2 bytes, near distance
                need(1)
                h = src[ip]
                ip += 1
                dist = (h << 2) + (t >> 2) + 1
                copy_match(dist, 2)
            s = t & 3
        elif t < 32:
            # M4: long-distance match
            length = (2 + (t & 7)) if (t & 7) else ext_length(2 + 7)
            need(2)
            le = src[ip] | (src[ip + 1] << 8)
            ip += 2
            dist = 16384 + ((t & 8) << 11) + (le >> 2)
            if dist == 16384:
                if length != 3:
                    raise LzoError("bad end-of-stream marker")
                break  # EOS
            copy_match(dist, length)
            s = le & 3
        elif t < 64:
            # M3
            length = (2 + (t & 31)) if (t & 31) else ext_length(2 + 31)
            need(2)
            le = src[ip] | (src[ip + 1] << 8)
            ip += 2
            copy_match(1 + (le >> 2), length)
            s = le & 3
        else:
            # M2: 64..127 → 3-4 bytes, 128..255 → 5-8 bytes
            if t < 128:
                length = 3 + ((t >> 5) & 1)
            else:
                length = 5 + ((t >> 5) & 3)
            need(1)
            h = src[ip]
            ip += 1
            copy_match((h << 3) + ((t >> 2) & 7) + 1, length)
            s = t & 3
        # trailing literals encoded in the instruction's SS bits
        if s:
            need(s)
            out += src[ip:ip + s]
            ip += s
        state = s
    return bytes(out)


_EOS = b"\x11\x00\x00"
_MAX_M3_DIST = 16384
_MAX_M4_DIST = 49151
_MIN_MATCH = 3


def _emit_literal_run(parts: list[bytes], lits: bytes, at_start: bool) -> None:
    """Standalone literal run (requires decoder state 0, guaranteed by the
    caller emitting SS=0 on the preceding match / stream start)."""
    n = len(lits)
    if n == 0:
        return
    if at_start and n <= 238:
        parts.append(bytes([17 + n]))
    elif n <= 3:
        raise AssertionError("short runs must ride the SS bits")
    elif n <= 18:
        parts.append(bytes([n - 3]))
    else:
        rem = n - 3 - 15
        parts.append(b"\x00" + b"\x00" * ((rem - 1) // 255)
                     + bytes([(rem - 1) % 255 + 1]))
    parts.append(lits)


def _emit_match(parts: list[bytes], dist: int, length: int, ss: int) -> None:
    if dist <= _MAX_M3_DIST:
        le = ((dist - 1) << 2) | ss
        if length - 2 <= 31:
            parts.append(bytes([32 | (length - 2)]))
        else:
            rem = length - 2 - 31
            parts.append(b"\x20" + b"\x00" * ((rem - 1) // 255)
                         + bytes([(rem - 1) % 255 + 1]))
        parts.append(struct.pack("<H", le))
    else:
        d = dist - 16384
        le = ((d & 0x3FFF) << 2) | ss
        hi = (d >> 11) & 8
        if length - 2 <= 7:
            parts.append(bytes([16 | hi | (length - 2)]))
        else:
            rem = length - 2 - 7
            parts.append(bytes([16 | hi]) + b"\x00" * ((rem - 1) // 255)
                         + bytes([(rem - 1) % 255 + 1]))
        parts.append(struct.pack("<H", le))


def lzo1x_compress(data: bytes) -> bytes:
    """Greedy LZO1X compressor: 4-byte-hash last-match table, M3/M4
    matches only (min length 3, max distance 49151), literal runs of
    1..3 on the previous match's SS bits, longer runs standalone."""
    n = len(data)
    parts: list[bytes] = []
    if n == 0:
        return _EOS
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    # index of the SS byte-pair for the previous match (None at start)
    last_le_idx: int | None = None

    def flush_literals(end: int) -> None:
        nonlocal lit_start, last_le_idx
        run = data[lit_start:end]
        if not run:
            return
        if len(run) <= 3 and last_le_idx is not None:
            # ride the previous match's SS bits
            le = bytearray(parts[last_le_idx])
            le[0] |= len(run)
            parts[last_le_idx] = bytes(le)
            parts.append(run)
        else:
            _emit_literal_run(parts, run, at_start=last_le_idx is None
                              and lit_start == 0)
        lit_start = end

    while i < n:
        if i + _MIN_MATCH + 1 <= n:
            key = data[i:i + 4]
            cand = table.get(key)
            table[key] = i
            if cand is not None and i - cand <= _MAX_M4_DIST:
                # extend the match
                length = 4
                max_len = n - i
                while (length < max_len
                       and data[cand + length] == data[i + length]):
                    length += 1
                flush_literals(i)
                _emit_match(parts, i - cand, length, 0)
                last_le_idx = len(parts) - 1
                # seed the table sparsely inside the match (cheap, keeps
                # the loop O(n) instead of O(n·len))
                for j in range(i + 1, min(i + length, n - 4), 7):
                    table[data[j:j + 4]] = j
                i += length
                lit_start = i
                continue
        i += 1
    flush_literals(n)
    parts.append(_EOS)
    return b"".join(parts)


# ------------------------------------------------- lzo_deflate framing


def decode_lzo_block_stream(data: bytes) -> bytes:
    """LzoInputStream framing (lzo-java): repeated
    [BE4 uncompressed len][BE4 compressed len][LZO1X block]; a block
    whose compressed len equals its uncompressed len is stored raw."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 8:
            raise LzoError("truncated lzo_deflate block header")
        ulen, clen = struct.unpack(">II", data[pos:pos + 8])
        pos += 8
        if n - pos < clen:
            raise LzoError("truncated lzo_deflate block body")
        blob = data[pos:pos + clen]
        pos += clen
        chunk = blob if clen == ulen else lzo1x_decompress(blob)
        if len(chunk) != ulen:
            raise LzoError("lzo_deflate block length mismatch")
        out.append(chunk)
    return b"".join(out)


def encode_lzo_block_stream(data: bytes, *, block_size: int = 256 * 1024) -> bytes:
    parts: list[bytes] = []
    for off in range(0, max(len(data), 1), block_size):
        chunk = data[off:off + block_size]
        comp = lzo1x_compress(chunk)
        if len(comp) >= len(chunk):  # store incompressible blocks raw
            comp = chunk
        parts.append(struct.pack(">II", len(chunk), len(comp)))
        parts.append(comp)
    return b"".join(parts)


# --------------------------------------------------------- lzop container

_LZOP_MAGIC = b"\x89LZO\x00\r\n\x1a\n"
_F_ADLER32_D = 0x00000001
_F_ADLER32_C = 0x00000002
_F_CRC32_D = 0x00000100
_F_CRC32_C = 0x00000200
_F_H_FILTER = 0x00000800
_F_H_CRC32 = 0x00001000
_LZOP_VERSION = 0x1030
_LZOP_LIB_VERSION = 0x2080
_LZOP_VERSION_NEEDED = 0x0940


def encode_lzop(data: bytes, *, block_size: int = 256 * 1024) -> bytes:
    """Minimal valid .lzo file: LZO1X-1 method, adler32 data checksums."""
    flags = _F_ADLER32_D
    hdr = struct.pack(">HHHBB", _LZOP_VERSION, _LZOP_LIB_VERSION,
                      _LZOP_VERSION_NEEDED, 1, 5)  # method=LZO1X-1, level 5
    hdr += struct.pack(">I", flags)
    hdr += struct.pack(">III", 0o100644, 0, 0)  # mode, mtime_low, mtime_high
    hdr += b"\x00"  # empty filename
    hdr += struct.pack(">I", zlib.adler32(hdr))
    parts = [_LZOP_MAGIC, hdr]
    for off in range(0, max(len(data), 1), block_size):
        chunk = data[off:off + block_size]
        comp = lzo1x_compress(chunk)
        if len(comp) >= len(chunk):
            comp = chunk
        parts.append(struct.pack(">II", len(chunk), len(comp)))
        parts.append(struct.pack(">I", zlib.adler32(chunk)))
        parts.append(comp)
    parts.append(struct.pack(">I", 0))  # EOF block
    return b"".join(parts)


def decode_lzop(data: bytes, *, verify_checksums: bool = True) -> bytes:
    """Decode a .lzo (lzop container) file — the reference's ``lzo``
    compress mode (ExpandLzopInputStream)."""
    if not data.startswith(_LZOP_MAGIC):
        raise LzoError("not an lzop file (bad magic)")
    pos = len(_LZOP_MAGIC)

    def take(k: int) -> bytes:
        nonlocal pos
        if pos + k > len(data):
            raise LzoError("truncated lzop header")
        b = data[pos:pos + k]
        pos += k
        return b

    hdr_start = pos
    version, = struct.unpack(">H", take(2))
    take(2)  # lib_version
    if version >= 0x0940:
        take(2)  # version_needed_to_extract
    method = take(1)[0]
    if version >= 0x0940:
        take(1)  # level
    flags, = struct.unpack(">I", take(4))
    if flags & _F_H_FILTER:
        take(4)
    take(4)  # mode
    take(4)  # mtime_low
    if version >= 0x0940:
        take(4)  # mtime_high
    name_len = take(1)[0]
    take(name_len)
    hdr_body = data[hdr_start:pos]
    stored_ck, = struct.unpack(">I", take(4))
    if verify_checksums:
        want = (zlib.crc32(hdr_body) if flags & _F_H_CRC32
                else zlib.adler32(hdr_body))
        if stored_ck != want:
            raise LzoError("lzop header checksum mismatch")
    if method not in (1, 2, 3):  # LZO1X-1 / 1(15) / 999
        raise LzoError(f"unsupported lzop method {method}")

    out: list[bytes] = []
    while True:
        ulen, = struct.unpack(">I", take(4))
        if ulen == 0:
            break
        clen, = struct.unpack(">I", take(4))
        d_adler = struct.unpack(">I", take(4))[0] if flags & _F_ADLER32_D else None
        d_crc = struct.unpack(">I", take(4))[0] if flags & _F_CRC32_D else None
        if clen != ulen:  # compressed checksums absent for stored blocks
            if flags & _F_ADLER32_C:
                take(4)
            if flags & _F_CRC32_C:
                take(4)
        blob = take(clen)
        chunk = blob if clen == ulen else lzo1x_decompress(blob)
        if len(chunk) != ulen:
            raise LzoError("lzop block length mismatch")
        if verify_checksums:
            if d_adler is not None and zlib.adler32(chunk) != d_adler:
                raise LzoError("lzop block adler32 mismatch")
            if d_crc is not None and zlib.crc32(chunk) != d_crc:
                raise LzoError("lzop block crc32 mismatch")
        out.append(chunk)
    return b"".join(out)
