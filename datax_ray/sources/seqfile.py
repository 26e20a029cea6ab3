"""Pure-Python Hadoop SequenceFile reader/writer (no JVM needed).

The reference reads SEQ files by iterating (key, Text value) pairs and
shipping each non-blank value string through the CSV line parser
(hdfsreader/.../DFSUtil.java:214-242 ``sequenceFileStartRead``: key is
IGNORED, value.toString() becomes one txtfilereader-style line). This
module implements the SequenceFile container itself from the published
format (the SequenceFile.java javadoc format spec, stable since
version 6):

    header:  "SEQ" + version(1B)
             keyClassName, valueClassName          (VInt len + UTF-8)
             compression(1B bool), blockCompression(1B bool)
             [codecClassName if compressed]        (VInt len + UTF-8)
             metadata: int32-BE count, then count x (Text key, Text val)
             sync: 16 bytes
    record (uncompressed / record-compressed):
             recordLen(int32 BE), keyLen(int32 BE), key bytes, value
             bytes [value codec-compressed in record mode]; a sync
             escape (recordLen == -1) is followed by the 16-byte sync
    block (block-compressed), each block preceded by escape + sync:
             noRecords(VInt), then 4 sections each as
             (VInt compressedSize + bytes): key-lengths, keys,
             value-lengths, values; lengths sections are VInt streams

Codecs supported: none, ``org.apache.hadoop.io.compress.DefaultCodec``
(zlib) and ``GzipCodec`` (gzip) — both decodable with Python ``zlib``.
``Text`` and ``BytesWritable`` key/value classes are understood; other
Writables surface raw bytes. Honesty note: there is no JVM in this
sandbox, so conformance is pinned by byte-exact golden fixtures written
from the published spec (tests/test_seqfile.py), not by Hadoop itself.
"""

from __future__ import annotations

import io
import os
import struct
import zlib

SEQ_MAGIC = b"SEQ"
SYNC_ESCAPE = 0xFFFFFFFF  # int32 -1 as unsigned
TEXT_CLASS = "org.apache.hadoop.io.Text"
BYTES_CLASS = "org.apache.hadoop.io.BytesWritable"
NULL_CLASS = "org.apache.hadoop.io.NullWritable"
LONG_CLASS = "org.apache.hadoop.io.LongWritable"
DEFAULT_CODEC = "org.apache.hadoop.io.compress.DefaultCodec"
GZIP_CODEC = "org.apache.hadoop.io.compress.GzipCodec"


# ------------------------------------------------------------------ VInt
def write_vint(i: int) -> bytes:
    """Hadoop WritableUtils.writeVLong zero-compressed encoding."""
    if -112 <= i <= 127:
        return struct.pack("b", i)
    length = -112
    if i < 0:
        i ^= -1  # take one's complement
        length = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        length -= 1
    n = -(length + 120) if length < -120 else -(length + 112)
    out = [struct.pack("b", length)]
    for idx in range(n - 1, -1, -1):
        out.append(bytes([(i >> (8 * idx)) & 0xFF]))
    return b"".join(out)


def read_vint(f) -> int:
    b = f.read(1)
    if not b:
        raise EOFError
    first = struct.unpack("b", b)[0]
    if first >= -112:
        return first
    negative = first < -120
    n = -(first + 120) if negative else -(first + 112)
    val = 0
    for byte in f.read(n):
        val = (val << 8) | byte
    return val ^ -1 if negative else val


def _write_hstring(s: str) -> bytes:
    b = s.encode("utf-8")
    return write_vint(len(b)) + b


def _read_hstring(f) -> str:
    return f.read(read_vint(f)).decode("utf-8")


# ---------------------------------------------------------------- codecs
def _decompressor(codec: str | None):
    if codec is None:
        return lambda b: b
    if codec == DEFAULT_CODEC:
        return zlib.decompress
    if codec == GZIP_CODEC:
        return lambda b: zlib.decompress(b, wbits=31)
    raise ValueError(f"unsupported SequenceFile codec: {codec}")


def _compressor(codec: str | None):
    if codec is None:
        return lambda b: b
    if codec == DEFAULT_CODEC:
        return zlib.compress
    if codec == GZIP_CODEC:
        return _gzip
    raise ValueError(f"unsupported SequenceFile codec: {codec}")


def _gzip(b: bytes) -> bytes:
    co = zlib.compressobj(wbits=31)
    return co.compress(b) + co.flush()


def _strip_writable(blob: bytes, cls: str) -> bytes:
    """Undo the Writable framing inside a key/value blob."""
    if cls == TEXT_CLASS:
        f = io.BytesIO(blob)
        n = read_vint(f)
        return f.read(n)
    if cls == BYTES_CLASS:  # int32-BE length prefix
        (n,) = struct.unpack(">i", blob[:4])
        return blob[4 : 4 + n]
    return blob  # unknown Writable: raw bytes


def _frame_writable(data: bytes, cls: str) -> bytes:
    if cls == TEXT_CLASS:
        return write_vint(len(data)) + data
    if cls == BYTES_CLASS:
        return struct.pack(">i", len(data)) + data
    return data


# ---------------------------------------------------------------- reader
class SequenceFileReader:
    """Iterates (key_bytes, value_bytes) with Writable framing stripped."""

    def __init__(self, path_or_file):
        self._own = isinstance(path_or_file, (str, os.PathLike))
        self.f = open(path_or_file, "rb") if self._own else path_or_file
        magic = self.f.read(3)
        if magic != SEQ_MAGIC:
            raise ValueError(f"not a SequenceFile (magic {magic!r})")
        self.version = self.f.read(1)[0]
        if self.version < 5:
            raise ValueError(f"SequenceFile version {self.version} < 5 unsupported")
        self.key_class = _read_hstring(self.f)
        self.value_class = _read_hstring(self.f)
        self.compressed = self.f.read(1) != b"\x00"
        self.block_compressed = self.f.read(1) != b"\x00"
        self.codec = _read_hstring(self.f) if self.compressed else None
        self._decomp = _decompressor(self.codec)
        self.metadata = {}
        if self.version >= 6:  # VERSION_WITH_METADATA; v5 has no section
            (n_meta,) = struct.unpack(">i", self.f.read(4))
            for _ in range(n_meta):
                k = _read_hstring(self.f)
                self.metadata[k] = _read_hstring(self.f)
        self.sync = self.f.read(16)

    def __iter__(self):
        return self._iter_blocks() if self.block_compressed else self._iter_records()

    def _expect_sync(self):
        sync = self.f.read(16)
        if sync != self.sync:
            raise ValueError("SequenceFile sync marker mismatch (corrupt file)")

    def _iter_records(self):
        while True:
            head = self.f.read(4)
            if len(head) < 4:
                return
            (rec_len,) = struct.unpack(">I", head)
            if rec_len == SYNC_ESCAPE:
                self._expect_sync()
                continue
            (key_len,) = struct.unpack(">i", self.f.read(4))
            key = self.f.read(key_len)
            val = self.f.read(rec_len - key_len)
            if self.compressed:
                val = self._decomp(val)
            yield (_strip_writable(key, self.key_class),
                   _strip_writable(val, self.value_class))

    def _iter_blocks(self):
        while True:
            head = self.f.read(4)
            if len(head) < 4:
                return
            (esc,) = struct.unpack(">I", head)
            if esc != SYNC_ESCAPE:
                raise ValueError("block-compressed SequenceFile: expected sync escape")
            self._expect_sync()
            try:
                n_records = read_vint(self.f)
            except EOFError:
                return
            sections = []
            for _ in range(4):  # key-lens, keys, val-lens, vals
                size = read_vint(self.f)
                sections.append(self._decomp(self.f.read(size)))
            key_lens = _read_vint_stream(sections[0], n_records)
            val_lens = _read_vint_stream(sections[2], n_records)
            koff = voff = 0
            for kl, vl in zip(key_lens, val_lens):
                key = sections[1][koff : koff + kl]
                val = sections[3][voff : voff + vl]
                koff += kl
                voff += vl
                yield (_strip_writable(key, self.key_class),
                       _strip_writable(val, self.value_class))

    def close(self):
        if self._own:
            self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _read_vint_stream(buf: bytes, n: int) -> list[int]:
    f = io.BytesIO(buf)
    return [read_vint(f) for _ in range(n)]


# ---------------------------------------------------------------- writer
class SequenceFileWriter:
    """Writes version-6 SequenceFiles: uncompressed, record-compressed,
    or block-compressed with DefaultCodec/GzipCodec. Deterministic sync
    marker derived from a seed so outputs are byte-stable for tests and
    resumable re-runs."""

    SYNC_INTERVAL = 2000  # bytes between sync markers, as in Hadoop

    def __init__(self, path_or_file, *, key_class: str = TEXT_CLASS,
                 value_class: str = TEXT_CLASS, codec: str | None = None,
                 block: bool = False, block_records: int = 1000,
                 metadata: dict[str, str] | None = None, sync_seed: int = 0):
        if block and codec is None:
            codec = DEFAULT_CODEC  # Hadoop: BLOCK implies a codec
        self._own = isinstance(path_or_file, (str, os.PathLike))
        self.f = open(path_or_file, "wb") if self._own else path_or_file
        self.key_class, self.value_class = key_class, value_class
        self.codec, self.block = codec, block
        self.block_records = block_records
        self._comp = _compressor(codec)
        import hashlib

        self.sync = hashlib.md5(f"seqsync-{sync_seed}".encode()).digest()
        f = self.f
        f.write(SEQ_MAGIC + bytes([6]))
        f.write(_write_hstring(key_class))
        f.write(_write_hstring(value_class))
        f.write(b"\x01" if codec else b"\x00")
        f.write(b"\x01" if block else b"\x00")
        if codec:
            f.write(_write_hstring(codec))
        meta = metadata or {}
        f.write(struct.pack(">i", len(meta)))
        for k, v in meta.items():
            f.write(_write_hstring(k) + _write_hstring(v))
        f.write(self.sync)
        self._since_sync = 0
        self._pending: list[tuple[bytes, bytes]] = []

    def append(self, key: bytes, value: bytes):
        key = _frame_writable(key, self.key_class)
        value = _frame_writable(value, self.value_class)
        if self.block:
            self._pending.append((key, value))
            if len(self._pending) >= self.block_records:
                self._flush_block()
            return
        if self._since_sync >= self.SYNC_INTERVAL:
            self.f.write(struct.pack(">I", SYNC_ESCAPE) + self.sync)
            self._since_sync = 0
        if self.codec:
            value = self._comp(value)
        rec = struct.pack(">ii", len(key) + len(value), len(key)) + key + value
        self.f.write(rec)
        self._since_sync += len(rec)

    def _flush_block(self):
        if not self._pending:
            return
        keys = b"".join(k for k, _ in self._pending)
        vals = b"".join(v for _, v in self._pending)
        key_lens = b"".join(write_vint(len(k)) for k, _ in self._pending)
        val_lens = b"".join(write_vint(len(v)) for _, v in self._pending)
        f = self.f
        f.write(struct.pack(">I", SYNC_ESCAPE) + self.sync)
        f.write(write_vint(len(self._pending)))
        for section in (key_lens, keys, val_lens, vals):
            blob = self._comp(section)
            f.write(write_vint(len(blob)) + blob)
        self._pending = []

    def close(self):
        if self.block:
            self._flush_block()
        if self._own:
            self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ------------------------------------------------------- Dataset surface
def read_seq_csv(
    paths,
    *,
    columns=None,
    field_delimiter: str = ",",
    null_format: str | None = None,
    dead_letter_dir: str | None = None,
    encoding: str = "utf-8",
    path_regex: str | None = None,
):
    """hdfsreader fileType=SEQ: every Text VALUE is one txtfilereader
    line (key ignored, blank values skipped — DFSUtil.java:227-231);
    lines parse and project exactly like read_csv. One Ray task per
    file: SequenceFiles are not splittable without scanning for sync
    markers, matching the reference's one-reader-per-file contract."""
    import pyarrow as pa
    import ray.data as rd
    from pyarrow import csv as pacsv

    from datax_ray.sources.csvsource import (
        DEFAULT_NULL_FORMAT, ColumnEntry, CsvProjection)
    from datax_ray.sources.files import list_files

    files = list_files(paths, path_regex=path_regex)
    if not files:
        raise FileNotFoundError(f"SEQ path matched no files: {paths}")
    entries = None
    if columns is not None:
        entries = [c if isinstance(c, ColumnEntry) else ColumnEntry(**c)
                   for c in columns]

    # column count from the first non-blank value of the first file
    ncols = 1
    with SequenceFileReader(files[0]) as r:
        for _, v in r:
            line = v.decode(encoding)
            if line.strip():
                ncols = len(line.split(field_delimiter))
                break
    col_names = [f"f{i}" for i in range(ncols)]
    read_opts = pacsv.ReadOptions(autogenerate_column_names=True,
                                  encoding=encoding)
    parse_opts = pacsv.ParseOptions(delimiter=field_delimiter)
    conv_opts = pacsv.ConvertOptions(
        strings_can_be_null=False, null_values=[],
        quoted_strings_can_be_null=False,
        column_types={c: pa.string() for c in col_names},
    )

    def parse_seq(t: pa.Table) -> pa.Table:
        from datax_ray.sources.files import open_input

        tabs = []
        for path in t["path"].to_pylist():
            with open_input(path) as fh:
                with SequenceFileReader(fh) as r:
                    # join values into one CSV stream; skip blank values
                    body = b"\n".join(v for _, v in r if v.strip())
            if body:
                tabs.append(pacsv.read_csv(
                    io.BytesIO(body + b"\n"), read_options=read_opts,
                    parse_options=parse_opts, convert_options=conv_opts))
        if not tabs:
            return pa.schema([(c, pa.string()) for c in col_names]).empty_table()
        return pa.concat_tables(tabs)

    ds = rd.from_items([{"path": str(p)} for p in files]).map_batches(
        parse_seq, batch_format="pyarrow", batch_size=1)
    proj = CsvProjection(entries, null_format=null_format or DEFAULT_NULL_FORMAT,
                         dead_letter_dir=dead_letter_dir)
    return ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def write_seq_csv(ds, path: str, *, write_mode: str = "append",
                  prefix: str = "part", field_delimiter: str = ",",
                  null_format: str | None = None, codec: str | None = None,
                  block: bool = False, encoding: str = "utf-8") -> list[dict]:
    """Write a Dataset as SEQ files of Text(key=NullWritable-ish empty,
    value=CSV line) — the symmetric sink for read_seq_csv.

    Line-orientation caveat (inherent to the reference's SEQ semantics,
    DFSUtil.java:227-231): a cell with an embedded newline serializes as
    a CSV-quoted multi-line value and lands as MULTIPLE SEQ records;
    read_seq_csv re-joins values with newlines before parsing, so such
    rows round-trip through OUR reader, but a plain line-at-a-time SEQ
    consumer (like the reference) sees split lines — and an all-blank
    interior line of such a field would be dropped by the blank filter."""
    import uuid

    import pyarrow as pa

    from datax_ray.sinks.csvsink import (
        DEFAULT_NULL_FORMAT, CsvBlockWriter, prepare_dir)

    prepare_dir(path, write_mode, prefix)
    ser = CsvBlockWriter(path, prefix=prefix, field_delimiter=field_delimiter,
                         null_format=null_format or DEFAULT_NULL_FORMAT,
                         header=False, encoding=encoding)

    def write_block(batch: pa.Table) -> pa.Table:
        data = ser._serialize(batch)
        name = f"{prefix}__{uuid.uuid4().hex}.seq"
        tmp = os.path.join(path, f".tmp.{name}")
        final = os.path.join(path, name)
        with SequenceFileWriter(tmp, key_class=TEXT_CLASS,
                                value_class=TEXT_CLASS, codec=codec,
                                block=block) as w:
            for line in data.splitlines():
                w.append(b"", line)
        os.replace(tmp, final)
        return pa.table({"file": [final], "rows": [batch.num_rows]})

    return ds.map_batches(write_block, batch_format="pyarrow").take_all()
