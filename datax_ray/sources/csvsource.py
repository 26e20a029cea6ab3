"""CSV / delimited-text source with DataX unstructured-storage semantics.

Re-expresses txtfilereader + plugin-unstructured-storage-util (reference:
txtfilereader/.../TxtFileReader.java — one file per task, path glob;
UnstructuredStorageReaderUtil.java:239-313 CSV loop, :343-492 typed row
build) as: ``ray.data.read_csv`` (Arrow CSV, native gzip) reading every
cell as a raw string, followed by ONE vectorized projection stage that
applies the reference's ``column`` config:

  column: [{"index": 0, "type": "long"},
           {"value": "const", "type": "string"},          # constant column
           {"index": 3, "type": "date", "format": "yyyy-MM-dd HH:mm:ss"}]

with ``nullFormat`` token → null (default ``\\N``, reader Constant.java:10),
``skipHeader``, and DIRTY routing for index-out-of-bounds and cast failures
(UnstructuredStorageReaderUtil.java:476-488) into the same dead-letter
parquet side channel the transform chain uses.

Types: long / double / string / boolean / date / bytes — the reader Type
enum. Java date ``format`` patterns are translated to strptime.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_NULL_FORMAT = "\\N"

_JAVA_TOKENS = [
    ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"), ("SSS", "%f"),
]


def java_date_format_to_strptime(fmt: str) -> str:
    for j, p in _JAVA_TOKENS:
        fmt = fmt.replace(j, p)
    return fmt


@dataclass
class ColumnEntry:
    type: str
    index: int | None = None
    value: str | None = None       # constant column (mutually exclusive w/ index)
    format: str | None = None      # java date format for type=date
    extraFormats: list | None = None  # fallback formats tried in order
    name: str | None = None        # output column name (ours; DataX is positional)

    def __post_init__(self):
        self.type = self.type.lower()
        if self.index is None and self.value is None:
            raise ValueError("column entry needs index or value")
        if self.index is not None and self.value is not None:
            raise ValueError("column entry can't mix index and value")


class CsvProjection:
    """Vectorized typed projection for ``map_batches`` (batch = all-string
    table straight from the CSV read)."""

    def __init__(
        self,
        columns: list[ColumnEntry] | None,
        *,
        null_format: str = DEFAULT_NULL_FORMAT,
        dead_letter_dir: str | None = None,
    ):
        self.columns = columns
        self.null_format = null_format
        self.dead_letter_dir = dead_letter_dir
        if dead_letter_dir:
            os.makedirs(dead_letter_dir, exist_ok=True)

    def _nullify(self, arr: pa.ChunkedArray | pa.Array) -> pa.Array:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.cast(pa.string())
        return pc.if_else(pc.equal(arr, self.null_format), pa.scalar(None, pa.string()), arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        src_cols = batch.column_names
        if not self.columns:
            # no column config: all string columns, nullFormat applied
            out = {name: self._nullify(batch[name]) for name in src_cols}
            return pa.table(out)

        dirty = np.zeros(n, dtype=bool)
        outputs: list[tuple[str, pa.Array]] = []
        for i, ce in enumerate(self.columns):
            name = ce.name or f"col{i}"
            if ce.value is not None:
                raw = pa.array([ce.value] * n, pa.string())
            else:
                if ce.index >= len(src_cols):
                    # whole-file column out of bounds → every row dirty
                    dirty |= True
                    outputs.append((name, pa.nulls(n, pa.string())))
                    continue
                raw = self._nullify(batch[src_cols[ce.index]])
            typed, bad = _cast_typed(raw, ce)
            dirty |= bad
            outputs.append((name, typed))

        out = pa.table(dict(outputs))
        if dirty.any():
            mask = pa.array(~dirty)
            if self.dead_letter_dir:
                import pyarrow.parquet as pq

                bad_rows = batch.filter(pa.array(dirty)).append_column(
                    "_error", pa.array(["csv_cast"] * int(dirty.sum()))
                )
                pq.write_table(
                    bad_rows,
                    os.path.join(self.dead_letter_dir, f"dl-{uuid.uuid4().hex}.parquet"),
                )
            out = out.filter(mask)
        return out


def _cast_typed(raw: pa.Array, ce: ColumnEntry) -> tuple[pa.Array, np.ndarray]:
    """Cast a string array to the configured type; returns (typed, dirty_mask).
    A row is dirty if it was non-null but failed the cast — the coerce-and-
    compare-null-masks trick keeps this fully vectorized."""
    t = ce.type
    was_null = np.asarray(pc.is_null(raw))
    if t == "string":
        return raw, np.zeros(len(raw), dtype=bool)
    if t == "bytes":
        return raw.cast(pa.binary()), np.zeros(len(raw), dtype=bool)
    s = pd.Series(np.asarray(raw), dtype=object)
    if t == "long":
        # LongColumn parses via BigDecimal→BigInteger: "2.5" truncates to 2,
        # scientific notation accepted; unparseable → dirty
        v = pd.to_numeric(s, errors="coerce")
        fv = v.to_numpy(dtype="float64")
        isnan = np.isnan(fv)
        bad = isnan & ~was_null
        vals = np.where(isnan, 0, np.trunc(fv)).astype(np.int64)
        return pa.array(vals, pa.int64(), mask=isnan), bad
    if t == "double":
        v = pd.to_numeric(s, errors="coerce")
        return pa.array(v.to_numpy(dtype="float64"), pa.float64()), (
            v.isna().to_numpy() & ~was_null
        )
    if t in ("boolean", "bool"):
        low = s.str.lower()
        is_true = low == "true"
        is_false = low == "false"
        bad = ~(is_true | is_false) & ~was_null
        vals = np.where(was_null | bad.to_numpy(), None, is_true.to_numpy())
        return pa.array(vals.tolist(), pa.bool_()), bad.to_numpy()
    if t == "date":
        # ColumnCast.java:87-117 format chain: the primary ``format`` is
        # tried first, unparsed rows fall through ``extraFormats`` in order
        # (each retry only on the still-failing rows — stays vectorized)
        fmts = [java_date_format_to_strptime(f)
                for f in ([ce.format] if ce.format else []) + (ce.extraFormats or [])]
        if fmts:
            v = pd.to_datetime(s, format=fmts[0], errors="coerce")
            for f in fmts[1:]:
                miss = v.isna().to_numpy() & ~was_null
                if not miss.any():
                    break
                v[miss] = pd.to_datetime(s[miss], format=f, errors="coerce")
        else:
            v = pd.to_datetime(s, errors="coerce")
        bad = v.isna().to_numpy() & ~was_null
        return pa.Array.from_pandas(v).cast(pa.timestamp("ms"), safe=False), bad
    raise ValueError(f"unsupported column type: {t}")


def _peek_first_line(path: str, delim: str,
                     compress: str | None = None,
                     encoding: str = "utf-8") -> tuple[int, list[str]]:
    """Column count + (possible) header names from the first line; naive
    split is fine for counting (quoted delimiters are rare in headers)."""
    import bz2
    import gzip

    if path.endswith(".zip"):
        import io
        import zipfile

        with zipfile.ZipFile(path) as zf:
            members = [n for n in zf.namelist() if not n.endswith("/")]
            if not members:
                raise ValueError(f"zip archive has no file members: {path}")
            f = io.TextIOWrapper(zf.open(members[0]), encoding=encoding)
            line = f.readline().rstrip("\r\n")
    elif _framed_variant(path, compress):
        with open(path, "rb") as f:
            text = _FRAMED_DECODERS[_framed_variant(path, compress)](f.read())
        line = text.split(b"\n", 1)[0].decode(encoding).rstrip("\r")
    elif path.endswith((".zst", ".lz4")):
        import pyarrow as _pa

        codec = "zstd" if path.endswith(".zst") else "lz4"
        with _pa.CompressedInputStream(_pa.OSFile(path), codec) as f:
            line = f.read().split(b"\n", 1)[0].decode(encoding).rstrip("\r")
    else:
        opener = (gzip.open if path.endswith(".gz")
                  else bz2.open if path.endswith(".bz2") else open)
        with opener(path, "rt", encoding=encoding) as f:
            line = f.readline().rstrip("\r\n")
    fields = line.split(delim)
    return len(fields), fields


def _lazy_framed_decoders() -> dict:
    from datax_ray.sources import lzo_codec as lc
    from datax_ray.sources import snappy_codec as sc

    return {
        "hadoop-snappy": sc.decode_hadoop_snappy,
        "framing-snappy": sc.decode_framing_snappy,
        "snappy": sc.decode_snappy_auto,
        "auto": sc.decode_snappy_auto,
        "lzo": lc.decode_lzop,
        "lzo_deflate": lc.decode_lzo_block_stream,
    }


class _FramedDecoders:
    """Dict-like view over the per-FILE framed codecs, imported lazily."""

    def __getitem__(self, name: str):
        return _lazy_framed_decoders()[name]


_FRAMED_DECODERS = _FramedDecoders()


def _framed_variant(path: str, compress: str | None) -> str | None:
    """The per-file framed codec to decode this path with, or None (i.e.
    an Arrow-streamable codec or plain text). Explicit ``compress`` names
    win (UnstructuredStorageReaderUtil.java:124-154 makes the user name
    the variant: lzo / lzo_deflate / hadoop-snappy / framing-snappy);
    ``.snappy`` extensions fall back to structural auto-detection."""
    if compress and compress.lower() in ("hadoop-snappy", "framing-snappy",
                                         "snappy", "lzo", "lzo_deflate"):
        return compress.lower()
    p = str(path)
    if p.endswith(".snappy"):
        return "auto"
    if p.endswith(".lzo"):
        return "lzo"
    if p.endswith(".lzo_deflate"):
        return "lzo_deflate"
    return None


def read_csv(
    paths: str | list[str],
    *,
    columns: list[dict[str, Any] | ColumnEntry] | None = None,
    field_delimiter: str = ",",
    null_format: str = DEFAULT_NULL_FORMAT,
    skip_header: bool = False,
    dead_letter_dir: str | None = None,
    override_num_blocks: int | None = None,
    compress: str | None = None,
    encoding: str = "utf-8",
):
    """DataX-style CSV read → Dataset with typed schema.

    Compression (UnstructuredStorageReaderUtil.java:88-237, codec
    dispatch :124-154): gzip / bzip2 / zstd / lz4 handled natively by
    Arrow based on file extension; zip archives expand per-task;
    ``hadoop-snappy`` / ``framing-snappy`` (sources/snappy_codec) and
    ``lzo`` (lzop container) / ``lzo_deflate`` (block stream;
    sources/lzo_codec) decode per-file — pass ``compress=`` to name
    the variant, or rely on extension detection (.snappy/.lzo/
    .lzo_deflate).
    """
    from pyarrow import csv as pacsv
    import ray.data as rd

    from datax_ray.sources.files import list_files

    # TxtFileReader.java path semantics: each entry may be a concrete file,
    # a directory, or a glob (`/data/*.csv`); expand up front so peek,
    # codec dispatch and Ray's reader all see concrete files.
    expanded = list_files(paths)
    if not expanded:
        raise FileNotFoundError(f"txtfilereader path matched no files: {paths}")
    paths = expanded

    entries = None
    if columns is not None:
        entries = [c if isinstance(c, ColumnEntry) else ColumnEntry(**c) for c in columns]

    # encoding (UnstructuredStorageReaderUtil.java:95-100, default utf-8;
    # GBK is the common non-default for this reader's users): Arrow
    # transcodes inside the read, so the hot path stays zero-copy utf-8
    read_opts = pacsv.ReadOptions(autogenerate_column_names=not skip_header,
                                  encoding=encoding)
    parse_opts = pacsv.ParseOptions(delimiter=field_delimiter)
    # read EVERYTHING as string; typing is our projection's job (so we can
    # route cast failures per-row instead of failing the read). Arrow needs
    # explicit column_types to suppress inference → peek the first line.
    first = paths[0] if isinstance(paths, list) else paths
    if os.path.isdir(first):
        names = sorted(os.listdir(first))
        first = os.path.join(first, names[0]) if names else first
    ncols, header = _peek_first_line(first, field_delimiter, compress, encoding)
    col_names = header if skip_header else [f"f{i}" for i in range(ncols)]
    conv_opts = pacsv.ConvertOptions(
        strings_can_be_null=False,
        null_values=[],
        quoted_strings_can_be_null=False,
        column_types={c: pa.string() for c in col_names},
    )
    path_list = paths if isinstance(paths, list) else [paths]
    if any(str(p).endswith(".zip") for p in path_list):
        # zip is an ARCHIVE (UnstructuredStorageReaderUtil.java:116-150):
        # read each archive as binary, expand members and parse each as a
        # CSV stream inside the task — one map task per archive
        if not all(str(p).endswith(".zip") for p in path_list):
            raise ValueError("cannot mix .zip archives with plain CSV paths")

        def parse_zip(t: pa.Table) -> pa.Table:
            import io
            import zipfile

            tabs = []
            for blob in t["bytes"].to_pylist():
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for member in zf.namelist():
                        if member.endswith("/"):
                            continue
                        tabs.append(
                            pacsv.read_csv(
                                io.BytesIO(zf.read(member)),
                                read_options=read_opts,
                                parse_options=parse_opts,
                                convert_options=conv_opts,
                            )
                        )
            if not tabs:  # archive of directories only → typed empty
                return pa.schema(
                    [(c, pa.string()) for c in col_names]
                ).empty_table()
            return pa.concat_tables(tabs)

        ds = rd.read_binary_files(path_list).map_batches(
            parse_zip, batch_format="pyarrow"
        )
    elif any(_framed_variant(str(p), compress) for p in path_list):
        # snappy/lzo are framed per FILE (no Arrow stream codec, and
        # Ray's binary reader wants python-snappy for .snappy paths):
        # ship the PATHS as items, open + decode the framing once per
        # file inside the task, parse as one CSV stream — zip-path shape
        if not all(_framed_variant(str(p), compress) for p in path_list):
            raise ValueError(
                "cannot mix snappy/lzo-compressed and plain CSV paths")
        variant = _framed_variant(str(path_list[0]), compress)

        def parse_snappy(t: pa.Table) -> pa.Table:
            import io

            from datax_ray.sources.files import open_input

            decode = _FRAMED_DECODERS[variant]
            tabs = []
            for path in t["path"].to_pylist():
                with open_input(path) as f:
                    text = decode(f.read())
                if text:  # wholly-empty file → no rows
                    tabs.append(pacsv.read_csv(
                        io.BytesIO(text),
                        read_options=read_opts,
                        parse_options=parse_opts,
                        convert_options=conv_opts,
                    ))
            if not tabs:
                return pa.schema(
                    [(c, pa.string()) for c in col_names]
                ).empty_table()
            return pa.concat_tables(tabs)

        ds = rd.from_items(
            [{"path": str(p)} for p in path_list]
        ).map_batches(parse_snappy, batch_format="pyarrow", batch_size=1)
    else:
        ds = rd.read_csv(
            paths,
            read_options=read_opts,
            parse_options=parse_opts,
            convert_options=conv_opts,
            override_num_blocks=override_num_blocks,
        )
    proj = CsvProjection(entries, null_format=null_format, dead_letter_dir=dead_letter_dir)
    return ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
