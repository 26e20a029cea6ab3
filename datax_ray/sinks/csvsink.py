"""CSV / delimited-text sink with DataX txtfilewriter semantics.

Reference: txtfilewriter/.../TxtFileWriter.java:95-199 (writeMode
truncate / append / nonConflict), :212-258 (per-task unique filenames
``<prefix>__<uuid>``), serialization conventions in
plugin-unstructured-storage-util/.../writer/UnstructuredStorageWriterUtil.
java:241-320 and TextCsvWriterManager.java:14-60 (CSV strict quoting vs raw
text join), nullFormat default ``\\N`` (writer Constant.java:9).

Ray shape: ``prepare()`` runs once on the driver (DataX Writer.Job.prepare)
applying the write mode; the write itself is a consuming ``map_batches``
where each task serializes its blocks to ``<prefix>__<uuid>.csv[.gz]`` —
the per-task-unique-name contract makes concurrent writers conflict-free
and retries harmless (a retried task writes a new uuid; orphans from a
failed attempt are prefix-matched away by the next truncate run).
"""

from __future__ import annotations

import fnmatch
import glob
import gzip
import io
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_NULL_FORMAT = "\\N"


class WriteModeError(RuntimeError):
    pass


def prepare_dir(path: str, write_mode: str, prefix: str = "") -> None:
    """Apply the writeMode contract before any data moves."""
    os.makedirs(path, exist_ok=True)
    existing = [
        f for f in os.listdir(path)
        if fnmatch.fnmatch(f, f"{prefix}*") or not prefix
    ]
    mode = write_mode.lower()
    if mode == "truncate":
        for f in existing:
            os.unlink(os.path.join(path, f))
    elif mode == "append":
        pass
    elif mode == "nonconflict":
        if existing:
            raise WriteModeError(
                f"nonConflict: directory {path} already contains files: {existing[:5]}"
            )
    else:
        raise WriteModeError(f"unsupported writeMode: {write_mode}")


class CsvBlockWriter:
    """map_batches callable: serialize each batch to its own uniquely-named
    file. Stateless task — uuid per call keeps names unique."""

    def __init__(
        self,
        path: str,
        *,
        prefix: str = "part",
        field_delimiter: str = ",",
        null_format: str = DEFAULT_NULL_FORMAT,
        header: bool = False,
        date_format: str = "%Y-%m-%d %H:%M:%S",
        # None | gzip | bzip2 | zstd | lz4 | framing-snappy |
        # hadoop-snappy | lzo (lzop container) | lzo_deflate
        compress: str | None = None,
        encoding: str = "utf-8",
    ):
        self.path = path
        self.prefix = prefix
        self.delim = field_delimiter
        self.null_format = null_format
        self.header = header
        self.date_format = date_format
        self.compress = compress
        self.encoding = encoding

    def _serialize(self, batch: pa.Table) -> bytes:
        # stringify every column with the reference conventions: dates via
        # dateFormat, bools as true/false, nulls as nullFormat
        cols = []
        for name in batch.column_names:
            col = batch[name]
            if pa.types.is_timestamp(col.type):
                # Arrow %S emits fractional seconds for sub-second units;
                # truncate to seconds unless the format asks for fractions
                src = col if "%f" in self.date_format else col.cast(pa.timestamp("s"))
                col = pc.strftime(src, format=self.date_format)
            elif pa.types.is_boolean(col.type):
                col = pc.if_else(col, "true", "false")
            else:
                col = col.cast(pa.string())
            col = pc.fill_null(col, self.null_format)
            cols.append(col)
        str_table = pa.table(dict(zip(batch.column_names, cols)))
        from pyarrow import csv as pacsv

        buf = io.BytesIO()
        pacsv.write_csv(
            str_table,
            buf,
            write_options=pacsv.WriteOptions(
                include_header=self.header, delimiter=self.delim
            ),
        )
        data = buf.getvalue()
        if self.encoding.lower().replace("-", "") not in ("utf8", "ascii"):
            # txtfilewriter encoding (reference Key.ENCODING): one C-level
            # transcode per serialized batch, applied before compression
            data = data.decode("utf-8").encode(self.encoding)
        return data

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = self._serialize(batch)
        ext = {"gzip": ".csv.gz", "bzip2": ".csv.bz2",
               "zstd": ".csv.zst", "lz4": ".csv.lz4",
               "framing-snappy": ".csv.snappy",
               "hadoop-snappy": ".csv.snappy",
               "lzo": ".csv.lzo",
               "lzo_deflate": ".csv.lzo_deflate"}.get(self.compress, ".csv")
        name = f"{self.prefix}__{uuid.uuid4().hex}{ext}"
        tmp = os.path.join(self.path, f".tmp.{name}")
        final = os.path.join(self.path, name)
        if self.compress == "gzip":
            with gzip.open(tmp, "wb") as f:
                f.write(data)
        elif self.compress == "bzip2":
            import bz2

            with bz2.open(tmp, "wb") as f:
                f.write(data)
        elif self.compress in ("zstd", "lz4"):
            with pa.CompressedOutputStream(tmp, self.compress) as f:
                f.write(data)
        elif self.compress in ("framing-snappy", "hadoop-snappy",
                               "lzo", "lzo_deflate"):
            from datax_ray.sources import lzo_codec as lc
            from datax_ray.sources import snappy_codec as sc

            enc = {"framing-snappy": sc.encode_framing_snappy,
                   "hadoop-snappy": sc.encode_hadoop_snappy,
                   "lzo": lc.encode_lzop,
                   "lzo_deflate": lc.encode_lzo_block_stream}[self.compress]
            with open(tmp, "wb") as f:
                f.write(enc(data))
        else:
            with open(tmp, "wb") as f:
                f.write(data)
        os.replace(tmp, final)
        return pa.table({"file": [final], "rows": [batch.num_rows]})


def write_csv(
    ds,
    path: str,
    *,
    write_mode: str = "append",
    prefix: str = "part",
    field_delimiter: str = ",",
    null_format: str = DEFAULT_NULL_FORMAT,
    header: bool = False,
    compress: str | None = None,
    encoding: str = "utf-8",
) -> list[dict]:
    """Consume a Dataset into a directory of CSV part files; returns the
    per-file write report."""
    prepare_dir(path, write_mode, prefix)
    writer = CsvBlockWriter(
        path,
        prefix=prefix,
        field_delimiter=field_delimiter,
        null_format=null_format,
        header=header,
        compress=compress,
        encoding=encoding,
    )
    return ds.map_batches(writer, batch_format="pyarrow").take_all()


def list_output_files(path: str, prefix: str = "part") -> list[str]:
    return sorted(glob.glob(os.path.join(path, f"{prefix}__*")))
