"""ORC sink — the hdfswriter ORC mode.

Reference: hdfswriter writes TEXT and ORC files for Hive tables
(hdfswriter/src/main/java/com/alibaba/datax/plugin/writer/hdfswriter/
HdfsWriter.java:149-192, HdfsHelper.java orcFileStartWrite) with the same
two-phase visibility contract as the parquet path. TEXT-for-Hive is the
CSV sink with ``fieldDelimiter='\\x01'``; this module adds the ORC side
via ``pyarrow.orc`` (no JVM needed).

Ray shape mirrors sinks/csvsink.py: ``prepare_dir`` applies the
truncate/append/nonConflict writeMode once on the driver, then a
consuming ``map_batches`` writes each block to its own
``<prefix>__<uuid>.orc`` (tmp + ``os.replace`` so readers never see a
partial file; retried tasks write fresh uuids and truncate sweeps
orphans)."""

from __future__ import annotations

import glob
import os
import uuid

import pyarrow as pa

from datax_ray.sinks.csvsink import prepare_dir


class OrcBlockWriter:
    """map_batches callable: one ORC file per batch, atomic rename."""

    def __init__(self, path: str, *, prefix: str = "part",
                 compression: str = "zstd"):
        self.path = path
        self.prefix = prefix
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        name = f"{self.prefix}__{uuid.uuid4().hex}.orc"
        tmp = os.path.join(self.path, f".tmp.{name}")
        final = os.path.join(self.path, name)
        orc.write_table(batch, tmp, compression=self.compression)
        os.replace(tmp, final)
        return pa.table({"file": [final], "rows": [batch.num_rows]})


def write_orc(ds, path: str, *, write_mode: str = "append",
              prefix: str = "part", compression: str = "zstd") -> list[dict]:
    """Consume a Dataset into a directory of ORC part files; returns the
    per-file write report."""
    prepare_dir(path, write_mode, prefix)
    writer = OrcBlockWriter(path, prefix=prefix, compression=compression)
    return ds.map_batches(writer, batch_format="pyarrow").take_all()


def list_output_files(path: str, prefix: str = "part") -> list[str]:
    return sorted(glob.glob(os.path.join(path, f"{prefix}__*.orc")))
