"""File-format readers beyond parquet/CSV: ORC, JSON-lines, text, binary.

Maps the hdfsreader format matrix (reference: hdfsreader/.../DFSUtil.java —
TEXT, CSV, ORC, SEQ, RC; HdfsFileType.java:8) onto Ray Data natives where
they exist and onto a pyarrow-backed per-file task where they don't:

- text / csv / json  → ``ray.data.read_text`` / our csvsource / ``read_json``
- orc                → per-file ``pyarrow.orc`` read inside ``map_batches``
                       over the file list (Ray 2.49 has no ``read_orc``);
                       one task per file — the same one-file-per-task split
                       contract as txtfilereader (TxtFileReader.java:213-236)
- binary (multimodal payloads) → ``ray.data.read_binary_files`` wrapped to
                       the MEDIA-ish schema (media_id from path, payload)

SEQ/RC (Hadoop-era containers) are intentionally out of scope — no JVM.
Path selection supports the reference's regex filter (FilterUtil) via
``path_regex``.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

from datax_ray.util import filter_paths


def list_files(path: str | list[str], *, path_regex: str | None = None) -> list[str]:
    if isinstance(path, list):
        out = []
        for p in path:
            out.extend(list_files(p, path_regex=None))
        return filter_paths(sorted(out), path_regex)
    if os.path.isdir(path):
        found = sorted(
            os.path.join(dp, f) for dp, _, fs in os.walk(path) for f in fs
        )
    elif any(c in path for c in "*?["):
        found = sorted(glob.glob(path))
    else:
        found = [path]
    return filter_paths(found, path_regex)


def read_orc(path: str | list[str], *, columns: list[str] | None = None,
             path_regex: str | None = None):
    """ORC read: one Ray task per file via pyarrow.orc."""
    import ray.data as rd

    files = list_files(path, path_regex=path_regex)
    if not files:
        raise FileNotFoundError(f"no ORC files under {path}")

    def load(batch) -> pa.Table:
        from pyarrow import orc

        f = str(batch["file"][0])
        return orc.read_table(f, columns=columns)

    return rd.from_items([{"file": f} for f in files]).map_batches(
        load, batch_size=1, batch_format="pandas"
    )


def read_jsonl(path: str | list[str], *, path_regex: str | None = None, **kwargs):
    import ray.data as rd

    return rd.read_json(list_files(path, path_regex=path_regex), **kwargs)


def read_text(path: str | list[str], *, path_regex: str | None = None, **kwargs):
    import ray.data as rd

    return rd.read_text(list_files(path, path_regex=path_regex), **kwargs)


def read_binary_media(path: str | list[str], *, mime: str = "application/octet-stream",
                      path_regex: str | None = None):
    """Binary payload read → multimodal-ish schema (media path, mime,
    payload bytes); feed into ops.multimodal actor-pool stages."""
    import ray.data as rd

    ds = rd.read_binary_files(list_files(path, path_regex=path_regex),
                              include_paths=True)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_path": t["path"],
                "mime": pa.array([mime] * t.num_rows),
                "payload": t["bytes"].cast(pa.binary()) if "bytes" in t.column_names else t["data"],
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow")
