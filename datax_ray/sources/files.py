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
    """Expand a path/glob/dir (or list of them) to concrete file paths.

    ``scheme://`` URIs (s3://, memory://, gs://, …) route through fsspec —
    the remote-FS passthrough standing in for the reference's ftp/oss
    readers (ftpreader/, ossreader/: network services, out of scope as
    live plugins). Any filesystem whose state is visible to Ray WORKER
    processes works for distributed reads (s3/gs/http/file); a
    process-LOCAL filesystem like ``memory://`` works for listing and
    driver-side ``open_input`` but its contents do not exist in worker
    processes, so Dataset reads over it will miss. Returned entries keep
    their scheme so downstream opens route the same way."""
    if isinstance(path, list):
        out = []
        for p in path:
            out.extend(list_files(p, path_regex=None))
        return filter_paths(sorted(out), path_regex)
    if "://" in path:
        found = sorted(_fsspec_list(path))
        return filter_paths(found, path_regex)
    if os.path.isdir(path):
        found = sorted(
            os.path.join(dp, f) for dp, _, fs in os.walk(path) for f in fs
        )
    elif any(c in path for c in "*?["):
        found = sorted(glob.glob(path))
    else:
        found = [path]
    return filter_paths(found, path_regex)


def _fsspec_list(uri: str) -> list[str]:
    import fsspec

    fs, inner = fsspec.core.url_to_fs(uri)
    scheme = uri.split("://", 1)[0]
    if any(c in inner for c in "*?["):
        hits = fs.glob(inner)
    elif fs.isdir(inner):
        hits = fs.find(inner)
    else:
        hits = [inner] if fs.exists(inner) else []
    return [f"{scheme}://{h.lstrip('/') if scheme == 'memory' else h}"
            for h in hits]


def _ray_fs_paths(files: list[str]):
    """(filesystem, paths) for Ray Data read APIs: scheme URIs Arrow
    doesn't natively mount (memory://, ftp://…) get an fsspec-backed
    pyarrow filesystem + scheme-stripped paths; plain/native paths pass
    through with filesystem=None."""
    if not files or not any("://" in f for f in files):
        return None, files
    schemes = {f.split("://", 1)[0] if "://" in f else "<local>"
               for f in files}
    if len(schemes) > 1:
        # one filesystem serves the whole read; a path stripped of the
        # WRONG scheme would silently resolve against another filesystem
        raise ValueError(
            f"mixed filesystem schemes in one read: {sorted(schemes)}")
    import fsspec
    from pyarrow.fs import FSSpecHandler, PyFileSystem

    try:  # Arrow-native schemes (s3://, gs://, file://) need no wrapper
        import pyarrow.fs as pafs

        afs, _ = pafs.FileSystem.from_uri(files[0])
        return afs, [pafs.FileSystem.from_uri(f)[1] for f in files]
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, OSError):
        pass
    fs, first = fsspec.core.url_to_fs(files[0])
    paths = [fsspec.core.url_to_fs(f)[1] for f in files]
    return PyFileSystem(FSSpecHandler(fs)), paths


def open_input(path: str, mode: str = "rb"):
    """Open one input for the pyarrow-direct readers: local ``open`` for
    plain paths, ``fsspec.open`` for scheme URIs."""
    if "://" in path:
        import fsspec

        return fsspec.open(path, mode).open()
    return open(path, mode)


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
        if "://" in f:
            with open_input(f) as fh:
                return orc.read_table(fh, columns=columns)
        return orc.read_table(f, columns=columns)

    return rd.from_items([{"file": f} for f in files]).map_batches(
        load, batch_size=1, batch_format="pandas"
    )


def read_jsonl(path: str | list[str], *, path_regex: str | None = None, **kwargs):
    import ray.data as rd

    fs, files = _ray_fs_paths(list_files(path, path_regex=path_regex))
    return rd.read_json(files, filesystem=kwargs.pop("filesystem", fs), **kwargs)


def read_text(path: str | list[str], *, path_regex: str | None = None, **kwargs):
    import ray.data as rd

    fs, files = _ray_fs_paths(list_files(path, path_regex=path_regex))
    return rd.read_text(files, filesystem=kwargs.pop("filesystem", fs), **kwargs)


def read_binary_media(path: str | list[str], *, mime: str = "application/octet-stream",
                      path_regex: str | None = None):
    """Binary payload read → multimodal-ish schema (media path, mime,
    payload bytes); feed into ops.multimodal actor-pool stages."""
    import ray.data as rd

    fs, files = _ray_fs_paths(list_files(path, path_regex=path_regex))
    ds = rd.read_binary_files(files, filesystem=fs, include_paths=True)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_path": t["path"],
                "mime": pa.array([mime] * t.num_rows),
                "payload": t["bytes"].cast(pa.binary()) if "bytes" in t.column_names else t["data"],
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow")
