"""Job-spec CLI — the Engine / JobContainer equivalent.

DataX drives everything from a job JSON: ``reader → [transformer] →
writer`` plus settings (reference: core/.../Engine.java:122-172 arg parse
and config merge; JobContainer.java:96-182 lifecycle ``preHandle → init →
prepare → split → schedule → post → postHandle → hooks`` + error-budget
check :962-966). Here the same job shape builds a lazy Ray Data pipeline;
split/schedule/channel collapse into the Dataset plan, so the remaining
explicit lifecycle is: validate (preCheck/dryRun) → prepare (writer mode) →
run → error-budget check → hooks.

    python -m datax_ray.cli job.json [--dry-run] [--resume]

Job spec:

    {"job": {
       "content": {
         "reader":      {"name": "parquet|csv|stream|changelog", "parameter": {...}},
         "transformer": [{"name": "dx_substr", "parameter": {...}}, ...],
         "writer":      {"name": "parquet|csv|lake_upsert|stdout", "parameter": {...}}
       },
       "setting": {
         "errorLimit": {"record": 0, "percentage": 0.02},
         "speed": {"record": 10000, "byte": 1048576},
         "deadLetterDir": "/tmp/dead",
         "hooks": ["pkg.module:function"]
       }}}

The ``changelog`` reader + ``lake_upsert`` writer pair runs the CDC replay
engine (epochs, manifest, resume) — DataX's otsstreamreader→writer
incremental path as one job file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any


class JobError(RuntimeError):
    pass


# DataX plugin names → engine readers/writers, for the aliases whose
# parameter shapes line up 1:1 (streamreader's column/sliceRecordCount,
# txtfile*'s path/fileName/writeMode/fieldDelimiter/nullFormat/header) —
# a reference job.json pastes in unchanged. Network-bound plugin names
# (mysqlreader, ossreader, ...) intentionally stay unknown.
_READER_ALIASES = {"streamreader": "stream", "txtfilereader": "csv"}
_WRITER_ALIASES = {"streamwriter": "stdout", "txtfilewriter": "csv"}


# ---------------------------------------------------------------- readers
def _build_reader(name: str, p: dict[str, Any]):
    import ray.data as rd

    name = _READER_ALIASES.get(name, name)
    if name == "parquet":
        return rd.read_parquet(p["path"], columns=p.get("columns"))
    if name == "csv":
        from datax_ray.sources.csvsource import read_csv

        return read_csv(
            p["path"],
            columns=p.get("column"),
            field_delimiter=p.get("fieldDelimiter", ","),
            null_format=p.get("nullFormat", "\\N"),
            skip_header=p.get("skipHeader", False),
            dead_letter_dir=p.get("deadLetterDir"),
            compress=p.get("compress"),
            encoding=p.get("encoding", "utf-8"),
        )
    if name == "stream":
        from datax_ray.sources.stream import stream_dataset

        return stream_dataset(
            p["column"],
            rows_per_slice=p.get("sliceRecordCount", 1000),
            n_slices=p.get("slices", 1),
            seed=p.get("seed", 0),
        )
    if name == "changelog":
        from datax_ray.sources.parquet import read_changelog

        return read_changelog(p["path"], columns=p.get("columns"))
    if name == "jsonl":
        from datax_ray.sources.files import read_jsonl

        return read_jsonl(p["path"], path_regex=p.get("pathRegex"))
    if name == "seq":
        # hdfsreader fileType=SEQ (DFSUtil.java:214-242): Text values are
        # txtfilereader lines; pure-Python SequenceFile container
        from datax_ray.sources.seqfile import read_seq_csv

        return read_seq_csv(
            p["path"],
            columns=p.get("column"),
            field_delimiter=p.get("fieldDelimiter", ","),
            null_format=p.get("nullFormat"),
            dead_letter_dir=p.get("deadLetterDir"),
            encoding=p.get("encoding", "utf-8"),
            path_regex=p.get("pathRegex"),
        )
    if name == "rc":
        # hdfsreader fileType=RC (DFSUtil.java:244-291): row cells are
        # strings through the typed projection; pure-Python RCFile
        from datax_ray.sources.rcfile import read_rc_csv

        return read_rc_csv(
            p["path"],
            columns=p.get("column"),
            null_format=p.get("nullFormat"),
            dead_letter_dir=p.get("deadLetterDir"),
            encoding=p.get("encoding", "utf-8"),
            path_regex=p.get("pathRegex"),
        )
    if name == "orc":
        from datax_ray.sources.files import read_orc

        return read_orc(p["path"], columns=p.get("columns"),
                        path_regex=p.get("pathRegex"))
    if name == "lake":
        # read a CDC lake's folded state (optionally a time-travel
        # snapshot as of a committed epoch) back into any writer
        from datax_ray.sinks.lake import read_lake

        return read_lake(p["path"], columns=p.get("columns"),
                         as_of_epoch=p.get("asOfEpoch"))
    if name == "duckdb":
        # querySql mode (ReaderSplitUtil.java:92-102): each SQL string is
        # one slice run in its own Ray task over registered file views
        from datax_ray.sources.duckdbsource import read_sql

        return read_sql(p["sql"], p.get("views"))
    from datax_ray.plugins import SOURCE_REGISTRY

    if name in SOURCE_REGISTRY:
        return SOURCE_REGISTRY[name](p)
    raise JobError(f"unknown reader: {name}")


def _precheck_reader(name: str, p: dict[str, Any]) -> list[str]:
    name = _READER_ALIASES.get(name, name)
    notes = []
    if name in ("parquet", "csv", "changelog"):
        path = p["path"]
        paths = path if isinstance(path, list) else [path]
        for one in paths:
            if not (os.path.exists(one) or any(c in one for c in "*?[")):
                raise JobError(f"reader path does not exist: {one}")
        notes.append(f"reader {name}: {len(paths)} path(s) ok")
    elif name == "stream":
        from datax_ray.sources.stream import StreamColumn

        [StreamColumn(**c) if isinstance(c, dict) else c for c in p["column"]]
        notes.append("reader stream: column config ok")
    return notes


# ---------------------------------------------------------------- writers
def _run_writer(name: str, p: dict[str, Any], ds, resume: bool) -> dict[str, Any]:
    name = _WRITER_ALIASES.get(name, name)
    if name == "parquet":
        path = p["path"]
        mode = p.get("writeMode", "append")
        from datax_ray.sinks.csvsink import prepare_dir

        prepare_dir(path, mode, prefix="")
        ds.write_parquet(path)
        return {"rows": None, "path": path}
    if name == "csv":
        from datax_ray.sinks.csvsink import write_csv

        report = write_csv(
            ds,
            p["path"],
            write_mode=p.get("writeMode", "append"),
            prefix=p.get("fileName", "part"),
            field_delimiter=p.get("fieldDelimiter", ","),
            null_format=p.get("nullFormat", "\\N"),
            header=p.get("header", False),
            compress=p.get("compress"),
            encoding=p.get("encoding", "utf-8"),
        )
        return {"rows": sum(r["rows"] for r in report), "files": len(report)}
    if name == "json":
        from datax_ray.sinks.csvsink import prepare_dir

        prepare_dir(p["path"], p.get("writeMode", "append"), prefix="")
        ds.write_json(p["path"])
        return {"rows": None, "path": p["path"]}
    if name == "seq":
        from datax_ray.sources.seqfile import write_seq_csv

        report = write_seq_csv(
            ds, p["path"],
            write_mode=p.get("writeMode", "append"),
            prefix=p.get("fileName", "part"),
            field_delimiter=p.get("fieldDelimiter", ","),
            null_format=p.get("nullFormat"),
            codec=p.get("codec"),
            block=p.get("blockCompressed", False),
            encoding=p.get("encoding", "utf-8"),
        )
        return {"rows": sum(r["rows"] for r in report), "files": len(report)}
    if name == "rc":
        from datax_ray.sources.rcfile import write_rc

        report = write_rc(
            ds, p["path"],
            write_mode=p.get("writeMode", "append"),
            prefix=p.get("fileName", "part"),
            null_format=p.get("nullFormat"),
            codec=p.get("codec", "org.apache.hadoop.io.compress.DefaultCodec"),
            encoding=p.get("encoding", "utf-8"),
        )
        return {"rows": sum(r["rows"] for r in report), "files": len(report)}
    if name == "orc":
        from datax_ray.sinks.orcsink import write_orc

        report = write_orc(
            ds, p["path"],
            write_mode=p.get("writeMode", "append"),
            prefix=p.get("fileName", "part"),
            compression=p.get("compress", "zstd"),
        )
        return {"rows": sum(r["rows"] for r in report), "files": len(report)}
    if name == "stdout":
        n = p.get("limit", 20)
        for row in ds.take(n):
            print(json.dumps(row, default=str))
        return {"rows": n}
    from datax_ray.plugins import SINK_REGISTRY

    if name in SINK_REGISTRY:
        return SINK_REGISTRY[name](p, ds, resume)
    raise JobError(f"unknown writer: {name}")


def _run_lake_upsert(reader_p: dict, writer_p: dict, resume: bool,
                     transform_specs: list | None = None,
                     dead_letter_dir: str | None = None,
                     record_rate: float | None = None,
                     byte_rate: float | None = None,
                     error_limit=None,
                     verbose: bool = True) -> tuple[dict[str, Any], dict[str, int]]:
    """The CDC job: changelog reader + lake_upsert writer = replay engine.
    Transformers run reader-side ahead of the exchange (the reference's
    chain-before-channel contract). Malformed events route to the job's
    deadLetterDir and count against the error budget — evaluated inside
    the replay loop (mid-run abort, ErrorRecordChecker.java:18-82) AND
    attributed by epoch lsn range, so a resumed run that re-executes a
    previously-crashed epoch counts that epoch's (pre-existing, same-name)
    dead-letter file while skipped committed epochs are excluded."""
    from datax_ray.cdc.replay import dead_letter_rows_for_ranges, replay_files

    tail_p = reader_p.get("tail")
    if tail_p is not None:
        # tail mode: reader.parameter.tail = {pollInterval, idlePolls,
        # maxPolls} — poll for events beyond the manifest high-water mark
        # and replay each new lsn range (cdc/replay.tail_files); no
        # maxLsnExclusive needed, the footer scan discovers it
        from datax_ray.cdc.replay import tail_files
        from datax_ray.state.manifest import Manifest

        tr = tail_files(
            reader_p["path"],
            lake_dir=writer_p["path"],
            num_partitions=writer_p.get("numPartitions", 64),
            epoch_size=reader_p.get("epochSize"),
            poll_interval=tail_p.get("pollInterval", 1.0),
            idle_polls=tail_p.get("idlePolls", 3),
            max_polls=tail_p.get("maxPolls"),
            compact_every=writer_p.get("compactEvery", 8),
            keep_epochs=writer_p.get("keepEpochs", 0),
            run_id=writer_p.get("runId"),
            verbose=verbose,
            transform_specs=transform_specs,
            dead_letter_dir=dead_letter_dir,
            record_rate=record_rate,
            byte_rate=byte_rate,
            error_limit=error_limit,
        )
        try:
            metrics = Manifest.load(writer_p["path"]).metrics_by_partition()
        except FileNotFoundError:
            metrics = {}   # tail saw no data: no lake was created
        dirty = dead_letter_rows_for_ranges(
            dead_letter_dir, tr.executed_ranges)
        totals = {"input": tr.events_applied + dirty, "dirty": dirty}
        return {
            "tail": True,
            "polls": tr.polls,
            "replays": tr.replays,
            "events_applied": tr.events_applied,
            "last_lsn_exclusive": tr.last_lsn_exclusive,
            "dead_lettered": dirty,
            "partition_metrics": metrics,
        }, totals

    res = replay_files(
        reader_p["path"],
        lake_dir=writer_p["path"],
        max_lsn_exclusive=reader_p["maxLsnExclusive"],
        num_partitions=writer_p.get("numPartitions", 64),
        epoch_size=reader_p.get("epochSize"),
        window=tuple(reader_p["window"]) if reader_p.get("window") else None,
        compact_every=writer_p.get("compactEvery", 8),
        keep_epochs=writer_p.get("keepEpochs", 0),
        run_id=writer_p.get("runId"),
        verbose=verbose,
        transform_specs=transform_specs,
        dead_letter_dir=dead_letter_dir,
        record_rate=record_rate,
        byte_rate=byte_rate,
        error_limit=error_limit,
    )
    dirty = dead_letter_rows_for_ranges(dead_letter_dir, res.executed_ranges)
    totals = {"input": res.events_applied + dirty, "dirty": dirty}
    return {
        "epochs_run": res.epochs_run,
        "epochs_skipped": res.epochs_skipped,
        "events_applied": res.events_applied,
        "events_per_sec": round(res.events_per_sec, 1),
        "dead_lettered": dirty,
        "partition_metrics": res.manifest.metrics_by_partition(),
    }, totals


def run_job(spec: dict[str, Any], *, dry_run: bool = False,
            resume: bool = False) -> dict[str, Any]:
    # preHandler (JobContainer.java:312-345): may rewrite the job config.
    # Runs for --dry-run too — dry-run must validate the spec the real run
    # would execute, not the pre-rewrite one.
    pre = spec["job"].get("setting", {}).get("preHandler")
    if pre:
        from datax_ray.plugins import resolve_handler

        spec = resolve_handler(pre)(spec) or spec
    job = spec["job"]
    content = job["content"]
    # Reference job format wraps the reader/writer pair in a single-element
    # LIST ("content": [{...}], JobContainer reads content[0]); accept both
    # that and the bare dict so a DataX job.json pastes in unchanged.
    if isinstance(content, list):
        if len(content) != 1:
            raise ValueError(
                f"job.content must have exactly one element, got {len(content)}")
        content = content[0]
    setting = job.get("setting", {})
    reader = content["reader"]
    writer = content["writer"]
    transformer_specs = content.get("transformer", [])

    # ---- preCheck (always; = dryRun path of JobContainer.java:184-213)
    notes = _precheck_reader(reader["name"], reader.get("parameter", {}))
    from datax_ray.transforms import build_transform

    transforms = [build_transform(t) for t in transformer_specs]
    notes.append(f"{len(transforms)} transform(s) ok")
    if dry_run:
        return {"dryRun": True, "ok": True, "notes": notes}

    if any(t.get("name") == "lookup" for t in transformer_specs):
        # ship each lookup's dimension table to the object store ONCE
        # (ray.put) so every task/epoch probes the same zero-copy buffer
        from datax_ray.transforms.lookup import broadcast_lookup_specs

        transformer_specs = broadcast_lookup_specs(transformer_specs)
        transforms = [build_transform(t) for t in transformer_specs]

    t0 = time.perf_counter()
    if reader["name"] == "changelog" and writer["name"] == "lake_upsert":
        el_spec = setting.get("errorLimit")
        limit = None
        if el_spec:
            from datax_ray.transforms import ErrorLimit

            limit = ErrorLimit(record=el_spec.get("record"),
                               percentage=el_spec.get("percentage"))
        result, totals = _run_lake_upsert(
            reader.get("parameter", {}), writer.get("parameter", {}), resume,
            transform_specs=transformer_specs or None,
            dead_letter_dir=setting.get("deadLetterDir"),
            record_rate=(setting.get("speed") or {}).get("record"),
            byte_rate=(setting.get("speed") or {}).get("byte"),
            error_limit=limit,
        )
    else:
        ds = _build_reader(reader["name"], reader.get("parameter", {}))
        speed = setting.get("speed") or {}
        if speed.get("record") or speed.get("byte"):
            # flow control (Channel.java:176-239): global token-bucket
            # throttle right after the read
            from datax_ray.transforms.speed import make_throttle

            ds = ds.map_batches(
                make_throttle(speed), batch_format="pyarrow", zero_copy_batch=True
            )
        counters = None
        if transforms:
            from datax_ray.transforms import Counters, TransformChain

            counters = Counters()
            chain = TransformChain(
                transforms,
                dead_letter_dir=setting.get("deadLetterDir"),
                counters=counters,
            )
            ds = ds.map_batches(chain, batch_format="pyarrow")
        result = _run_writer(writer["name"], writer.get("parameter", {}), ds, resume)
        totals = counters.totals() if counters else {}

    # ---- error budget (ErrorRecordChecker.java:18-82 precedence)
    el = setting.get("errorLimit")
    if el and totals:
        from datax_ray.transforms import ErrorLimit

        ErrorLimit(record=el.get("record"), percentage=el.get("percentage")).check(
            totals.get("dirty", 0), totals.get("input", 0)
        )

    # ---- hooks (Hook.java:10-26 / HookInvoker — plain callables post-run)
    report = {
        "ok": True,
        "secs": round(time.perf_counter() - t0, 3),
        "result": result,
        "counters": totals,
    }
    # postHandler (JobContainer.java:347-378) runs before the Hook SPI
    post = setting.get("postHandler")
    if post:
        from datax_ray.plugins import resolve_handler

        resolve_handler(post)(spec, report)
    from datax_ray.plugins import resolve_handler as _rh

    for hook in setting.get("hooks", []):
        _rh(hook)(spec, report)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="datax_ray", description=__doc__)
    ap.add_argument("job", help="path to job spec JSON, or a lake dir with --status")
    ap.add_argument("--status", action="store_true",
                    help="print a lake's manifest status (epochs, offsets, "
                         "per-partition metrics) instead of running a job")
    ap.add_argument("--dry-run", action="store_true",
                    help="validate config/paths/permissions, move no data")
    ap.add_argument("--resume", action="store_true",
                    help="resume a lake_upsert job from its manifest")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("-p", "--param", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="substitute ${KEY} variables in the job spec "
                         "(DataX -p \"-Dkey=value\"); repeatable")
    ap.add_argument("--backfill", metavar="MODULE:FN",
                    help="treat JOB as a lake dir and run a partition-"
                         "parallel in-place backfill with the named "
                         "vectorized fn(pa.Table)->pa.Table; resumable "
                         "per partition (see sinks/lake.backfill)")
    ap.add_argument("--tag", help="backfill tag (default: fn name); reruns "
                                  "with the same tag skip swapped partitions")
    ap.add_argument("--vacuum", action="store_true",
                    help="treat JOB as a lake dir and delete data files "
                         "not referenced by the committed manifest "
                         "(crashed-run garbage, replaced bases)")
    args = ap.parse_args(argv)

    if args.vacuum:
        from datax_ray.sinks.lake import vacuum

        victims = vacuum(args.job)
        print(json.dumps({"deleted": len(victims), "files": victims[:20]}))
        return 0

    if args.backfill:
        from datax_ray.plugins import resolve_handler
        from datax_ray.sinks.lake import backfill

        fn = resolve_handler(args.backfill)
        import ray

        owns_ray = not ray.is_initialized()
        if owns_ray:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
        try:
            print(json.dumps(backfill(args.job, fn, tag=args.tag)))
            return 0
        finally:
            if owns_ray:
                ray.shutdown()

    if args.status:
        from datax_ray.state.manifest import Manifest

        m = Manifest.load(args.job)
        print(json.dumps({
            "run_id": m.run_id,
            "num_partitions": m.num_partitions,
            "last_lsn": m.last_lsn,
            "epochs": m.state["epochs"][-5:],
            "partitions_with_data": sum(
                1 for p in range(m.num_partitions) if m.partition_files(p)
            ),
            "metrics_sample": dict(list(m.metrics_by_partition().items())[:3]),
        }, default=str, indent=1))
        return 0

    with open(args.job) as f:
        raw = f.read()
    if args.param:  # only when -p given: a literal ${...} in data is fine
        from datax_ray.config import substitute_params

        params = dict(kv.split("=", 1) for kv in args.param)
        raw = substitute_params(raw, params)
    spec = json.loads(raw)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local", num_cpus=args.num_cpus,
            include_dashboard=False, logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    try:
        report = run_job(spec, dry_run=args.dry_run, resume=args.resume)
        print(json.dumps(report, default=str))
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
