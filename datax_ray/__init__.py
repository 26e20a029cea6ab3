"""datax_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimagination of DataX (reference: /root/reference, an
Alibaba DataX 3.0 fork) as an idiomatic Ray Data engine:

- ``sources``   — parquet / CSV / synthetic readers (DataX reader plugins,
                  re-expressed as ``ray.data`` reads + vectorized projection).
- ``transforms``— the dx_* per-record transform surface (dx_substr, dx_pad,
                  dx_replace, dx_filter, dx_python) vectorized over Arrow
                  batches, with dirty-record routing and an error budget.
- ``cdc``       — the flagship: changelog replay with last-writer-wins
                  upsert merge, hash-partitioned by conv_id, salted
                  two-phase re-merge for hot keys, Arrow schema evolution.
- ``state``     — checkpoint manifest: per-partition lineage
                  (source offset → epoch → committed files) + metrics.
- ``sinks``     — exactly-once Parquet lake (staging + atomic manifest
                  commit, idempotent by (partition, epoch)); CSV writer with
                  DataX writeMode semantics.
- ``ops``       — large-scale training-data operators: dedup (exact,
                  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
                  similarity search, text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps `import datax_ray` light — no Ray import
    until a pipeline is actually built)."""
    api = {
        "replay_files": ("datax_ray.cdc.replay", "replay_files"),
        "replay": ("datax_ray.cdc.replay", "replay"),
        "replay_files_stateful": ("datax_ray.cdc.actor_merge", "replay_files_stateful"),
        "bootstrap_lake": ("datax_ray.cdc.bootstrap", "bootstrap_lake"),
        "lww_merge": ("datax_ray.cdc.merge", "lww_merge"),
        "read_changelog": ("datax_ray.sources.parquet", "read_changelog"),
        "read_lake": ("datax_ray.sinks.lake", "read_lake"),
        "read_lake_table": ("datax_ray.sinks.lake", "read_lake_table"),
        "lookup_conversation": ("datax_ray.sinks.lake", "lookup_conversation"),
        "vacuum": ("datax_ray.sinks.lake", "vacuum"),
        "Manifest": ("datax_ray.state.manifest", "Manifest"),
        "run_job": ("datax_ray.cli", "run_job"),
    }
    if name in api:
        import importlib

        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'datax_ray' has no attribute {name!r}")
