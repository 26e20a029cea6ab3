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
