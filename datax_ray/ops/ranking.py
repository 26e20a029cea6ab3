"""Corpus-statistics relevance scoring (TF-IDF / BM25) — two streaming
passes, no shuffle.

For a FIXED query (the common retrieval/curation case: score every
document against a query or a topic keyword list), the only global state
BM25 needs is (N, avgdl, df per query term) — a handful of scalars, NOT
the full vocabulary. So:

  pass 1: map_batches → one partial-stats row PER BATCH
          (n_docs, Σdl, df per term) → driver folds #blocks rows.
  pass 2: map_batches → per-doc score, all RE2-vectorized; the stats ride
          into the closure as plain floats (no broadcast object needed).

Term frequency uses word-boundary RE2 counts (``\\b<term>\\b`` over
lowercased text) and document length uses ``\\S+`` counts — both have
bit-exact DuckDB equivalents (``regexp_extract_all``), which is what makes
the whole scorer SQL-oracle-able. Query terms must be alphanumeric (they
are spliced into a regex).

Full-vocabulary TF-IDF (all terms, not a fixed query) would make pass 1 a
``groupby(term)`` over per-batch distinct terms — the standard DF shuffle;
``bm25_scores`` deliberately avoids it because the fixed-query case needs
no shuffle at all.

Reference contrast: DataX ships no scoring operators; this is engine
surface for the LLM-curation pipelines the north rule targets.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.ops.text import TOKEN_RE

_TERM_OK = re.compile(r"^[0-9a-z]+$")


def _term_re(term: str) -> str:
    if not _TERM_OK.match(term):
        raise ValueError(f"query term must be lowercase alphanumeric: {term!r}")
    return rf"\b{term}\b"


def corpus_stats(ds, query_terms, *, text_col: str = "text") -> dict:
    """One streaming pass → {'n_docs', 'sum_dl', 'df': [per term]}."""
    terms = list(query_terms)
    for term in terms:  # fail on the driver, not inside a Ray task
        _term_re(term)

    def partial(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(t[text_col], ""))
        dl = pc.count_substring_regex(low, TOKEN_RE).cast(pa.int64())
        row = {
            "n_docs": [t.num_rows],
            "sum_dl": [pc.sum(dl).as_py() or 0],
        }
        for i, term in enumerate(terms):
            tf = pc.count_substring_regex(low, _term_re(term))
            row[f"df_{i}"] = [
                pc.sum(pc.cast(pc.greater(tf, 0), pa.int64())).as_py() or 0
            ]
        return pa.table(row)

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()  # #blocks rows
    return {
        "n_docs": sum(r["n_docs"] for r in rows),
        "sum_dl": sum(r["sum_dl"] for r in rows),
        "df": [sum(r[f"df_{i}"] for r in rows) for i in range(len(terms))],
    }


def bm25_scores(ds, query_terms, *, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
                digits: int = 6):
    """Score every document against ``query_terms`` with BM25
    (Robertson/Sparck-Jones idf, the ``+1`` variant that keeps idf
    positive). Returns a Dataset of (id_col, bm25).

    Float contract with the SQL oracle: every arithmetic step below is
    written in the same order the oracle SQL evaluates it (left-assoc
    sums, ``(idf * (tf * (k1+1))) / (tf + k1*((1-b) + (b*dl)/avgdl))``)
    so both sides produce identical IEEE doubles before the final round.
    """
    terms = list(query_terms)
    stats = corpus_stats(ds, terms, text_col=text_col)
    n, sum_dl = stats["n_docs"], stats["sum_dl"]
    if n == 0:
        raise ValueError("bm25_scores over an empty dataset")
    avgdl = sum_dl / n
    idf = [math.log((n - df + 0.5) / (df + 0.5) + 1.0) for df in stats["df"]]
    tf_plus = k1 + 1.0
    one_minus_b = 1.0 - b

    def score(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(t[text_col], ""))
        dl = pc.count_substring_regex(low, TOKEN_RE).to_numpy(
            zero_copy_only=False).astype(np.float64)
        denom_base = k1 * (one_minus_b + (b * dl) / avgdl)
        s = np.zeros(len(dl), dtype=np.float64)
        for i, term in enumerate(terms):
            tf = pc.count_substring_regex(low, _term_re(term)).to_numpy(
                zero_copy_only=False).astype(np.float64)
            s = s + (idf[i] * (tf * tf_plus)) / (tf + denom_base)
        return pa.table({
            id_col: t[id_col],
            "bm25": pa.array(np.round(s, digits)),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
