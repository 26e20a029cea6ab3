"""Deterministic LSH signature fixtures — the SQL-oracle bridge for the
three near-dup pipelines (minhash/simhash/embedding sign-LSH).

The signature KERNELS (pd.util.hash_array token hashes, FNV shingle
folds) are not expressible in SQL, but everything downstream of the
signature — band fold, bucket groupby, candidate pair generation, verify
(per-position agreement / Hamming / cosine) — is. So each fixture writes
the engine-computed signatures to a parquet that DuckDB reads, and the
driver's oracle replays band→bucket→pair→verify in SQL over those exact
bytes while the engine query runs the full text→signature→pairs pipeline
over the source documents. Identical results end-to-end ⇒ the LSH plan is
hash-gated; the raw kernels stay pytest-covered (tests/test_ops.py) AND
witnessed by an independent scalar re-derivation with pinned literal
signatures (tests/test_lsh_reference.py) — the fixture is not circular:
a kernel regression fails the reference pin even though the oracle
parquet is engine-emitted.

Same ensure-from-both-sides pattern as ``ops.multimodal.ensure_media_fixture``
(multimodal.py:349-368): the query side ensures for its ``sf_dir``, the
oracle side ensures for the driver's fixed sf0.01, so either may run first.
A content marker (source file identity + params) skips recomputation on
re-runs — signatures are deterministic in (documents.parquet, params).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LSH_FIXTURE_ROOT = "/tmp/datax_ray_lsh"

#: single source of truth for the minhash driver query AND its oracle —
#: q_minhash_lsh_pairs and the minhash_lsh_pairs SQL both read these
MINHASH_PARAMS = {"num_perm": 64, "bands": 16, "shingle_k": 3, "seed": 7,
                  "threshold": 0.5}
SIMHASH_MAX_HAMMING = 6
#: ditto for the embedding sign-LSH query
NEARDUP_PARAMS = {"dim": 64, "n_bits": 3, "seed": 11, "threshold": 0.40}


def lsh_planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """(dim, n_bits) float64 random hyperplanes — the ONE generator shared
    by ``embedding_neardup_pairs`` and the planes fixture, so the engine's
    sign decisions and DuckDB's ``list_inner_product`` signs agree."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def lsh_fixture_dir(sf_dir: str) -> str:
    return os.path.join(LSH_FIXTURE_ROOT,
                        os.path.basename(sf_dir.rstrip("/")))


def _atomic_write(table: pa.Table, path: str) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def ensure_lsh_fixture(sf_dir: str) -> str:
    """Write ``minhash_sigs.parquet`` (doc_id, sig list<u64>[num_perm]) and
    ``simhash.parquet`` (doc_id, simhash u64) for ``sf_dir``'s documents,
    computed with the SAME kernels + params the driver queries use."""
    out = lsh_fixture_dir(sf_dir)
    os.makedirs(out, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    marker = {"src": src, "size": st.st_size, "mtime_ns": st.st_mtime_ns,
              "minhash": MINHASH_PARAMS, "v": 1}
    mpath = os.path.join(out, "_marker.json")
    try:
        with open(mpath) as f:
            if json.load(f) == marker:
                return out
    except (OSError, json.JSONDecodeError, ValueError):
        pass

    from datax_ray.ops.hashing import minhash_batch, simhash_batch

    t = pq.read_table(src, columns=["doc_id", "text"])
    texts = t["text"]  # Arrow column straight into the kernels
    ids = t["doc_id"].combine_chunks().cast(pa.int64())
    num_perm = MINHASH_PARAMS["num_perm"]
    sigs = minhash_batch(texts, num_perm, MINHASH_PARAMS["shingle_k"],
                         MINHASH_PARAMS["seed"])
    sig_col = pa.FixedSizeListArray.from_arrays(
        pa.array(sigs.ravel()), num_perm
    )
    _atomic_write(pa.table({"doc_id": ids, "sig": sig_col}),
                  os.path.join(out, "minhash_sigs.parquet"))
    _atomic_write(pa.table({"doc_id": ids,
                            "simhash": pa.array(simhash_batch(texts))}),
                  os.path.join(out, "simhash.parquet"))
    tmp = mpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, mpath)
    return out


def planes_fixture_path(dim: int | None = None, n_bits: int | None = None,
                        seed: int | None = None) -> str:
    dim = NEARDUP_PARAMS["dim"] if dim is None else dim
    n_bits = NEARDUP_PARAMS["n_bits"] if n_bits is None else n_bits
    seed = NEARDUP_PARAMS["seed"] if seed is None else seed
    return os.path.join(LSH_FIXTURE_ROOT,
                        f"planes_{dim}x{n_bits}_s{seed}.parquet")


def ensure_planes_fixture(dim: int | None = None, n_bits: int | None = None,
                          seed: int | None = None) -> str:
    """Write the (bit, plane list<double>[dim]) hyperplane table — tiny and
    sf-independent; always rewritten (atomic) so stale versions never
    linger."""
    os.makedirs(LSH_FIXTURE_ROOT, exist_ok=True)
    path = planes_fixture_path(dim, n_bits, seed)
    dim = NEARDUP_PARAMS["dim"] if dim is None else dim
    n_bits = NEARDUP_PARAMS["n_bits"] if n_bits is None else n_bits
    seed = NEARDUP_PARAMS["seed"] if seed is None else seed
    planes = lsh_planes(dim, n_bits, seed)  # (dim, n_bits)
    table = pa.table(
        {
            "bit": pa.array(np.arange(n_bits, dtype=np.int32)),
            "plane": pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(planes.T).ravel()), dim
            ),
        }
    )
    _atomic_write(table, path)
    return path
