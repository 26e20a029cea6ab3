"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as Arrow ``binary`` columns with typed
metadata columns alongside (mime, width/height or sample rate, ...). The
decode / resize / feature-extract kernels would normally come from PIL /
torchaudio / ffmpeg — NOT available in this container — so the codec step
is STUBBED behind ``DeterministicFakeCodec`` (a seeded, content-addressed
fake that produces stable outputs from the bytes themselves) or raises
``NotImplementedError`` when ``strict=True``. Everything Ray-side is real
and tested: the actor-pool stage shape (state built once per actor in
``__init__``), small batch sizes for large payloads, Arrow-native binary
round-trip (kept in ``batch_format="pyarrow"`` — binary columns degrade to
object dtype through pandas), and the output schema contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class DeterministicFakeCodec:
    """Stands in for the real image decoder. Deterministic: features are a
    seeded hash-fold of the payload bytes, so tests and re-runs agree."""

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim

    def decode_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((self.feature_dim * 8) // len(digest) + 1))[: self.feature_dim * 8], dtype=np.uint64)
        return (raw % 1_000_003).astype(np.float32) / 1_000_003.0


class ImageFeatureExtractor:
    """Actor-pool stage: ``map_batches(ImageFeatureExtractor, concurrency=N,
    batch_size=small, num_cpus=1)``. The (expensive) codec/model handle is
    built ONCE per actor here in ``__init__`` — with a real model this is
    where the weights load."""

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.strict = strict
        self.codec = DeterministicFakeCodec(feature_dim) if not strict else None
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real image decode requires PIL/libvips — not in this container"
            )
        payloads = batch["payload"].to_pylist()
        feats = np.stack(
            [
                self.codec.decode_features(p) if p is not None else np.zeros(self.feature_dim, np.float32)
                for p in payloads
            ]
        )
        sizes = pa.array([len(p) if p is not None else 0 for p in payloads], pa.int64())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "n_bytes": sizes,
                "features": pa.array(list(feats), pa.list_(pa.float32(), self.feature_dim)),
            }
        )


def extract_image_features(ds, *, feature_dim: int = 8, concurrency: int = 4,
                           batch_size: int = 64):
    """The canonical multimodal stage: actor pool, small batches (large
    binary payloads → a batch × concurrency must fit worker heap), Arrow
    in/out."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        zero_copy_batch=True,
    )


def synthetic_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows (binary payloads of varying size)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(64, 4096, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["image/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        }
    )
