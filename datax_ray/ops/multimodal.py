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
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def _decode_features_column(codec: DeterministicFakeCodec, payloads: list,
                            feature_dim: int) -> pa.Array:
    """Shared payload→features kernel for the media stages; empty-batch
    safe (Ray Data can deliver zero-row blocks)."""
    if not payloads:
        return pa.array([], pa.list_(pa.float32(), feature_dim))
    feats = np.stack(
        [
            codec.decode_features(p) if p is not None
            else np.zeros(feature_dim, np.float32)
            for p in payloads
        ]
    )
    return pa.array(list(feats), pa.list_(pa.float32(), feature_dim))


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
        sizes = pa.array([len(p) if p is not None else 0 for p in payloads], pa.int64())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "n_bytes": sizes,
                "features": _decode_features_column(
                    self.codec, payloads, self.feature_dim
                ),
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
        # (1, N) autoscaling pool: scales to N actors under load but does
        # not warn (or hold idle actors) when the input has fewer blocks
        concurrency=(1, concurrency),
        num_cpus=1,
        zero_copy_batch=True,
    )


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
    ]
)


class AudioFeatureExtractor:
    """Actor-pool stage for audio: same shape as the image stage (codec
    built once per actor; with torchaudio this is where the model loads).
    The MFCC-ish feature step is the deterministic stub."""

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.strict = strict
        self.codec = DeterministicFakeCodec(feature_dim) if not strict else None
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real audio decode requires torchaudio/ffmpeg — not in this container"
            )
        payloads = batch["payload"].to_pylist()
        sr = batch["sample_rate"].cast(pa.float64())
        n = batch["n_samples"].cast(pa.float64())
        # null sample_rate must yield null duration, not a 1 Hz guess —
        # only sr <= 0 maps to the 1.0 divisor guard
        safe_sr = pc.if_else(
            pc.fill_null(pc.greater(sr, 0.0), False), sr, pa.scalar(1.0)
        )
        safe_sr = pc.if_else(pc.is_valid(sr), safe_sr, pa.scalar(None, pa.float64()))
        duration = pc.round(
            pc.divide(n, safe_sr),
            ndigits=6,
            # SQL round() = half away from zero; Arrow defaults to banker's
            round_mode="half_towards_infinity",
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "duration_s": duration,
                "features": _decode_features_column(
                    self.codec, payloads, self.feature_dim
                ),
            }
        )


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized arange-per-segment)."""
    if len(counts) == 0 or counts.sum() == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    idx = np.arange(int(ends[-1]), dtype=np.int64)
    return idx - np.repeat(ends - counts, counts)


class VideoFrameSampler:
    """Actor-pool EXPLODE stage: each video row → ``min(k, n_frames)``
    evenly-spaced sampled frame rows (frame_idx, ts_ms, frame payload).
    With ffmpeg the per-frame payload would be the decoded frame; the stub
    slices the raw bytes content-addressably so outputs are deterministic.
    Output rows multiply by k — batch sizes stay small for the same heap
    reasons as the other media stages.

    Fully vectorized (np.repeat/arange index math + one gather over the
    Arrow value buffer — no per-row Python loop). The pick rule is
    integer-exact and SQL-expressible (the oracle reproduces it in DuckDB):
        frame_idx(i) = i * (n_frames - 1) // (k' - 1),  k' = min(k, n_frames)
        ts_ms       = floor(frame_idx * 1000 / fps)     (fps ≤ 0/NaN → 1.0)
    Since (n_frames-1)/(k'-1) ≥ 1 the k' picks are strictly increasing —
    no dedup step needed."""

    def __init__(self, k: int = 4, strict: bool = False):
        self.k = k
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real frame decode requires ffmpeg — not in this container"
            )
        empty = pa.table(
            {
                "media_id": pa.array([], pa.int64()),
                "mime": pa.array([], pa.string()),
                "frame_idx": pa.array([], pa.int32()),
                "ts_ms": pa.array([], pa.int64()),
                "frame": pa.array([], pa.binary()),
            }
        )
        if batch.num_rows == 0:
            return empty
        nf = np.asarray(
            pc.fill_null(batch["n_frames"].cast(pa.int64()), 0), dtype=np.int64
        )
        fps = np.asarray(
            pc.fill_null(batch["fps"].cast(pa.float64()), 0.0), dtype=np.float64
        )
        rows = np.flatnonzero(nf > 0)  # frameless/odd-metadata → no rows
        if len(rows) == 0:
            return empty
        k = np.minimum(self.k, nf[rows])
        row_r = np.repeat(rows, k)               # source row per output frame
        i_r = _ranges(k)                         # 0..k'-1 within each video
        nf_r = nf[row_r]
        k_r = np.repeat(k, k)
        frame_idx = np.where(
            k_r == 1, 0, i_r * (nf_r - 1) // np.maximum(k_r - 1, 1)
        )
        rate = fps[row_r]
        rate = np.where(np.isfinite(rate) & (rate > 0), rate, 1.0)
        ts_ms = (frame_idx * 1000.0 / rate).astype(np.int64)  # floor (≥ 0)

        # stub frame payloads: slice [lo, lo+step) mapped PROPORTIONALLY
        # into the blob (always non-empty when the payload is; n_frames may
        # exceed the byte length) — one flat gather over the value buffer
        pay = batch["payload"].combine_chunks()
        blen = np.asarray(
            pc.fill_null(pc.binary_length(pay).cast(pa.int64()), 0),
            dtype=np.int64,
        )
        val_off = np.frombuffer(pay.buffers()[1], dtype=np.int32)[
            pay.offset : pay.offset + len(pay) + 1
        ].astype(np.int64)
        data = np.frombuffer(pay.buffers()[2] or b"", dtype=np.uint8)
        blob_r = blen[row_r]
        step = np.maximum(blob_r // np.maximum(nf_r, 1), 1)
        lo = np.where(blob_r > 0, frame_idx * blob_r // nf_r, 0)
        ln = np.clip(blob_r - lo, 0, step)
        starts = val_off[row_r] + lo
        gathered = data[np.repeat(starts, ln) + _ranges(ln)]
        out_off = np.zeros(len(ln) + 1, dtype=np.int32)
        np.cumsum(ln, out=out_off[1:])
        frame_arr = pa.Array.from_buffers(
            pa.binary(), len(ln),
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(gathered.tobytes())],
        )
        return pa.table(
            {
                "media_id": batch["media_id"].take(pa.array(row_r)),
                "mime": batch["mime"].take(pa.array(row_r)),
                "frame_idx": pa.array(frame_idx.astype(np.int32)),
                "ts_ms": pa.array(ts_ms),
                "frame": frame_arr,
            }
        )


def extract_audio_features(ds, *, feature_dim: int = 8, concurrency: int = 4,
                           batch_size: int = 64):
    return ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        zero_copy_batch=True,
    )


def sample_video_frames(ds, *, k: int = 4, concurrency: int = 4,
                        batch_size: int = 16):
    """Frame sampling explodes rows ×k — batches smaller than the other
    media stages so payload × k × concurrency fits worker heap."""
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        zero_copy_batch=True,
    )


def synthetic_audio_table(n: int, seed: int = 1) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(256, 8192, size=n)]
    sr = rng.choice([8000, 16000, 44100], size=n).astype(np.int32)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["audio/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(sr),
            "n_samples": pa.array((rng.integers(1, 30, n) * sr).astype(np.int64)),
        }
    ).cast(AUDIO_SCHEMA)  # schema IS the input contract; cast catches drift


def synthetic_video_table(n: int, seed: int = 2) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(1024, 16384, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["video/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "n_frames": pa.array(rng.integers(1, 240, n).astype(np.int32)),
            "fps": pa.array(np.full(n, 24.0, np.float32)),
        }
    ).cast(VIDEO_SCHEMA)


#: where the deterministic media fixture parquet lives; the driver's DuckDB
#: oracle reads these same files via read_parquet(), so the engine queries
#: and the SQL run over identical bytes
MEDIA_FIXTURE_DIR = "/tmp/datax_ray_media"
_FIXTURE_SPEC = {
    # file → (generator, n, seed); keep in lockstep with the q_multimodal_*
    # queries AND the multimodal_* ORACLES
    "media.parquet": ("media", 512, 42),
    "audio.parquet": ("audio", 512, 43),
    "video.parquet": ("video", 256, 44),
}


def ensure_media_fixture(out_dir: str = MEDIA_FIXTURE_DIR) -> str:
    """Write the synthetic media/audio/video tables to parquet (atomic,
    idempotent — content is deterministic). Called from both the query
    side and the oracle side so either can run first."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    gens = {
        "media": synthetic_media_table,
        "audio": synthetic_audio_table,
        "video": synthetic_video_table,
    }
    for name, (kind, n, seed) in _FIXTURE_SPEC.items():
        # always rewrite (atomic; content deterministic and tiny) so a
        # stale fixture from an older code version can never linger
        path = os.path.join(out_dir, name)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(gens[kind](n, seed=seed), tmp)
        os.replace(tmp, path)
    return out_dir


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
    ).cast(MEDIA_SCHEMA)
