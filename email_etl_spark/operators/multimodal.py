"""Multimodal column plumbing (SURVEY.md §2.J).

Attachments / images / audio / video travel as opaque `binary`
columns with typed metadata (schema.py::ATTACHMENT_SCHEMA). The
Spark-side mechanics — schema, partition sizing, Arrow batch shape,
UDF signatures — are real and tested. Codec work activates Pillow
when it is importable and otherwise falls back to a deterministic
stub (this container ships no image/audio libraries), so installing
the real decoder upgrades the operator in place — same mapInPandas,
same schema, no plan change.

Scale notes: binary payloads dominate row size, so the decode pass
repartitions by size budget (`target_batch_bytes`) rather than row
count, and metadata-only operations never deserialize the payload
(column pruning keeps the binary column out of the scan entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

try:  # real decoder if ever present; the container has no PIL
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _decode_image_stub(data: bytes, _digest: bytes | None = None) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the payload
    hash. Replace with a real codec (PIL/libvips) in production — the
    call site and batch shape stay identical. Callers that already
    hold the sha256 digest pass it via `_digest` so the payload is
    hashed once per row, not once per consumer."""
    import hashlib

    h = _digest if _digest is not None else hashlib.sha256(data).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 3


def _decode_image(data: bytes, _digest: bytes | None = None) -> tuple[int, int, int, bool]:
    """(width, height, channels, decode_ok). Uses PIL when available;
    a payload PIL can't parse — or any environment without PIL — falls
    back to the deterministic stub so the pipeline never aborts on a
    bad blob (decode failures are data, not errors, at corpus scale)."""
    if HAS_PIL and data:
        import io

        try:
            with Image.open(io.BytesIO(data)) as img:
                return img.width, img.height, len(img.getbands()), True
        except Exception:
            w, h, c = _decode_image_stub(data, _digest)
            return w, h, c, False
    w, h, c = _decode_image_stub(data, _digest)
    return w, h, c, len(data) > 0


def image_features(df: DataFrame, binary_col: str = "content", feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract a binary image column via mapInPandas.

    Output: one row per input, IMAGE_FEATURES_SCHEMA. The feature is a
    deterministic hash-derived vector standing in for an embedding
    model's output (same Arrow plumbing)."""
    import pandas as pd

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        cols = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]
        for pdf in batches:
            # column-wise construction (guide §4.2): one dict-of-lists
            # frame instead of a Python dict per row, and the payload
            # is hashed ONCE per row — _decode_image* receives the
            # digest, where the old path re-hashed inside the stub.
            hashes, widths, heights, chans, oks, feats = [], [], [], [], [], []
            for data in pdf[binary_col]:
                data = bytes(data) if data is not None else b""
                raw = hashlib.sha256(data).digest()
                w, h, c, ok = _decode_image(data, _digest=raw)
                hashes.append(raw.hex())
                widths.append(w)
                heights.append(h)
                chans.append(c)
                oks.append(ok)
                feats.append([raw[i % 32] / 255.0 for i in range(feat_dim)])
            yield pd.DataFrame(
                {
                    "content_hash": hashes,
                    "width": widths,
                    "height": heights,
                    "channels": chans,
                    "decode_ok": oks,
                    "feature": feats,
                },
                columns=cols,
            )

    return df.select(binary_col).mapInPandas(batch_fn, schema=IMAGE_FEATURES_SCHEMA)


def size_budget_partitions(df: DataFrame, size_col: str, target_batch_bytes: int = 64 << 20) -> DataFrame:
    """Repartition a binary table so each partition carries roughly
    `target_batch_bytes` of payload — binary rows are wildly variable,
    so row-count partitioning under- or over-fills Arrow batches."""
    total = df.agg(F.sum(size_col)).first()[0] or 0
    n_parts = max(1, int(total / target_batch_bytes) + 1)
    return df.repartition(n_parts)


# ---------------------------------------------------------------------------
# Image resize / audio features / video frame sampling — the rest of
# the multimodal pass family. Decode/transcode steps are STUBS (this
# container ships no codec libraries): metadata comes deterministically
# from the payload hash, so tests are exact and a real codec
# (PIL/ffmpeg) drops into the same mapInPandas seam with no plan
# change. The Spark-side mechanics — schemas, Arrow batch shapes,
# one-to-many frame explode, size-budget partitioning — are real.
# ---------------------------------------------------------------------------

IMAGE_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("rms_db", T.FloatType()),
    ]
)

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def image_resize(df: DataFrame, binary_col: str = "content", max_px: int = 256) -> DataFrame:
    """Aspect-preserving thumbnail pass. STUB transcode: output bytes
    are a deterministic digest-derived payload; real PIL `thumbnail()`
    slots into `shrink` unchanged."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def shrink(w: int, h: int) -> tuple[int, int]:
            s = max(w, h)
            if s <= max_px:
                return w, h
            return max(1, w * max_px // s), max(1, h * max_px // s)

        for pdf in batches:
            out = []
            for data in pdf[binary_col]:
                data = bytes(data) if data is not None else b""
                digest = hashlib.sha256(data)
                w, h, _c, _ok = _decode_image(data)
                ow, oh = shrink(w, h)
                out.append(
                    {
                        "content_hash": digest.hexdigest(),
                        "src_width": w,
                        "src_height": h,
                        "out_width": ow,
                        "out_height": oh,
                        # stub transcode: hash-derived bytes sized to the
                        # thumbnail's pixel count (bounded, deterministic)
                        "content": (digest.digest() * ((ow * oh * 3) // 32 + 1))[: ow * oh * 3],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_RESIZE_SCHEMA.fields])

    return df.select(binary_col).mapInPandas(batch_fn, schema=IMAGE_RESIZE_SCHEMA)


def audio_features(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Audio metadata/loudness pass. STUB decode: duration/rate/
    channels/loudness derive from the payload hash; a real decoder
    (soundfile/ffmpeg) replaces `fake_meta` only."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_meta(h: bytes, n: int) -> tuple[int, int, int, float]:
            duration = 500 + int.from_bytes(h[2:5], "big") % 600_000
            rate = (8000, 16000, 22050, 44100, 48000)[h[5] % 5]
            chans = 1 + h[6] % 2
            rms = -60.0 + (h[7] / 255.0) * 57.0
            return duration, rate, chans, rms

        for pdf in batches:
            out = []
            for data in pdf[binary_col]:
                data = bytes(data) if data is not None else b""
                digest = hashlib.sha256(data)
                h = digest.digest()
                dur, rate, ch, rms = fake_meta(h, len(data))
                out.append(
                    {
                        "content_hash": digest.hexdigest(),
                        "duration_ms": dur,
                        "sample_rate": rate,
                        "n_channels": ch,
                        "rms_db": rms,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.select(binary_col).mapInPandas(batch_fn, schema=AUDIO_FEATURES_SCHEMA)


def video_frame_sample(
    df: DataFrame, binary_col: str = "content", every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """One-to-many frame sampling: each video row yields
    ceil(duration/every_ms) frame rows (capped). STUB decode: duration
    and frame bytes are hash-derived; a real ffmpeg seek-and-decode
    replaces the inner loop. The one-to-many Arrow batch shape — the
    part that matters for Spark — is real: output batches are larger
    than input batches and downstream ops see one row per frame."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for data in pdf[binary_col]:
                data = bytes(data) if data is not None else b""
                digest = hashlib.sha256(data)
                h = digest.digest()
                duration_ms = 500 + int.from_bytes(h[2:5], "big") % 600_000
                n_frames = min(max_frames, (duration_ms + every_ms - 1) // every_ms)
                for i in range(n_frames):
                    fh = hashlib.sha256(h + i.to_bytes(4, "big")).digest()
                    out.append(
                        {
                            "content_hash": digest.hexdigest(),
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame": fh,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields])

    return df.select(binary_col).mapInPandas(batch_fn, schema=VIDEO_FRAME_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("energy", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def audio_frame_energies(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Per-frame energy pass: each clip yields one row per 100 ms
    frame with an integer energy level — the input to VAD
    segmentation. STUB decode: frame count (8..12) and energies
    (0..255) derive from the payload hash; a real decoder replaces
    the hash reads with windowed RMS over PCM samples only — the
    one-to-many Arrow seam, schema and partitioning stay identical."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for data in pdf[binary_col]:
                data = bytes(data) if data is not None else b""
                digest = hashlib.sha256(data)
                h = digest.digest()
                n_frames = 8 + h[8] % 5
                for j in range(n_frames):
                    out.append(
                        {
                            "content_hash": digest.hexdigest(),
                            "frame_idx": j,
                            "energy": h[9 + j],
                            "n_frames": n_frames,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FRAME_SCHEMA.fields])

    return df.select(binary_col).mapInPandas(batch_fn, schema=AUDIO_FRAME_SCHEMA)
