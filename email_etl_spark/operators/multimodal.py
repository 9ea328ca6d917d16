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


def _decode_image_stub(data: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the payload
    hash. Replace with a real codec (PIL/libvips) in production — the
    call site and batch shape stay identical."""
    import hashlib

    h = hashlib.sha256(data).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 3


def _decode_image(data: bytes) -> tuple[int, int, int, bool]:
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
            w, h, c = _decode_image_stub(data)
            return w, h, c, False
    w, h, c = _decode_image_stub(data)
    return w, h, c, len(data) > 0


def image_features(df: DataFrame, binary_col: str = "content", feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract a binary image column via mapInPandas.

    Output: one row per input, IMAGE_FEATURES_SCHEMA. The feature is a
    deterministic hash-derived vector standing in for an embedding
    model's output (same Arrow plumbing)."""
    import pandas as pd

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            for data in pdf[binary_col]:
                data = bytes(data) if data is not None else b""
                digest = hashlib.sha256(data)
                w, h, c, ok = _decode_image(data)
                feat = [
                    (digest.digest()[i % 32] / 255.0) for i in range(feat_dim)
                ]
                out.append(
                    {
                        "content_hash": digest.hexdigest(),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "decode_ok": ok,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select(binary_col).mapInPandas(batch_fn, schema=IMAGE_FEATURES_SCHEMA)


def size_budget_partitions(df: DataFrame, size_col: str, target_batch_bytes: int = 64 << 20) -> DataFrame:
    """Repartition a binary table so each partition carries roughly
    `target_batch_bytes` of payload — binary rows are wildly variable,
    so row-count partitioning under- or over-fills Arrow batches."""
    total = df.agg(F.sum(size_col)).first()[0] or 0
    n_parts = max(1, int(total / target_batch_bytes) + 1)
    return df.repartition(n_parts)
