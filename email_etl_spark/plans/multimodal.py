"""Multimodal registry queries (SURVEY.md §2.J).

The decode passes in operators/multimodal.py are deterministic
hash-derived stubs (this container ships no codec libraries), which
makes them *oracle-checkable*: a DuckDB twin reconstructs the stub's
width/height arithmetic from the sha256 hex digest, so the whole
Arrow seam — binary column in, mapInPandas batch_fn, typed feature
schema out — is hash-verified cross-engine, not just pytest-smoked.

The binary corpus is derived inside the query (UTF-8 payload bytes of
the documents table) so both engines see identical blobs without any
side files. A real codec swaps into _decode_image without changing
the plan; only the oracle twin would then need the real library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.io import load_table, present_sorted
from email_etl_spark.operators.multimodal import image_features
from email_etl_spark.plans.registry import register

# hex-pair → byte value, in pure SQL (DuckDB's sha256 returns hex)
_HEX = "0123456789abcdef"


def _byte_sql(sha: str, i: int) -> str:
    """Byte i (0-based) of a hex digest column, as an integer."""
    c1 = f"substr({sha}, {2 * i + 1}, 1)"
    c2 = f"substr({sha}, {2 * i + 2}, 1)"
    return f"(16 * (strpos('{_HEX}', {c1}) - 1) + strpos('{_HEX}', {c2}) - 1)"


@register(
    "image_decode_stats",
    headline=True,
    oracle=f"""
WITH b AS (SELECT text, sha256(text) AS sha FROM documents),
wh AS (
  SELECT sha,
         16 + ({_byte_sql('sha', 0)} % 240) AS width,
         16 + ({_byte_sql('sha', 1)} % 240) AS height,
         length(text) > 0 AS decode_ok
  FROM b
)
SELECT CAST(width // 64 AS BIGINT) AS width_bucket,
       COUNT(*) AS n_images,
       CAST(SUM(CASE WHEN decode_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       COUNT(DISTINCT sha) AS n_uniq,
       MIN(sha) AS min_hash,
       CAST((20000 * SUM(height) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
           AS avg_height_e4
FROM wh GROUP BY 1 ORDER BY 1
""",
    doc=(
        "Image-decode QA rollup over a binary column — runs the REAL "
        "operators/multimodal.py mapInPandas decode pass (Arrow "
        "batches, typed feature schema) and rolls up width-bucket "
        "counts, decode success, distinct payload hashes, and the "
        "mean height as a half-up e4 integer (no double output). The oracle reconstructs the deterministic stub codec "
        "from the sha256 hex digest, so the whole multimodal seam is "
        "hash-verified cross-engine. Payload bytes never reach the "
        "aggregation (the UDF projects metadata only); at corpus "
        "scale the decode stage is the only pass that touches blobs."
    ),
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(F.encode(F.col("text"), "UTF-8").alias("content"))
    feats = image_features(blobs)
    return (
        feats.groupBy(F.expr("width div 64").cast("bigint").alias("width_bucket"))
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).cast("bigint").alias("n_ok"),
            F.countDistinct("content_hash").alias("n_uniq"),
            F.min("content_hash").alias("min_hash"),
            F.expr("(20000L * sum(height) + count(*)) div (2L * count(*))")
            .cast("bigint")
            .alias("avg_height_e4"),
        )
        # bucket-sized result: see io.present_sorted
        .transform(lambda d: present_sorted(d, "width_bucket"))
    )


def _int3_sql(sha: str, i: int) -> str:
    """Big-endian 3-byte integer at byte offset i of a hex digest."""
    return (
        f"(65536 * {_byte_sql(sha, i)} + 256 * {_byte_sql(sha, i + 1)}"
        f" + {_byte_sql(sha, i + 2)})"
    )


@register(
    "audio_meta_stats",
    oracle=f"""
WITH b AS (SELECT text, sha256(text) AS sha FROM documents),
m AS (
  SELECT sha,
         500 + ({_int3_sql('sha', 2)} % 600000) AS duration_ms,
         CASE {_byte_sql('sha', 5)} % 5
              WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
              WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
         1 + ({_byte_sql('sha', 6)} % 2) AS n_channels,
         ROUND(-60.0 + (CAST({_byte_sql('sha', 7)} AS DOUBLE) / 255.0) * 57.0, 3) AS rms_db
  FROM b
)
SELECT sample_rate,
       COUNT(*) AS n_clips,
       CAST(SUM(duration_ms) AS BIGINT) AS total_ms,
       CAST(SUM(CASE WHEN n_channels = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_stereo,
       MIN(rms_db) AS min_rms,
       MAX(rms_db) AS max_rms
FROM m GROUP BY sample_rate ORDER BY sample_rate
""",
    doc=(
        "Audio-metadata QA rollup through the REAL mapInPandas audio "
        "pass (operators/multimodal.py::audio_features): per-sample-"
        "rate clip counts, total duration, stereo share, loudness "
        "range. The oracle reconstructs the deterministic stub codec "
        "byte-for-byte from the sha256 hex digest (3-byte big-endian "
        "duration, table-indexed rate, float rms recomputed with the "
        "same IEEE op order, rounded before aggregation). Exercises "
        "the Arrow seam + a partial-aggregated rollup; blobs never "
        "reach the shuffle."
    ),
)
def audio_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.operators.multimodal import audio_features

    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(F.encode(F.col("text"), "UTF-8").alias("content"))
    feats = audio_features(blobs)
    return (
        feats.groupBy("sample_rate")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum("duration_ms").cast("bigint").alias("total_ms"),
            F.sum(F.when(F.col("n_channels") == 2, 1).otherwise(0)).cast("bigint").alias("n_stereo"),
            F.min(F.round(F.col("rms_db").cast("double"), 3)).alias("min_rms"),
            F.max(F.round(F.col("rms_db").cast("double"), 3)).alias("max_rms"),
        )
        .orderBy("sample_rate")
    )


@register(
    "video_frame_stats",
    oracle=f"""
WITH b AS (SELECT text, sha256(text) AS sha FROM documents),
m AS (
  SELECT DISTINCT sha,
         LEAST(16, CAST(CEIL(CAST(500 + ({_int3_sql('sha', 2)} % 600000) AS DOUBLE) / 1000.0) AS BIGINT)) AS n_frames
  FROM b
)
SELECT n_frames,
       COUNT(*) AS n_videos,
       CAST((n_frames - 1) * 1000 AS BIGINT) AS last_ts_ms,
       COUNT(DISTINCT sha) AS n_uniq
FROM m GROUP BY n_frames ORDER BY n_frames
""",
    doc=(
        "Video frame-sampling QA through the REAL one-to-many "
        "mapInPandas pass (operators/multimodal.py::video_frame_sample "
        "— output batches larger than input batches, one row per "
        "sampled frame). Frames are regrouped per video and the "
        "distribution of frames-per-video, the last frame timestamp, "
        "and distinct payloads are all verified against an oracle "
        "that derives the stub's frame count arithmetic from the "
        "digest. Two shuffles: per-video regroup, distribution rollup."
    ),
)
def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.operators.multimodal import video_frame_sample

    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(F.encode(F.col("text"), "UTF-8").alias("content"))
    # duplicate payloads share a content_hash and collapse into one
    # group here, so frame cardinality must be distinct-counted (the
    # oracle likewise DISTINCTs per sha) — identical videos are one
    # video for QA purposes
    frames = video_frame_sample(blobs)
    per_video = frames.groupBy("content_hash").agg(
        F.countDistinct("frame_idx").alias("n_frames"), F.max("ts_ms").alias("last_ts")
    )
    return (
        per_video.groupBy("n_frames")
        .agg(
            F.count("*").alias("n_videos"),
            F.max("last_ts").cast("bigint").alias("last_ts_ms"),
            F.countDistinct("content_hash").alias("n_uniq"),
        )
        .orderBy("n_frames")
    )


RESIZE_TARGET = 224


@register(
    "image_resize_plan",
    oracle=f"""
WITH b AS (SELECT text, sha256(text) AS sha FROM documents),
wh AS (
  SELECT 16 + ({_byte_sql('sha', 0)} % 240) AS width,
         16 + ({_byte_sql('sha', 1)} % 240) AS height
  FROM b
),
p AS (
  SELECT width, height,
         CASE WHEN width > height THEN 'landscape'
              WHEN width < height THEN 'portrait'
              ELSE 'square' END AS orientation,
         width * {RESIZE_TARGET} // GREATEST(width, height) AS out_w,
         height * {RESIZE_TARGET} // GREATEST(width, height) AS out_h,
         CASE WHEN GREATEST(width, height) < {RESIZE_TARGET} THEN 1 ELSE 0 END AS upscaled
  FROM wh
)
SELECT orientation,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(upscaled) AS BIGINT) AS n_upscaled,
       CAST(SUM(out_w) * 100 // COUNT(*) AS BIGINT) AS mean_out_w_centi,
       CAST(SUM(out_h) * 100 // COUNT(*) AS BIGINT) AS mean_out_h_centi,
       CAST(SUM(out_w * out_h) AS BIGINT) AS total_out_pixels
FROM p GROUP BY orientation ORDER BY orientation
""",
    doc=(
        "Aspect-preserving resize plan to a 224-box over the decoded "
        "image metadata: per orientation, output dimensions (pure "
        "integer fit arithmetic — w·224 div max(w,h), truncating in "
        "BOTH engines), upscale counts and total output pixels — the "
        "preprocessing budget a vision-training pipeline computes "
        "before launching the actual resize pass (SURVEY §2.J). Runs "
        "the REAL mapInPandas decode seam (operators/multimodal.py) "
        "for width/height; the resize math itself is JVM column "
        "arithmetic — blobs are decoded once and never re-read."
    ),
)
def image_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(F.encode(F.col("text"), "UTF-8").alias("content"))
    feats = image_features(blobs)
    m = F.greatest(F.col("width"), F.col("height"))
    p = feats.select(
        F.when(F.col("width") > F.col("height"), "landscape")
        .when(F.col("width") < F.col("height"), "portrait")
        .otherwise("square")
        .alias("orientation"),
        F.expr(f"width * {RESIZE_TARGET} div greatest(width, height)").alias("out_w"),
        F.expr(f"height * {RESIZE_TARGET} div greatest(width, height)").alias("out_h"),
        F.when(m < RESIZE_TARGET, 1).otherwise(0).alias("upscaled"),
    )
    return (
        p.groupBy("orientation")
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.sum("upscaled").cast("bigint").alias("n_upscaled"),
            F.expr("sum(out_w) * 100L div count(*)").cast("bigint").alias("mean_out_w_centi"),
            F.expr("sum(out_h) * 100L div count(*)").cast("bigint").alias("mean_out_h_centi"),
            F.sum(F.col("out_w") * F.col("out_h")).cast("bigint").alias("total_out_pixels"),
        )
        .orderBy("orientation")
    )


# shot-boundary detection: hamming distance >= SHOT_BOUND of 32 sig
# bits between consecutive frames flags a cut (a random-signature
# pair averages 16; >= 20 fires on ~11% of gaps)
SHOT_BOUND = 20


@register(
    "shot_boundaries",
    oracle=f"""
WITH b AS (SELECT DISTINCT text FROM documents),
v AS (SELECT sha256(text) AS sha FROM b),
m AS (SELECT sha,
             LEAST(16, CAST(CEIL(CAST(500 + {_int3_sql('sha', 2)} % 600000 AS DOUBLE) / 1000.0) AS BIGINT)) AS n_frames
      FROM v),
f AS (SELECT m.sha, gs.i
      FROM m CROSS JOIN (SELECT unnest(range(16)) AS i) gs
      WHERE gs.i < m.n_frames),
s AS (SELECT sha, i, ('0x' || substr(sha, 2 * (i % 28) + 1, 8))::BIGINT AS sig FROM f),
g AS (SELECT sha, sig, LAG(sig) OVER (PARTITION BY sha ORDER BY i) AS prev FROM s),
pv AS (SELECT sha,
              CAST(COUNT(prev) AS BIGINT) AS n_gaps,
              CAST(COALESCE(SUM(bit_count(xor(sig, prev))), 0) AS BIGINT) AS sum_ham,
              CAST(SUM(CASE WHEN bit_count(xor(sig, prev)) >= {SHOT_BOUND} THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
              MAX(bit_count(xor(sig, prev))) AS max_ham
       FROM g GROUP BY sha)
SELECT n_boundaries,
       CAST(COUNT(*) AS BIGINT) AS n_videos,
       CAST(SUM(n_gaps) AS BIGINT) AS total_gaps,
       CAST(CASE WHEN SUM(n_gaps) > 0 THEN SUM(sum_ham) * 100 // SUM(n_gaps) ELSE 0 END AS BIGINT) AS mean_hamming_centi,
       CAST(COALESCE(MAX(max_ham), 0) AS BIGINT) AS max_hamming
FROM pv GROUP BY n_boundaries ORDER BY n_boundaries
""",
    doc=(
        "Shot-boundary detection over sampled video frames (SURVEY "
        "§2.J — the PySceneDetect-style cut finder a video-training "
        "pipeline runs before clip extraction). Payloads are deduped "
        "BEFORE the one-to-many frame expansion — the scale-correct "
        "order: at 100 TB you dedupe videos, then decode frames, "
        "never the reverse. Runs the REAL mapInPandas frame-sample "
        "seam (operators/multimodal.py::video_frame_sample); each "
        "frame carries a stub 32-bit perceptual hash derived from the "
        "video digest + frame index (a real pHash drops into the same "
        "column), consecutive-frame hamming distance comes from ONE "
        "user-video window sort reused by the per-video rollup, and a "
        "cut fires at >= SHOT_BOUND differing bits. Output: the "
        "per-video boundary-count distribution with integer centi "
        "mean gap distances — exact in both engines (no floats)."
    ),
)
def shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.operators.multimodal import video_frame_sample

    docs = load_table(spark, sf_dir, "documents")
    # dedupe payloads first: duplicate videos must not double-count
    # boundaries, and deduping before the 16x frame expansion is 16x
    # cheaper than after
    blobs = docs.select("text").distinct().select(F.encode(F.col("text"), "UTF-8").alias("content"))
    frames = video_frame_sample(blobs)
    # stub pHash: 4 digest bytes at a frame-dependent offset (conv is
    # JVM-side; the frame blob itself is untouched after sampling)
    s = frames.select(
        "content_hash",
        "frame_idx",
        F.expr("cast(conv(substr(content_hash, 2 * (frame_idx % 28) + 1, 8), 16, 10) as bigint)").alias("sig"),
    )
    w = Window.partitionBy("content_hash").orderBy("frame_idx")
    g = s.withColumn("prev", F.lag("sig").over(w))
    ham = F.bit_count(F.expr("sig ^ prev"))
    per_video = g.groupBy("content_hash").agg(
        F.count("prev").cast("bigint").alias("n_gaps"),
        F.coalesce(F.sum(ham), F.lit(0)).cast("bigint").alias("sum_ham"),
        F.sum(F.when(ham >= SHOT_BOUND, 1).otherwise(0)).cast("bigint").alias("n_boundaries"),
        F.max(ham).alias("max_ham"),
    )
    return (
        per_video.groupBy("n_boundaries")
        .agg(
            F.count("*").cast("bigint").alias("n_videos"),
            F.sum("n_gaps").cast("bigint").alias("total_gaps"),
            F.when(F.sum("n_gaps") > 0, F.expr("sum(sum_ham) * 100 div sum(n_gaps)"))
            .otherwise(0)
            .cast("bigint")
            .alias("mean_hamming_centi"),
            F.coalesce(F.max("max_ham"), F.lit(0)).cast("bigint").alias("max_hamming"),
        )
        .orderBy("n_boundaries")
    )


# ---------------------------------------------------------------------------
# image_ahash_dupes — perceptual-hash near-dup detection over images.
# ---------------------------------------------------------------------------

AHASH_BLOCKS = 4  # 4 x 8-bit blocks; pigeonhole guarantees recall at ham <= 2
AHASH_HAM_MAX = 2
_AHASH_COMBOS = [(i, j) for i in range(AHASH_BLOCKS) for j in range(AHASH_BLOCKS) if i < j]


def _ahash_block_sql(sha: str, j: int) -> str:
    """8-bit block j of the 32-bit average-hash: bit k is the high bit
    of digest byte 8j+k (hex digit at 1-based position 2*(8j+k)+1)."""
    terms = []
    for k in range(8):
        digit = f"strpos('{_HEX}', substr({sha}, {2 * (8 * j + k) + 1}, 1)) - 1"
        terms.append(f"(CASE WHEN {digit} >= 8 THEN {2 ** (7 - k)} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _ahash_oracle() -> str:
    blocks = ", ".join(f"{_ahash_block_sql('sha', j)} AS b{j}" for j in range(AHASH_BLOCKS))
    hexpr = " + ".join(
        f"CAST(b{j} AS BIGINT) * {256 ** (AHASH_BLOCKS - 1 - j)}"
        for j in range(AHASH_BLOCKS)
    )
    buckets = "\n  UNION ALL ".join(
        f"SELECT {ci} AS combo, b{i} * 256 + b{j} AS bkey, doc_id, h FROM ah"
        for ci, (i, j) in enumerate(_AHASH_COMBOS)
    )
    return f"""
WITH raw AS (SELECT doc_id, sha256(text) AS sha FROM documents),
bl AS (SELECT doc_id, {blocks} FROM raw),
ah AS (SELECT doc_id, CAST({hexpr} AS BIGINT) AS h, b0, b1, b2, b3 FROM bl),
bk AS ({buckets}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.h AS ha, b.h AS hb
  FROM bk a JOIN bk b ON a.combo = b.combo AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
v AS (
  SELECT doc_a, doc_b, bit_count(xor(ha, hb)) AS ham
  FROM cand WHERE bit_count(xor(ha, hb)) <= {AHASH_HAM_MAX}
)
SELECT CAST(ham AS BIGINT) AS ham,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(doc_a) AS BIGINT) AS example_doc
FROM v GROUP BY ham ORDER BY ham
"""


@register(
    "image_ahash_dupes",
    oracle=_ahash_oracle(),
    doc=(
        "Perceptual-hash near-duplicate detection over the image "
        "corpus: a 32-bit average-hash (one bit per digest byte of "
        "the stub codec — a real aHash swaps in per-pixel "
        "luminance-vs-mean bits without changing the plan), then the "
        "dedup_simhash pigeonhole — 4 8-bit blocks, any pair within "
        "Hamming 2 must agree on one of the 6 block pairs, so "
        "candidates come from (combo, block-pair) bucket equality "
        "joins, never an all-pairs scan; bit_count(xor) verifies "
        "exactly. Near-identical images (re-encodes, crops, "
        "thumbnails) cluster at ham 0-2 while the corpus only ever "
        "shuffles its 6-row-per-image bucket projection "
        "(SURVEY §2.J+E)."
    ),
)
def image_ahash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sha = F.sha2(F.col("text"), 256)

    def block(j: int):
        b = None
        for k in range(8):
            digit = F.conv(F.substring(sha, 2 * (8 * j + k) + 1, 1), 16, 10).cast("int")
            term = F.when(digit >= 8, 2 ** (7 - k)).otherwise(0)
            b = term if b is None else b + term
        return b

    bl = docs.select(
        "doc_id", *[block(j).alias(f"b{j}") for j in range(AHASH_BLOCKS)]
    )
    hexpr = None
    for j in range(AHASH_BLOCKS):
        term = F.col(f"b{j}").cast("bigint") * (256 ** (AHASH_BLOCKS - 1 - j))
        hexpr = term if hexpr is None else hexpr + term
    ah = bl.select("doc_id", hexpr.cast("bigint").alias("h"), "b0", "b1", "b2", "b3")
    bk = ah.select(
        "doc_id",
        "h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(ci).alias("combo"),
                    (F.col(f"b{i}") * 256 + F.col(f"b{j}")).alias("bkey"),
                )
                for ci, (i, j) in enumerate(_AHASH_COMBOS)
            ])
        ).alias("kb"),
    ).select("doc_id", "h", F.col("kb.combo").alias("combo"), F.col("kb.bkey").alias("bkey"))
    a = bk.select(
        F.col("combo"), F.col("bkey"), F.col("doc_id").alias("doc_a"), F.col("h").alias("ha")
    )
    b = bk.select(
        F.col("combo").alias("combo_b"),
        F.col("bkey").alias("bkey_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("h").alias("hb"),
    )
    cand = (
        a.join(
            b,
            (F.col("combo") == F.col("combo_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    v = cand.select("doc_a", "doc_b", ham.alias("ham")).where(
        F.col("ham") <= AHASH_HAM_MAX
    )
    return (
        v.groupBy(F.col("ham").cast("bigint").alias("ham"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.min("doc_a").cast("bigint").alias("example_doc"),
        )
        .orderBy("ham")
    )


def _frame_byte_sql() -> str:
    """Byte (9 + frame_idx) of the hex digest, as an integer — the
    dynamic-offset variant of _byte_sql."""
    c1 = f"substr(sha, 19 + 2 * frame_idx, 1)"
    c2 = f"substr(sha, 20 + 2 * frame_idx, 1)"
    return f"(16 * (strpos('{_HEX}', {c1}) - 1) + strpos('{_HEX}', {c2}) - 1)"


VAD_THRESHOLD = 64  # energy >= threshold -> voiced frame


@register(
    "audio_vad_segments",
    oracle=f"""
WITH b AS (SELECT DISTINCT text FROM documents),
s AS (SELECT sha256(text) AS sha FROM b),
n AS (SELECT sha, 8 + ({_byte_sql('sha', 8)} % 5) AS n_frames FROM s),
f AS (
  SELECT n.sha, j.i AS frame_idx, n.n_frames,
         {_frame_byte_sql()} AS energy
  FROM n CROSS JOIN UNNEST(range(0, 12)) AS j(i)
  WHERE j.i < n.n_frames
),
v AS (
  SELECT sha, frame_idx, n_frames,
         frame_idx - ROW_NUMBER() OVER (PARTITION BY sha ORDER BY frame_idx)
           AS island
  FROM f WHERE energy >= {VAD_THRESHOLD}
),
per_clip AS (
  SELECT n.sha, n.n_frames,
         COUNT(DISTINCT v.island) AS n_segments,
         COUNT(v.frame_idx) AS n_voiced
  FROM n LEFT JOIN v ON v.sha = n.sha
  GROUP BY n.sha, n.n_frames
)
SELECT CAST(n_segments AS BIGINT) AS n_segments,
       COUNT(*) AS n_clips,
       CAST(SUM(n_voiced) * 10000 // SUM(n_frames) AS BIGINT) AS voiced_bps,
       CASE WHEN n_segments > 0
            THEN CAST((20000 * SUM(n_voiced) + n_segments * COUNT(*))
                      // (2 * n_segments * COUNT(*)) AS BIGINT)
            END AS avg_seg_frames_e4
FROM per_clip GROUP BY n_segments ORDER BY n_segments
""",
    doc=(
        "Voice-activity segmentation over the audio corpus — the "
        "pre-ASR chunking pass every speech pipeline runs (only "
        "voiced segments are worth transcribing; segment shape drives "
        "batch packing). The decode seam emits one row per 100 ms "
        "frame (operators/multimodal.audio_frame_energies — "
        "one-to-many mapInPandas, STUB energies hash-derived so the "
        "oracle reconstructs them from the sha hex), then segmentation "
        "is PURE SPARK: voiced frames collapse to segments by the "
        "gaps-and-islands window (frame_idx minus row_number), i.e. "
        "the activity_streaks trick at 100 ms granularity. Clips "
        "dedupe by payload first (DISTINCT), so identity needs no "
        "side channel. Report: clip count, voiced share (exact bps) "
        "and mean segment length as a half-up e4 integer per "
        "segment-count bucket — no double output (SURVEY §2.J)."
    ),
)
def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.operators.multimodal import audio_frame_energies

    docs = load_table(spark, sf_dir, "documents")
    clips = docs.select(F.encode(F.col("text"), "UTF-8").alias("content")).distinct()
    frames = audio_frame_energies(clips)
    w = Window.partitionBy("content_hash").orderBy("frame_idx")
    v = frames.where(F.col("energy") >= VAD_THRESHOLD).select(
        "content_hash",
        "frame_idx",
        (F.col("frame_idx") - F.row_number().over(w)).alias("island"),
    )
    base = frames.groupBy("content_hash").agg(F.max("n_frames").alias("n_frames"))
    seg = v.groupBy("content_hash").agg(
        F.countDistinct("island").alias("n_segments"),
        F.count("*").alias("n_voiced"),
    )
    per_clip = base.join(seg, "content_hash", "left").select(
        "n_frames",
        F.coalesce(F.col("n_segments"), F.lit(0)).alias("n_segments"),
        F.coalesce(F.col("n_voiced"), F.lit(0)).alias("n_voiced"),
    )
    return (
        per_clip.select(
            F.col("n_segments").cast("bigint").alias("n_segments"),
            "n_voiced",
            "n_frames",
        )
        .groupBy("n_segments")
        .agg(
            F.count("*").alias("n_clips"),
            F.expr("sum(n_voiced) * 10000 div sum(n_frames)")
            .cast("bigint")
            .alias("voiced_bps"),
            F.sum("n_voiced").alias("_sv"),
        )
        .select(
            "n_segments",
            "n_clips",
            "voiced_bps",
            F.when(
                F.col("n_segments") > 0,
                F.expr(
                    "(20000L * _sv + n_segments * n_clips)"
                    " div (2L * n_segments * n_clips)"
                ).cast("bigint"),
            ).alias("avg_seg_frames_e4"),
        )
        .orderBy("n_segments")
    )


_PAYLOAD_BUDGET = 64 * 1024  # target payload bytes per partition
_PP_BUCKET = 1024            # ids per prefix-sum bucket


@register(
    "payload_partition_plan",
    oracle=f"""
WITH sz AS (SELECT doc_id, n_chars FROM documents),
c AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM sz
),
a AS (
  SELECT doc_id, n_chars, (cum - n_chars) // {_PAYLOAD_BUDGET} AS part FROM c
)
SELECT CAST(part AS BIGINT) AS part,
       CAST(COUNT(*) AS BIGINT) AS n_clips,
       CAST(SUM(n_chars) AS BIGINT) AS payload_bytes,
       CAST(SUM(n_chars) * 10000 // {_PAYLOAD_BUDGET} AS BIGINT) AS fill_bps
FROM a GROUP BY part ORDER BY part
""",
    doc=(
        "Byte-budgeted partition layout for the binary corpus — the "
        "write-side plan behind operators/multimodal."
        "size_budget_partitions: binary rows are wildly variable, so "
        "row-count partitioning under/over-fills Arrow batches; this "
        "assigns each clip to the partition where its payload STARTS "
        "under a 64 KiB budget and reports per-partition fill in "
        "exact bps (the 1-D size-weighted cousin of "
        "range_partition_plan). The prefix sum is TWO-LEVEL "
        "(shard_plan's discipline): per-1024-id bucket subtotals roll "
        "up in a bucket-cardinality window, exclusive offsets "
        "broadcast back, and the in-bucket window is bounded by the "
        "bucket width — no serial corpus-length window at any scale. "
        "Pure integer div both engines (SURVEY §2.J)."
    ),
)
def payload_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sz = docs.select("doc_id", "n_chars", F.expr(f"doc_id div {_PP_BUCKET}").alias("bk"))
    bsum = sz.groupBy("bk").agg(F.sum("n_chars").alias("bs"))
    wb = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offs = bsum.select(
        "bk", (F.sum("bs").over(wb) - F.col("bs")).alias("off")
    )
    wi = Window.partitionBy("bk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    a = (
        sz.join(F.broadcast(offs), "bk")
        .select(
            "doc_id",
            "n_chars",
            (F.col("off") + F.sum("n_chars").over(wi) - F.col("n_chars")).alias("start"),
        )
        .select("n_chars", F.expr(f"start div {_PAYLOAD_BUDGET}").alias("part"))
    )
    return (
        a.groupBy("part")
        .agg(
            F.count("*").cast("bigint").alias("n_clips"),
            F.sum("n_chars").cast("bigint").alias("payload_bytes"),
            F.expr(f"sum(n_chars) * 10000 div {_PAYLOAD_BUDGET}")
            .cast("bigint")
            .alias("fill_bps"),
        )
        .select(F.col("part").cast("bigint").alias("part"), "n_clips", "payload_bytes", "fill_bps")
        .orderBy("part")
    )
