"""Online near-duplicate detection (SURVEY §2.E/§2.H): screen a
stream of incoming documents against the PERSISTED MinHash band-bucket
index before they enter the corpus — the admission-control pass a
training-data pipeline runs at ingest (is this new page a near-copy
of something we already hold?).

Per micro-batch, entirely cluster-side:
1. signature the batch docs (the same 8-md5-per-shingle lanes as the
   batch index — functions/hashing.py);
2. probe the stored (band, key, doc_id) buckets with an equality join
   (batch side broadcast: a micro-batch is small by construction, the
   index is not);
3. exact-Jaccard verify each candidate pair, shingling ONLY the
   corpus docs that collided (semi-join on the candidate ids);
4. emit verdicts (new_id, dup_of, j_bps) — the foreachBatch caller
   quarantines or admits, and admitted docs' signatures append to the
   index via streaming/ann_index.py's epoch-delta discipline.

At 100 TB the probe is a bucket-pruned read of the index table and
the verify touches O(candidates) corpus rows — batch cost scales with
the batch, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from email_etl_spark.functions import hashing as H
from email_etl_spark.functions import text as T


def _band_buckets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, text) → one (id, band, key) row per band, plus the shingle
    array carried alongside for verification."""
    toks = docs.select(id_col, T.tokens(F.col("text")).alias("toks"))
    sh = toks.select(id_col, H.shingles(F.col("toks"), k=3).alias("sh"))
    sig = H.with_minhash_sig(sh, "sh")
    sig_cols = [F.col(f"mh{i}") for i in range(H.N_LANES)]
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), H.band_key(sig_cols, b).alias("key"))
            for b in range(H.N_BANDS)
        ]
    )
    return sig.select(id_col, "sh", F.explode(bands).alias("bk")).select(
        id_col, "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def screen_batch(
    batch: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-dup verdicts for one micro-batch of (doc_id, text) rows
    against a stored (band, key, doc_id) index and its corpus table.
    Returns (new_id, dup_of, j_bps) for every verified near-dup —
    empty means the whole batch is admissible; j_bps is the exact
    half-up integer Jaccard bps of the plans/dedup.py pair contract."""
    probes = _band_buckets(batch.select(F.col("doc_id").alias("new_id"), "text"), "new_id")
    new_sh = probes.select("new_id", "sh").distinct()
    cand = (
        index.join(
            F.broadcast(probes.select("new_id", "band", "key")), ["band", "key"]
        )
        .where(F.col("doc_id") != F.col("new_id"))
        .select("new_id", F.col("doc_id").alias("dup_of"))
        .distinct()
    )
    # shingle ONLY the corpus docs that collided. The PROBE side above
    # broadcasts (bounded by the micro-batch), but the candidate set is
    # batch × collisions — corpus-proportional under boilerplate hubs —
    # so it carries no broadcast hint; AQE broadcasts when small.
    corpus_sh = (
        corpus.join(
            cand.select(F.col("dup_of").alias("doc_id")).distinct(),
            "doc_id",
        )
        .select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .select(
            F.col("doc_id").alias("dup_of"),
            H.shingles(F.col("toks"), k=3).alias("sh_c"),
        )
    )
    sized = (
        cand
        .join(new_sh, "new_id")
        .join(corpus_sh, "dup_of")
        .select(
            "new_id",
            "dup_of",
            F.size(F.array_intersect("sh", "sh_c")).cast("bigint").alias("n_inter"),
            F.size("sh").cast("bigint").alias("na"),
            F.size("sh_c").cast("bigint").alias("nb"),
        )
        .withColumn("un", F.col("na") + F.col("nb") - F.col("n_inter"))
    )
    jac = F.expr("(20000L * n_inter + un) div (2L * un)")
    return (
        sized.select("new_id", "dup_of", jac.alias("j_bps"))
        .where(F.col("j_bps") >= int(round(threshold * 10000)))
        .orderBy("new_id", "dup_of")
    )


def run_neardup_stream(
    docs_stream: DataFrame,
    index_dir: str,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.6,
    timeout_s: int = 300,
) -> None:
    """foreachBatch wrapper: screen each micro-batch against the
    persisted index and append verdicts to an audit sink (epoch-keyed
    overwrite — retry-idempotent, the ann_index delta discipline)."""
    import os

    def screen(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        index = spark.read.parquet(index_dir)
        verdicts = screen_batch(batch, index, corpus, threshold)
        out = os.path.join(out_dir, f"epoch={epoch_id}")
        verdicts.write.mode("overwrite").parquet(out)

    q = (
        docs_stream.writeStream.foreachBatch(screen)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    from email_etl_spark.streaming.pipeline import _await_drained

    _await_drained(q, "neardup_screen", timeout_s)
