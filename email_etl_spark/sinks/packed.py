"""Packed fixed-length token-sequence sink (SURVEY §2.L) — the actual
LLM-pretraining output format: concatenate every document's token ids
in a deterministic corpus order and chunk the stream into SEQ_LEN-token
training sequences (the layout a Megatron/GPT-style loader memory-maps;
pack_efficiency_curve computes the plan, this executes it).

Everything is distributed and deterministic — no single-partition
stream walk:

1. token ids = frequency-rank vocabulary ids (count DESC, token ASC —
   reproducible across runs; id 0 is reserved for padding, real ids
   start at 1), assigned by the same two-level scheme as the offsets
   (bucket = (count, token prefix), never a global window — the
   vocabulary is corpus-sized by Heaps' law) and joined back without
   a broadcast hint (corpus-derived: AQE decides);
2. each document's global token offset comes from the TWO-LEVEL
   prefix sum (shard_plan convention: per-256-doc-bucket subtotals,
   tiny cross-bucket window, bounded in-bucket window — never a
   corpus-wide single-partition window);
3. a document overlapping sequences [off div L .. (off+n-1) div L]
   explodes to one row PER OVERLAPPED SEQUENCE carrying only the slice
   of its ids that falls inside that sequence — the explode factor is
   1 + n/L per doc, not corpus-sized;
4. sequences assemble with a (seq_id)-keyed groupBy: slices sorted by
   offset, flattened, and the final partial sequence right-padded with
   id 0.

The reference has no analog (its unit is one email row, ref:
src/etl_pipeline.py batch import); this is the training-data
continuation of its export surface (markdown tree → JSONL shards →
packed sequences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from email_etl_spark.functions import text as T

SEQ_LEN = 512
PAD_ID = 0
_PREFIX_BUCKET = 256  # docs per prefix-sum bucket (shard_plan convention)


def _vocab_ids(toks: DataFrame) -> DataFrame:
    """(tok, tid): frequency-rank vocabulary ids (count DESC, tok ASC,
    ids from 1), assigned with the same two-level scheme _with_offsets
    uses for document offsets — NEVER a corpus-wide unpartitioned
    row_number (vocabulary grows with the corpus by Heaps' law, so a
    global window is a single task sorting 10^8-10^9 rows at the 100 TB
    target; VERDICT r8 #2). Buckets are (count, 2-char token prefix):
    contiguous in the global (c DESC, tok) order, so global rank =
    broadcastable-at-AQE's-discretion bucket offset (a window over the
    distinct-(c,pfx) SUBTOTAL table, the shard_plan 'tiny cross-bucket
    window' convention) + an in-bucket row_number partitioned on
    (c, pfx). The prefix split bounds the hapax band (c=1 holds ~half
    the vocabulary) to ~V/1300 rows per window partition."""
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    b = counts.withColumn("pfx", F.substring("tok", 1, 2))
    sub = b.groupBy("c", "pfx").agg(F.count("*").alias("bn"))
    w_off = Window.orderBy(F.desc("c"), "pfx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sub.select(
        "c", "pfx", F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("boff")
    )
    w_in = Window.partitionBy("c", "pfx").orderBy("tok")
    # no broadcast hint on either side: both are corpus-derived (the
    # engine's no-hint rule, test_plan_guard.py); AQE broadcasts the
    # measured-small side on its own
    return b.join(offsets, ["c", "pfx"]).select(
        "tok",
        (F.col("boff") + F.row_number().over(w_in)).cast("int").alias("tid"),
    )


def _doc_token_ids(docs: DataFrame) -> DataFrame:
    """(doc_id, ids array<int>, n) with frequency-rank vocabulary ids —
    vocab-sized shuffles only for id assignment, one corpus-sized
    shuffle to translate tokens, then the per-doc array reassembles
    from one (doc_id, pos)-keyed rollup."""
    toks = docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "tok")
    )
    vocab = _vocab_ids(toks)
    ids = (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda st: st["tid"],
            ).alias("ids")
        )
        .select("doc_id", "ids", F.size("ids").cast("bigint").alias("n"))
    )
    return ids


def _with_offsets(ids: DataFrame) -> DataFrame:
    """Global token offset per doc via the two-level prefix sum."""
    t = ids.withColumn("bucket", F.expr(f"doc_id div {_PREFIX_BUCKET}"))
    sub = t.groupBy("bucket").agg(F.sum("n").alias("bn"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sub.select(
        "bucket", F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("boff")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "ids",
            "n",
            (F.col("boff") + F.coalesce(F.sum("n").over(w_in), F.lit(0))).alias("off"),
        )
    )


def packed_sequences(docs: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """(seq_id, input_ids array<int> of exactly seq_len, n_docs,
    n_pad, first_doc_id) — the packed training view, lazily."""
    d = _with_offsets(_doc_token_ids(docs)).where(F.col("n") > 0)
    spans = d.select(
        "doc_id",
        "ids",
        "n",
        "off",
        F.explode(
            F.sequence(
                F.expr(f"off div {seq_len}"), F.expr(f"(off + n - 1) div {seq_len}")
            )
        ).alias("seq_id"),
    )
    # the slice of this doc's ids that falls inside this sequence
    lo = F.greatest(F.lit(0), F.col("seq_id") * seq_len - F.col("off"))
    hi = F.least(F.col("n"), (F.col("seq_id") + 1) * seq_len - F.col("off"))
    sl = spans.select(
        "seq_id",
        "doc_id",
        "off",
        F.slice(F.col("ids"), lo.cast("int") + 1, (hi - lo).cast("int")).alias("sl"),
    )
    seqs = sl.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("off", "sl"))),
                lambda st: st["sl"],
            )
        ).alias("flat"),
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("doc_id").alias("first_doc_id"),
    )
    pad = (F.lit(seq_len) - F.size("flat")).cast("int")
    return seqs.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.concat(
            F.col("flat"),
            F.array_repeat(F.lit(PAD_ID).cast("int"), pad),
        ).alias("input_ids"),
        "n_docs",
        (seq_len - F.size("flat")).cast("bigint").alias("n_pad"),
        "first_doc_id",
    )


def write_packed_sequences(
    docs: DataFrame,
    path: str,
    seq_len: int = SEQ_LEN,
    seqs_per_dir: int = 8192,
    mode: str = "overwrite",
) -> None:
    """Materialize the packed view as parquet partitioned into
    loader-sized directories (seq_id div seqs_per_dir), sequences laid
    out in id order within each file."""
    out = packed_sequences(docs, seq_len=seq_len).withColumn(
        "shard", F.expr(f"seq_id div {seqs_per_dir}").cast("bigint")
    )
    (
        out.repartition("shard")
        .sortWithinPartitions("seq_id")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
