"""LIBSVM training-export sink (SURVEY §2.D sinks family): hashed
TF-IDF features in the interchange format every classical trainer
(liblinear, xgboost, sklearn) and Spark's own `format("libsvm")`
reader consume — the classifier-training twin of the sharded-JSONL
LM export (sinks/jsonl.py).

Engine-pure: feature hashing (md5 mod buckets), TF-IDF weighting,
per-doc sparse assembly and the final "label i:w i:w" line are ALL
JVM column expressions — sort_array guarantees libsvm's ascending
index contract, weights are pre-rounded so the text is byte-stable at
any parallelism. No Python touches a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1000  # hashed feature space


def tfidf_libsvm_lines(docs: DataFrame, n_features: int = N_FEATURES) -> DataFrame:
    """(doc_id, line) with line = '<label> idx:w ...', idx ascending,
    1-based (the libsvm contract). Label: 1 = English, 0 = other —
    the lang-id training task."""
    n_docs = docs.select(F.countDistinct("doc_id").alias("nd"))
    toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    terms = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("label"),
        F.explode(toks).alias("term"),
    )
    hashed = terms.withColumn(
        "idx", (F.conv(F.substring(F.md5("term"), 1, 6), 16, 10) % n_features).cast("int")
    )
    tf = hashed.groupBy("doc_id", "label", "idx").agg(F.count("*").alias("tf"))
    df_ = hashed.select("idx", "doc_id").distinct().groupBy("idx").agg(
        F.count("*").alias("df")
    )
    w = (
        tf.join(df_, "idx")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "label",
            "idx",
            F.round(
                F.col("tf")
                * F.log((F.col("nd") + 1).cast("double") / (F.col("df") + 1)),
                6,
            ).alias("w"),
        )
    )
    return (
        w.groupBy("doc_id", "label")
        .agg(F.sort_array(F.collect_list(F.struct("idx", "w"))).alias("feats"))
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.col("label").cast("string"),
                F.array_join(
                    F.expr("transform(feats, x -> concat(x.idx + 1, ':', x.w))"), " "
                ),
            ).alias("line"),
        )
    )


def write_libsvm(docs: DataFrame, out_dir: str, n_features: int = N_FEATURES) -> None:
    """Write the corpus as libsvm text shards (deterministic doc_id
    order within shards via a pre-write sort)."""
    (
        tfidf_libsvm_lines(docs, n_features)
        .orderBy("doc_id")
        .select("line")
        .write.mode("overwrite")
        .text(out_dir)
    )
