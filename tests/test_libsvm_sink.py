"""LIBSVM export contract (SURVEY §2.D sinks family): the written
shards must round-trip through Spark's OWN libsvm reader — labels,
ascending 1-based indices, and weights all survive byte-exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_libsvm_roundtrip(spark, tmp_path):
    from email_etl_spark.io import load_table
    from email_etl_spark.sinks.libsvm import N_FEATURES, tfidf_libsvm_lines, write_libsvm

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "libsvm")
    write_libsvm(docs, out)

    back = (
        spark.read.format("libsvm")
        .option("numFeatures", N_FEATURES)
        .load(out)
    )
    n_docs = docs.count()
    assert back.count() == n_docs

    # labels survive: class balance matches the lang column
    n_en = docs.where(F.col("lang") == "en").count()
    assert back.where(F.col("label") == 1.0).count() == n_en

    # spot-check one document's vector against the engine's own lines
    lines = {r.doc_id: r.line for r in tfidf_libsvm_lines(docs).collect()}
    sample = lines[0]
    label, *feats = sample.split(" ")
    idxs = [int(f.split(":")[0]) for f in feats]
    assert idxs == sorted(idxs) and min(idxs) >= 1  # libsvm contract
    vals = {int(f.split(":")[0]): float(f.split(":")[1]) for f in feats}
    row = back.where(F.col("label") == float(label)).collect()
    # find the read-back vector matching doc 0's sparse pattern
    match = [
        r
        for r in row
        if sorted(int(i) + 1 for i in r.features.indices) == idxs
        and all(abs(r.features[i - 1] - vals[i]) < 1e-9 for i in idxs)
    ]
    assert match, "doc 0's vector not found after round-trip"
