"""Winnowing guarantee (Schleimer/Wilkerson/Aiken 2003): any verbatim
run of >= WINNOW_W + WINNOW_K - 1 tokens shared by two documents
leaves at least one shared selected fingerprint. Verified on a
crafted corpus, not the synthetic tables — the property is about
construction, not luck."""

from __future__ import annotations


def _write_docs(spark, path, texts):
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_shared_run_produces_shared_fingerprints(spark, tmp_path):
    from email_etl_spark.plans.registry import REGISTRY

    shared = " ".join(f"common{i}" for i in range(16))  # 16-token verbatim run
    texts = [
        "alpha beta gamma delta " + shared + " epsilon zeta",
        "one two three four five " + shared + " six seven eight",
        # unrelated doc: no 7-token run shared with the others
        " ".join(f"other{i}" for i in range(24)),
    ]
    _write_docs(spark, str(tmp_path), texts)
    out = REGISTRY["winnowing_dedup"].builder(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (0, 1) in pairs, out
    assert pairs[(0, 1)]["shared_fps"] >= 2
    assert not any(2 in p for p in pairs), out


def test_disjoint_docs_share_nothing(spark, tmp_path):
    from email_etl_spark.plans.registry import REGISTRY

    texts = [
        " ".join(f"aa{i}" for i in range(30)),
        " ".join(f"bb{i}" for i in range(30)),
    ]
    _write_docs(spark, str(tmp_path), texts)
    out = REGISTRY["winnowing_dedup"].builder(spark, str(tmp_path)).collect()
    assert out == []
