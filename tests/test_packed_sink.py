"""Packed token-sequence sink (sinks/packed.py): the write must be a
lossless, deterministic chunking of the corpus token stream — pinned
against a pure-Python reference packer over the collected corpus."""

from __future__ import annotations

import re

from email_etl_spark.plans.registry import REGISTRY
from email_etl_spark.sinks.packed import (
    PAD_ID,
    packed_sequences,
    write_packed_sequences,
)
from tests.conftest import SF_SMOKE

TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split((text or "").lower()) if t]


def _reference_stream(spark, seq_len: int):
    """(global id stream, per-seq python packing) from collected docs."""
    from email_etl_spark.io import load_table

    docs = sorted(
        (r["doc_id"], _tokens(r["text"]))
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    )
    # frequency-rank vocab (count DESC, token ASC), ids from 1
    from collections import Counter

    cnt = Counter(t for _, toks in docs for t in toks)
    vocab = {
        t: i + 1
        for i, (t, _) in enumerate(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0])))
    }
    stream = [vocab[t] for _, toks in docs for t in toks]
    seqs = [
        stream[i : i + seq_len] for i in range(0, len(stream), seq_len)
    ]
    if seqs and len(seqs[-1]) < seq_len:
        seqs[-1] = seqs[-1] + [PAD_ID] * (seq_len - len(seqs[-1]))
    return stream, seqs


def test_packed_sequences_match_python_packer(spark):
    from email_etl_spark.io import load_table

    L = 128  # small seq_len => many boundaries exercised
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        r["seq_id"]: (list(r["input_ids"]), r["n_docs"], r["n_pad"])
        for r in packed_sequences(docs, seq_len=L).collect()
    }
    stream, want = _reference_stream(spark, L)
    assert sorted(got) == list(range(len(want)))
    for sid, seq in enumerate(want):
        ids, n_docs, n_pad = got[sid]
        assert ids == seq, f"seq {sid} diverges"
        assert len(ids) == L
    # padding only in the final sequence
    assert all(got[s][2] == 0 for s in range(len(want) - 1))
    assert got[len(want) - 1][2] == L * len(want) - len(stream)


def test_packed_stats_agree_with_sink(spark):
    # the audit query's sequence/pad numbers must equal what the sink
    # actually produces at its default L=512
    from email_etl_spark.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    seqs = packed_sequences(docs, seq_len=512).collect()
    row = REGISTRY["packed_sequence_stats"].builder(spark, SF_SMOKE).collect()[0]
    assert row["n_sequences"] == len(seqs)
    assert row["pad_tokens"] == sum(r["n_pad"] for r in seqs)
    assert row["total_tokens"] == 512 * len(seqs) - row["pad_tokens"]


def test_write_round_trip_partitioned(spark, tmp_path):
    from email_etl_spark.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "packed")
    write_packed_sequences(docs, out, seq_len=128, seqs_per_dir=16)
    back = spark.read.parquet(out)
    assert back.count() == packed_sequences(docs, seq_len=128).count()
    # partition directories exist and sequences survive the round trip
    assert back.select("shard").distinct().count() > 1
    a = {r["seq_id"]: list(r["input_ids"]) for r in back.collect()}
    b = {
        r["seq_id"]: list(r["input_ids"])
        for r in packed_sequences(docs, seq_len=128).collect()
    }
    assert a == b


def test_vocab_ids_match_global_rank(spark):
    # two-level (count, prefix)-bucketed rank assignment must equal the
    # global (count DESC, tok ASC) rank — exercised across MULTIPLE
    # buckets: count ties spanning different prefixes (the hapax band
    # the prefix split exists to shard) and same-prefix tokens at
    # different counts (cross-band ordering)
    from pyspark.sql import functions as F

    from email_etl_spark.sinks.packed import _vocab_ids

    corpus = (
        ["zebra"] * 5 + ["zen"] * 5          # c=5 tie, same 'ze' prefix
        + ["apple"] * 5                       # c=5 tie, different prefix
        + ["ant"] * 3 + ["zoo"] * 3           # c=3 band, two prefixes
        + ["a", "b", "ba", "bb", "za", "zz"]  # hapax band, many prefixes
    )
    toks = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "pos int, tok string"
    )
    got = {r["tok"]: r["tid"] for r in _vocab_ids(toks).collect()}
    from collections import Counter

    cnt = Counter(corpus)
    want = {
        t: i + 1
        for i, (t, _) in enumerate(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0])))
    }
    assert got == want
    # and the bucketing really is multi-bucket in this corpus
    n_buckets = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .select("c", F.substring("tok", 1, 2).alias("pfx"))
        .distinct()
        .count()
    )
    assert n_buckets >= 6


def _logical_windows(df):
    """[(n_partition_exprs, window_exprs_str, order_str)] for every
    Window node in the optimized logical plan."""
    out = []

    def walk(node):
        if node.getClass().getSimpleName() == "Window":
            out.append(
                (
                    node.partitionSpec().size(),
                    node.windowExpressions().mkString(";"),
                    node.orderSpec().mkString(";"),
                )
            )
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def test_packed_plan_has_no_corpus_window(spark):
    # offsets must come from the two-level prefix sum: the only
    # unpartitioned windows run on bucket-SUBTOTAL tables (cumulative
    # sums over distinct-(bucket) rows); every row_number — the rank
    # assignment that would otherwise serialize a corpus-sized stream
    # through one task (vocab ids, VERDICT r8 #2) — must be
    # PARTITIONED, and the plan carries no CartesianProduct/BNL
    from email_etl_spark.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    df = packed_sequences(docs)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    windows = _logical_windows(df)
    assert windows, "expected window nodes in the packed plan"
    for n_part, funcs, order in windows:
        if "row_number" in funcs:
            assert n_part >= 1, f"unpartitioned row_number window: {funcs}"
        if n_part == 0:
            # unpartitioned => must be a bucket-subtotal cumsum, never
            # a per-token ordering (the corpus-sized hazard)
            assert "tok" not in order.lower().replace("token", ""), (
                f"unpartitioned window ordered over the token stream: {order}"
            )
