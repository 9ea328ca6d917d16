"""Unit + property tests for the byte-level BPE tokenizer
(functions/bpe.py) — the non-SQL-expressible path behind the
`bpe_token_count` query (rows-only in the driver gate, so the real
verification lives here)."""

import pytest

from email_etl_spark.functions import bpe


def test_roundtrip_exact():
    # byte-level BPE partitions the UTF-8 stream: concatenating the
    # token bytes restores the input exactly
    for s in (
        "the quick brown fox",
        "Hello, World!  multiple   spaces\nand newlines",
        "we're can't it's 1234 ++--",
        "",
        "unicode: café naïve — dash",
    ):
        assert b"".join(bpe.encode(s)).decode("utf-8") == s


def test_counts_bounded_and_compressive():
    s = "please review the attached report and send feedback by friday"
    n = bpe.count_tokens(s)
    n_bytes = len(s.encode())
    n_pre = len(bpe._PRETOK.findall(s))
    assert n_pre <= n <= n_bytes
    # seed-corpus phrasing must actually compress (merges fired)
    assert n < n_bytes / 2


def test_merge_loop_uses_ranks():
    # 'the' appears in the seed corpus constantly -> ' the' must be a
    # learned multi-byte token, i.e. strictly fewer tokens than bytes
    toks = bpe.encode(" the the the")
    assert len(toks) < len(" the the the".encode())
    assert all(isinstance(t, bytes) for t in toks)


def test_training_deterministic():
    again = bpe.train_merges(bpe._SEED, bpe.N_MERGES)
    assert again == bpe._MERGES


def test_truncate_budget_and_prefix():
    s = "the pipeline processes incoming email messages " * 20
    for budget in (1, 5, 17, 64):
        t = bpe.truncate_to_tokens(s, budget)
        assert bpe.count_tokens(t) <= budget
        assert s.startswith(t)
    assert bpe.truncate_to_tokens("short", 1000) == "short"
    assert bpe.truncate_to_tokens(None, 10) == ""


def test_spark_column_matches_python(spark):
    from pyspark.sql import functions as F

    from email_etl_spark.functions.bpe import bpe_token_count_col

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "merge dup rows, then write parquet",
        None,
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r.i: r.n
        for r in df.select("i", bpe_token_count_col(F.col("t")).alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == (bpe.count_tokens(t) if t is not None else 0)


def test_load_gpt2_format_merges_file(tmp_path):
    """A published GPT-2-format merges.txt swaps the merge table in
    place: same encode loop, file-defined ranks (incl. the Ġ
    space-prefix byte in the GPT-2 byte↔unicode table)."""
    from email_etl_spark.functions import bpe

    saved = (bpe._MERGES, dict(bpe._RANKS))
    mf = tmp_path / "merges.txt"
    # 'Ġ' encodes byte 0x20 (space) in the GPT-2 table
    mf.write_text("#version: test\nt h\nth e\nĠ t\n", encoding="utf-8")
    try:
        n = bpe.load_merges_file(str(mf))
        assert n == 3
        assert bpe._RANKS[(b"t", b"h")] == 0
        assert bpe._RANKS[(b" ", b"t")] == 2
        # lowest-rank pair merges first: t+h (rank 0) beats the ' t'
        # merge (rank 2), so ' the' ends as [' ', 'the']
        assert bpe.encode("the") == [b"the"]
        assert bpe.encode(" the") == [b" ", b"the"]
        assert bpe.encode(" tx") == [b" t", b"x"]  # rank-2 merge fires here
    finally:
        bpe._MERGES, bpe._RANKS = saved[0], saved[1]
        bpe._encode_piece.cache_clear()


def test_seed_table_restored_after_swap():
    from email_etl_spark.functions import bpe

    assert len(bpe._MERGES) > 100  # trained table active again
    assert bpe.count_tokens("the quick brown fox") > 0
