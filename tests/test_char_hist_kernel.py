"""char_entropy's r10 char-histogram kernel: counts must equal the
per-character counts in codepoint-sorted order (the order Spark's
UTF8-binary array_sort and DuckDB's list_sort both produce)."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from email_etl_spark.plans.text import _char_hist_kernel


def _ref(txt: str) -> list[int]:
    c = Counter(txt)
    return [c[ch] for ch in sorted(c, key=ord)]


def test_counts_match_sorted_counter():
    texts = [
        "hello world",
        "aaa",
        "",                      # empty -> []
        None,                    # null -> None
        "héllo wörld — ünïcode", # non-ASCII codepoints
        "z" * 100 + "a" * 3 + "🎉🎉",  # supplementary-plane chars
    ]
    got = list(_char_hist_kernel(pd.Series(texts)))
    assert got[2] == []
    assert got[3] is None
    for txt, g in zip(texts, got):
        if txt:
            assert list(g) == _ref(txt), txt


def test_total_count_equals_length():
    txt = "the quick brown fox" * 7
    (g,) = list(_char_hist_kernel(pd.Series([txt])))
    assert sum(g) == len(txt)
