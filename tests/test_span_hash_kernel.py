"""dedup_substring's r10 span-hash kernel: positions must match the
old posexplode enumeration exactly, and equal spans must always hash
equal (the recall-1 property the candidate stage relies on)."""

from __future__ import annotations

import pandas as pd

from email_etl_spark.plans.dedup import SUBSTR_K, _SPAN_HASH_B, _span_hash_kernel


def _ref_hash(span: str) -> int:
    h = 0
    for ch in span:
        h = (h * _SPAN_HASH_B + ord(ch)) % (1 << 64)
    return h - (1 << 64) if h >= 1 << 63 else h


def _run(texts):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "source": ["s"] * len(texts),
            "text": texts,
        }
    )
    out = list(_span_hash_kernel(iter([pdf])))
    return pd.concat(out) if out else pd.DataFrame(columns=["doc_id", "source", "pos", "h"])


def test_positions_and_hashes_match_reference():
    texts = [
        "a" * (SUBSTR_K - 1),          # too short: no rows
        "b" * SUBSTR_K,                # exactly one span
        "the quick brown fox jumps over the lazy dog " * 3,
        "héllo wörld — ünïcode çhars " * 4,  # non-ASCII codepoints
        None,                           # null text: no rows
    ]
    out = _run(texts)
    for did, txt in enumerate(texts):
        rows = out[out.doc_id == did]
        if txt is None or len(txt) < SUBSTR_K:
            assert len(rows) == 0
            continue
        m = len(txt) - SUBSTR_K + 1
        assert list(rows.pos) == list(range(m))
        for _, r in rows.iterrows():
            span = txt[r.pos : r.pos + SUBSTR_K]
            assert int(r.h) == _ref_hash(span), (did, r.pos)


def test_equal_spans_hash_equal_across_docs():
    shared = "SHARED-BOILERPLATE-SPAN-0123456789-ABCDEFGH"
    texts = ["xxx" + shared + "yyy", "zz" + shared + "qqqq"]
    out = _run(texts)
    h0 = set(out[out.doc_id == 0].h)
    h1 = set(out[out.doc_id == 1].h)
    # every span fully inside `shared` exists in both docs
    overlap = h0 & h1
    assert len(overlap) >= len(shared) - SUBSTR_K + 1
