"""Byte-level BPE tokenizer — true token counting and budget
truncation (ref: src/embeddings.py:5,20 counts with tiktoken and
truncates embed text by token budget; plans/text.py::token_count keeps
the cheap regex approximation for the oracle-checked path).

This is the actual BPE algorithm (Sennrich et al. 2016; byte-level
pre-tokenization as published with GPT-2), not an approximation:

- pre-tokenize with the GPT-2-style pattern (contractions, letter
  runs, digit runs, punctuation runs, trailing-space attachment) —
  ASCII classes stand in for the unicode \\p{L}/\\p{N} since the
  stdlib `re` lacks them (documented delta vs tiktoken);
- encode each pre-token as UTF-8 bytes and repeatedly merge the
  lowest-rank adjacent pair, exactly the reference merge loop;
- the merge table is TRAINED at import from an embedded seed corpus
  (deterministic: ties break lexicographically), because published
  merge files cannot be fetched in this environment. Swapping in a
  real published merges list (e.g. GPT-2's 50k) changes only
  `_MERGES` — the encode loop is already the standard one.

Spark integration is an Arrow pandas_udf (vectorized batch transfer,
ranks broadcast once per executor via closure capture) — never a
row-at-a-time Python UDF.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql.functions import pandas_udf

# GPT-2 pre-tokenization pattern, ASCII-classed (see module docstring)
_PRETOK = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

# Seed corpus for deterministic merge training: plain engineering
# English matching the test corpus register. ~1.3 kB is enough for a
# few hundred stable merges; the point is a REAL merge table with the
# real algorithm, not tiktoken-equivalent vocabulary coverage.
_SEED = (
    "the quick brown fox jumps over the lazy dog. "
    "please review the attached report and send feedback by friday. "
    "we need to schedule a meeting to discuss the quarterly results. "
    "the pipeline processes incoming email messages and stores their "
    "embeddings in the database for semantic search and retrieval. "
    "each document is tokenized, scored for quality, deduplicated and "
    "written to partitioned parquet storage with a content hash. "
    "action items are extracted from the message body and the thread "
    "summary includes participants, date ranges and counts. "
    "the scheduler retries failed batches with exponential backoff "
    "and records audit events for every import and sync operation. "
    "customers ordered parts from suppliers across several regions "
    "and the monthly revenue totals are aggregated per priority. "
    "this is a test of the emergency broadcast system. "
    "sessions are computed from event gaps and windows of activity. "
    "data engineering teams monitor shuffle sizes and partition skew. "
    "there are many common words that appear again and again in text."
)

N_MERGES = 300


def train_merges(text: str, n_merges: int) -> list[tuple[bytes, bytes]]:
    """Standard BPE training: repeatedly merge the most frequent
    adjacent symbol pair (ties broken lexicographically so training is
    fully deterministic), recorded in merge order."""
    words: dict[tuple[bytes, ...], int] = {}
    for m in _PRETOK.findall(text):
        w = tuple(bytes([b]) for b in m.encode("utf-8"))
        if w:
            words[w] = words.get(w, 0) + 1

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[bytes, bytes], int] = {}
        for w, n in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-x for x in kv[0][0] + kv[0][1]]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_words: dict[tuple[bytes, ...], int] = {}
        for w, cnt in words.items():
            out: list[bytes] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + cnt
        words = new_words
    return merges


_MERGES = train_merges(_SEED, N_MERGES)
_RANKS: dict[tuple[bytes, bytes], int] = {p: i for i, p in enumerate(_MERGES)}


def _bytes_to_unicode() -> dict[int, str]:
    """The published GPT-2 byte↔unicode table (printable stand-ins for
    raw bytes in merges.txt; same construction as the public gpt-2
    encoder.py): printable ASCII/Latin-1 ranges map to themselves,
    everything else to codepoints 256+."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def load_merges_file(path: str) -> int:
    """Swap the trained merge table for a published GPT-2-format
    merges.txt (one 'A B' pair per line, bytes in the GPT-2
    byte↔unicode encoding). With OpenAI's published gpt2 merges this
    makes count_tokens equal tiktoken's gpt2 encoding on ASCII text
    (our pre-tokenizer is the GPT-2 regex ASCII-classed; non-ASCII
    letter classes can split differently). The file is not vendored —
    drop it in and set SPARK_GRAFT_BPE_MERGES, or call this directly;
    executors pick the env var up at module import. Returns the number
    of merges loaded. Closes the tiktoken-parity gap structurally
    (ref: src/embeddings.py:5,20 counts with tiktoken cl100k).

    Why the self-trained table stays the DEFAULT: the build container
    has no network access and ships neither tiktoken nor any published
    merges.txt (verified round 5), so vendoring the published table is
    not possible here — the loader, the GPT-2 byte encoding, and the
    env-var plumbing are tested (tests/test_bpe.py) and a deployment
    with the file closes the gap by setting one env var."""
    dec = {v: k for k, v in _bytes_to_unicode().items()}
    merges: list[tuple[bytes, bytes]] = []
    with open(path, encoding="utf-8") as fh:
        for ln in fh:
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            a, b = ln.split(" ")
            merges.append(
                (bytes(dec[c] for c in a), bytes(dec[c] for c in b))
            )
    global _MERGES, _RANKS
    _MERGES = merges
    _RANKS = {p: i for i, p in enumerate(merges)}
    _encode_piece.cache_clear()
    return len(merges)


@lru_cache(maxsize=65536)
def _encode_piece(piece: bytes) -> tuple[bytes, ...]:
    """The standard BPE encode loop: merge the lowest-rank adjacent
    pair until no mergeable pair remains."""
    parts: list[bytes] = [bytes([b]) for b in piece]
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = _RANKS.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return tuple(parts)


def encode(text: str) -> list[bytes]:
    """text → BPE token sequence (as byte strings)."""
    out: list[bytes] = []
    for m in _PRETOK.findall(text or ""):
        out.extend(_encode_piece(m.encode("utf-8")))
    return out


def count_tokens(text: str) -> int:
    return len(encode(text))


def truncate_to_tokens(text: str, max_tokens: int) -> str:
    """Longest prefix of `text` within the token budget (ref:
    embeddings.py truncates embed text the same way). Decodes by
    concatenating token bytes — byte-level BPE tokens partition the
    UTF-8 stream, so the prefix is always valid text."""
    toks = encode(text)
    if len(toks) <= max_tokens:
        return text or ""
    return b"".join(toks[:max_tokens]).decode("utf-8", errors="ignore")


def bpe_token_count_col(col: Column) -> Column:
    """Vectorized BPE token count over a string column."""

    @pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        return s.map(lambda t: count_tokens(t) if t is not None else 0)

    return _count(col)


def bpe_truncate_col(col: Column, max_tokens: int) -> Column:
    """Vectorized BPE budget truncation over a string column."""

    @pandas_udf("string")
    def _trunc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: truncate_to_tokens(t, max_tokens) if t is not None else "")

    return _trunc(col)


# env hook at module END so load_merges_file's dependencies exist;
# executors import this module fresh, so the same env var swaps the
# table on workers too (set it before the session starts).
if os.environ.get("SPARK_GRAFT_BPE_MERGES"):
    load_merges_file(os.environ["SPARK_GRAFT_BPE_MERGES"])
