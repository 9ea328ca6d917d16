"""Text analysis column expressions (SURVEY.md §2.D).

Re-expresses the reference's text handling — token counting/truncation
(ref: src/embeddings.py:95-107,187-189), content composition for
embedding (ref: src/embeddings.py:109-149), security content scan
(ref: src/security.py:180-212), filename slugs
(ref: src/markdown_storage.py:39-50) — as JVM-side column expressions.

Every function here has a DuckDB-SQL twin in the query oracles; the
formulas are deliberately engine-portable (regex + arithmetic only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word tokenizer shared by token counts, shingles, quality and langid.
TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish lexer: words | numbers | single non-space symbol.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Small per-language stopword profiles for the language-ID heuristic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "du"),
    "de": ("der", "die", "und", "das", "ist", "ein", "mit", "zu"),
}
STOPWORDS = LANG_PROFILES["en"]

# Suspicious-content patterns (ref: src/security.py:188-202), kept to
# regex constructs with identical semantics in Java regex and RE2.
SUSPICIOUS_PATTERNS: tuple[str, ...] = (
    "<script",
    "javascript:",
    "vbscript:",
    "verify.{0,20}account",
    "suspended.{0,20}account",
    "click.{0,20}here",
)


def tokens(col: Column) -> Column:
    """Lowercased word tokens; empty strings filtered out."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count via a BPE-style lexer regex."""
    return F.regexp_count(F.lower(col), F.lit(BPE_RE))


def punct_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit("[^a-zA-Z0-9\\s]"))


def stopword_count(col: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]:
    0.4·length-signal + 0.3·stopword-ratio-signal + 0.3·low-punct-signal.
    Deterministic arithmetic only — bit-portable across engines."""
    n_chars = F.length(col).cast("double")
    n_toks = token_count(col).cast("double")
    n_stop = stopword_count(col).cast("double")
    n_punct = punct_count(col).cast("double")
    length_sig = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_sig = F.least(F.lit(4.0) * n_stop / F.greatest(n_toks, F.lit(1.0)), F.lit(1.0))
    punct_sig = F.lit(1.0) - F.least(F.lit(4.0) * n_punct / F.greatest(n_chars, F.lit(1.0)), F.lit(1.0))
    return F.round(F.lit(0.4) * length_sig + F.lit(0.3) * stop_sig + F.lit(0.3) * punct_sig, 4)


def _in_set(words: tuple[str, ...]):
    # single-arg lambda on purpose: F.filter treats 2-arg lambdas as (elem, idx)
    return lambda t: t.isin(*words)


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _in_set(words)))
        for lang, words in LANG_PROFILES.items()
    }


def lang_guess(col: Column) -> Column:
    """Argmax over stopword-profile scores, first-listed language wins
    ties; 'und' (undetermined) when no profile matches at all."""
    scores = lang_scores(col)
    langs = list(LANG_PROFILES)
    guess = F.lit("und")
    # build CASE from last to first so earlier languages win ties
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
    return guess


def normalized_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, non-alnum runs → one
    space, trimmed."""
    return F.trim(F.regexp_replace(F.lower(col), TOKEN_SPLIT_RE, " "))


def fingerprint(col: Column) -> Column:
    """Content fingerprint over the canonical form (ref: content dedup
    identity, src/security.py:112-114 uses sha256 on raw bytes)."""
    return F.md5(normalized_text(col))


def content_hash(col: Column) -> Column:
    return F.sha2(col, 256)


def suspicious_flags(col: Column) -> Column:
    """Count of suspicious security patterns present (ref:
    src/security.py:180-212 validate_email_content)."""
    lowered = F.lower(col)
    hits = [F.when(F.regexp_count(lowered, F.lit(p)) > 0, 1).otherwise(0) for p in SUSPICIOUS_PATTERNS]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    return total


def slugify(col: Column, max_len: int = 50) -> Column:
    """Filename slug (ref: src/markdown_storage.py:39-50)."""
    s = F.lower(F.trim(col))
    s = F.regexp_replace(s, "[<>:\"/\\\\|?*]", "")
    s = F.regexp_replace(s, "\\s+", "-")
    s = F.regexp_replace(s, "-+", "-")
    s = F.regexp_replace(s, "^-|-$", "")
    return F.when(F.length(s) == 0, F.lit("untitled")).otherwise(F.substring(s, 1, max_len))
