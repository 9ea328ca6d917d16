"""Lexical search extensions (SURVEY.md §2.C): spell-correction
suggestions, positional phrase search, and facet counts — the
remaining pieces of a full search surface around the reference's
search endpoints (src/api/server.py:118-507). All three reuse the
engine's single tokenizer convention (functions/text.tokens ==
`str_split_regex(lower(text), '[^a-z0-9]+')`) so every lexical
operator agrees on the token universe.

Scale shapes: spell_suggest compares the (tiny, persistable)
vocabulary table against a broadcast 4-term query list with a length
band pushed below the edit-distance compute; phrase_search is one
tokenize + position-scan projection (no shuffle until the top-k cut);
facet_counts is one tokenize + map-side-combined aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.functions.text import tokens
from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import register
from email_etl_spark.plans.search import _TERM_RANK_SQL, _TOKS_SQL, _term_rank

# misspelled search-box inputs; corrections must come from the corpus
SPELL_QUERIES = ("joinn", "qery", "strean", "tabel")
SPELL_MAX_DIST = 2
SPELL_TOPK = 3


def _spell_oracle() -> str:
    qvals = ", ".join(f"('{q}')" for q in SPELL_QUERIES)
    return f"""
WITH t AS (SELECT unnest({_TOKS_SQL}) AS term FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY term),
q(query) AS (VALUES {qvals}),
cand AS (
  SELECT q.query, c.term, c.n,
         CAST(levenshtein(q.query, c.term) AS INT) AS dist
  FROM c CROSS JOIN q
  WHERE ABS(length(c.term) - length(q.query)) <= {SPELL_MAX_DIST}
    AND c.term <> q.query
    AND levenshtein(q.query, c.term) <= {SPELL_MAX_DIST}
),
r AS (
  SELECT query, term, n, dist,
         ROW_NUMBER() OVER (PARTITION BY query ORDER BY dist, n DESC, term) AS rank
  FROM cand
)
SELECT query, CAST(rank AS BIGINT) AS rank, term, dist, n
FROM r WHERE rank <= {SPELL_TOPK} ORDER BY query, rank
"""


@register(
    "spell_suggest",
    oracle=_spell_oracle(),
    doc=(
        "Did-you-mean spell correction: for each misspelled query "
        "term, the top-3 corpus-vocabulary terms within edit distance "
        "2, ranked by (distance, frequency, lexical). The corpus is "
        "touched ONCE to build the term-frequency vocabulary (the "
        "same persistable table query_autocomplete serves from); the "
        "4-query list broadcasts, and the +/-2 length band prunes "
        "candidates BEFORE any Levenshtein is computed — at 1e8-term "
        "vocab that band plus the JVM-side levenshtein() keeps the "
        "scan embarrassingly parallel with zero extra shuffles "
        "(SURVEY §2.C)."
    ),
)
def spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    q = spark.createDataFrame([(s,) for s in SPELL_QUERIES], "query string")
    cand = (
        c.crossJoin(F.broadcast(q))
        .where(
            (F.abs(F.length("term") - F.length("query")) <= SPELL_MAX_DIST)
            & (F.col("term") != F.col("query"))
        )
        .select(
            "query",
            "term",
            "n",
            F.levenshtein("query", "term").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= SPELL_MAX_DIST)
    )
    w = Window.partitionBy("query").orderBy("dist", F.desc("n"), "term")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= SPELL_TOPK)
        .select("query", "rank", "term", "dist", "n")
        .orderBy("query", "rank")
    )


PHRASE = ("table", "scan")
PHRASE_TOPK = 15


def _phrase_oracle() -> str:
    w1, w2 = PHRASE
    pos = (
        f"list_filter(range(1, len(toks)), i -> toks[i] = '{w1}' AND toks[i + 1] = '{w2}')"
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
p AS (SELECT doc_id, {pos} AS hits FROM t),
m AS (
  SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_occ,
         CAST(hits[1] AS BIGINT) AS first_pos
  FROM p WHERE len(hits) > 0
)
SELECT doc_id, n_occ, first_pos FROM m
ORDER BY n_occ DESC, doc_id LIMIT {PHRASE_TOPK}
"""


@register(
    "phrase_search",
    oracle=_phrase_oracle(),
    doc=(
        f"Exact-phrase search ('{PHRASE[0]} {PHRASE[1]}'): docs ranked "
        "by adjacent-occurrence count, with the first match position "
        "for snippet anchoring — the positional operator bag-of-words "
        "rank can't express (the engine's phraseto_tsquery analog; "
        "reference search is src/api/server.py:118-507). One "
        "tokenize + lambda position-scan projection per doc (pure "
        "JVM higher-order functions, no explode, no shuffle) "
        "feeding a TakeOrderedAndProject top-15 — the corpus "
        "streams through untouched by any join at any scale "
        "(SURVEY §2.C)."
    ),
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1, w2 = PHRASE
    from email_etl_spark.io import parallelize_scan

    # heavy per-row position-scan work: spread the single-split scan
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    # r10 (guide §1.2): the old form filtered a position sequence with
    # a lambda that referenced `toks` as an OUTER column — and the
    # pushed-down n_occ filter re-inlined tokens(text) into that
    # lambda body, re-running the regex split once PER POSITION
    # (the documented test_no_tokenizer_inside_lambda_bodies pitfall;
    # measured 3.4 s of a 3.6 s query). zip_with's lambdas see only
    # their element args, so nothing can be inlined into a
    # per-element body: bools[i] = (toks[i]==w1 AND toks[i+1]==w2)
    # over the 1-shifted slice (zip_with's null padding never equals
    # w2, reproducing the old i<n bound), n_occ counts the trues, and
    # array_position finds the same 1-based first hit.
    n = F.size("toks")
    bools = F.zip_with(
        F.col("toks"),
        F.slice(F.col("toks"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: (a == w1) & (b == w2),
    )
    m = (
        t.select("doc_id", bools.alias("b"))
        .select(
            "doc_id",
            F.size(F.filter("b", lambda x: x)).cast("bigint").alias("n_occ"),
            F.array_position("b", F.lit(True)).cast("bigint").alias("first_pos"),
        )
        .where(F.col("n_occ") > 0)
    )
    return m.orderBy(F.desc("n_occ"), "doc_id").limit(PHRASE_TOPK)


@register(
    "facet_counts",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, source, {_TOKS_SQL} AS toks FROM documents
),
m AS (SELECT lang, source, {_TERM_RANK_SQL} AS rank FROM t WHERE {_TERM_RANK_SQL} > 0)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs, MAX(rank) AS best_rank
FROM m GROUP BY lang, source ORDER BY lang, source
""",
    doc=(
        "Facet panel for the search surface: the full term-match "
        "universe rolled up by (lang, source) with hit counts and the "
        "best relevance score per facet cell — what a search UI "
        "renders beside text_rank's top-k. ONE tokenize + rank "
        "projection and one map-side-combined aggregate over the "
        "match set; no window, no join, so the facet pass costs a "
        "single corpus scan at any scale. Rank values reuse "
        "text_rank's rounded term-frequency convention so facet "
        "scores and result scores agree (SURVEY §2.C)."
    ),
)
def facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rank = _term_rank(F.col("text"))
    m = docs.select("lang", "source", rank.alias("rank")).where(F.col("rank") > 0)
    return (
        m.groupBy("lang", "source")
        .agg(F.count("*").cast("bigint").alias("n_docs"), F.max("rank").alias("best_rank"))
        .orderBy("lang", "source")
    )
