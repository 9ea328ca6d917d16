"""Text analysis queries (SURVEY.md §2.D) over the documents corpus.

Each query pairs a functions/text.py column expression with its
DuckDB twin. The heavy lifting (regex, array lambdas, arithmetic) is
all JVM-side column work — these scan-and-project plans parallelize
embarrassingly and push column pruning into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.functions import text as T
from email_etl_spark.io import load_table, parallelize_scan
from email_etl_spark.plans.registry import register

_TOKS = "list_filter(str_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_BPE = r"len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))"
_PUNCT = r"len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))"


def _stop_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOKS}, x -> x IN ({inlist})))"


@register(
    "token_count",
    oracle=f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       {_BPE} AS n_bpe_tokens,
       n_chars
FROM documents ORDER BY doc_id
""",
    doc="Whitespace + BPE-ish token counts (ref: tiktoken counting, src/embeddings.py:187-189).",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        T.bpe_token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        "n_chars",
    ).orderBy("doc_id")


@register(
    "quality_score",
    oracle=f"""
SELECT doc_id,
  ROUND(0.4 * LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
      + 0.3 * LEAST(4.0 * {_stop_sql(T.STOPWORDS)} / GREATEST(CAST(len({_TOKS}) AS DOUBLE), 1.0), 1.0)
      + 0.3 * (1.0 - LEAST(4.0 * {_PUNCT} / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 1.0)),
  4) AS quality
FROM documents ORDER BY doc_id
""",
    doc="Length/stopword/punctuation quality heuristic (SURVEY §2.D; training-data filtering op).",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality")).orderBy("doc_id")


def _lang_case_sql() -> str:
    langs = list(T.LANG_PROFILES)
    score = {lang: _stop_sql(words) for lang, words in T.LANG_PROFILES.items()}
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"{score[lang]} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"{score[lang]} > {score[other]}")
            elif j > i:
                conds.append(f"{score[lang]} >= {score[other]}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


@register(
    "lang_id",
    oracle=f"""
SELECT doc_id, lang AS lang_declared, {_lang_case_sql()} AS lang_detected
FROM documents ORDER BY doc_id
""",
    doc="Stopword-profile language ID (SURVEY §2.D; n-gram heuristic langid).",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        T.lang_guess(F.col("text")).alias("lang_detected"),
    ).orderBy("doc_id")


@register(
    "fingerprint",
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
FROM documents ORDER BY doc_id
""",
    doc="Canonical-form content fingerprint (ref: content identity, src/security.py:112-114).",
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


@register(
    "content_hash",
    oracle="SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id",
    doc="SHA-256 content hash (ref: _calculate_hash, src/security.py:112-114).",
)
def content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.content_hash(F.col("text")).alias("sha")).orderBy("doc_id")


def _suspicious_sql() -> str:
    parts = [
        f"CASE WHEN len(regexp_extract_all(lower(text), '{p}')) > 0 THEN 1 ELSE 0 END"
        for p in T.SUSPICIOUS_PATTERNS
    ]
    return " + ".join(parts)


@register(
    "suspicious_content",
    oracle=f"""
SELECT doc_id, {_suspicious_sql()} AS n_hits,
       CASE WHEN {_suspicious_sql()} > 0 THEN TRUE ELSE FALSE END AS is_suspicious
FROM documents ORDER BY doc_id
""",
    doc="Security pattern scan (ref: validate_email_content, src/security.py:180-212).",
)
def suspicious_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = T.suspicious_flags(F.col("text"))
    return docs.select(
        "doc_id",
        hits.alias("n_hits"),
        (hits > 0).alias("is_suspicious"),
    ).orderBy("doc_id")


@register(
    "prepare_embed_text",
    oracle=f"""
WITH t AS (SELECT doc_id, source, lang, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       'Source: ' || source || chr(10) || 'Lang: ' || lang || chr(10) || 'Content:' || chr(10)
         || array_to_string(toks[1:64], ' ') AS embed_text,
       LEAST(len(toks), 64) AS n_tokens_kept
FROM t ORDER BY doc_id
""",
    doc="Embedding-input composition + token truncation (ref: prepare_email_text + _truncate_text, src/embeddings.py:95-149).",
)
def prepare_embed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    embed_text = F.concat(
        F.lit("Source: "), F.col("source"), F.lit("\n"),
        F.lit("Lang: "), F.col("lang"), F.lit("\n"),
        F.lit("Content:\n"),
        F.array_join(F.slice(toks, 1, 64), " "),
    )
    return docs.select(
        "doc_id",
        embed_text.alias("embed_text"),
        F.least(F.size(toks), F.lit(64)).cast("bigint").alias("n_tokens_kept"),
    ).orderBy("doc_id")


@register(
    "embedding_cost_estimate",
    oracle=f"""
WITH t AS (SELECT source, len({_TOKS}) AS n_toks FROM documents)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST((2 * SUM(n_toks)) // 100 AS BIGINT) AS est_cost_micro_usd
FROM t GROUP BY source ORDER BY source
""",
    doc="Embedding cost estimation per provider (ref: estimate_cost, src/embeddings.py:191-203).",
)
def embedding_cost_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_toks = T.token_count(F.col("text"))
    return (
        docs.select("source", n_toks.alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            # $0.02/1M tokens => micro-USD = (2 * tokens) div 100 exactly
            F.expr("(2 * sum(n_toks)) div 100").cast("bigint").alias("est_cost_micro_usd"),
        )
        .orderBy("source")
    )


@register(
    "ngram_topk",
    oracle=f"""
WITH t AS (SELECT lang, {_TOKS} AS toks FROM documents),
bi AS (
  SELECT lang,
         UNNEST(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS gram
  FROM t
),
c AS (SELECT lang, gram, COUNT(*) AS n FROM bi GROUP BY 1, 2),
r AS (SELECT lang, gram, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS rank
      FROM c)
SELECT lang, gram, n, rank FROM r WHERE rank <= 3 ORDER BY lang, rank
""",
    doc=(
        "Top-3 word bigrams per language — corpus n-gram profiling for "
        "training-data analysis (SURVEY §2.L). Count shuffle is map-side "
        "combined on (lang, gram); the per-lang top-k is a tiny second "
        "shuffle over distinct grams only."
    ),
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # materialized token array (bigram_logprob convention: the raw
    # tokenizer expression inside the per-position lambda re-tokenizes
    # per element; enforced by test_plan_guard)
    tokd = docs.select("lang", T.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    # sequence(1, 0) is DESCENDING in Spark, not empty — gate short docs
    idx = F.when(F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    counts = (
        tokd.select("lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "gram")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .orderBy("lang", "rank")
    )


@register(
    "vocab_stats",
    oracle=f"""
WITH t AS (SELECT lang, UNNEST({_TOKS}) AS tok FROM documents),
g AS (SELECT lang, tok, COUNT(*) AS n FROM t GROUP BY 1, 2)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST((20000 * COUNT(*) + SUM(n)) // (2 * SUM(n)) AS BIGINT) AS ttr_bps
FROM g GROUP BY lang ORDER BY lang
""",
    doc=(
        "Vocabulary profile per language: token count, distinct types, "
        "type-token ratio (corpus diversity signal for curation). "
        "Two-level aggregation — the wide (lang, token) shuffle is "
        "map-side combined, the per-lang rollup shuffles distinct types "
        "only (SURVEY §2.L)."
    ),
)
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
    g = toks.groupBy("lang", "tok").agg(F.count("*").alias("n"))
    return (
        g.groupBy("lang")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count("*").alias("n_types"),
        )
        # half-up integer bps: (2*10^4*types + tokens) div (2*tokens)
        # — exact, no ROUND(double) on the count-ratio quotient (the
        # small-denominator halfway class, fixed r9)
        .select(
            "lang",
            "n_tokens",
            "n_types",
            F.expr("(20000 * n_types + n_tokens) div (2 * n_tokens)")
            .cast("bigint")
            .alias("ttr_bps"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# HTML → markdown conversion (ref: provider.py:17,352 — html2text on
# HTML bodies). The corpus stores plain text, so a deterministic HTML
# body is synthesized from each document (header, paragraph, list,
# blockquote, link, image, tracking pixel — every rule class fires),
# identically in both engines, then converted by the SHARED rule table
# in functions/email_text.py. The hash check therefore verifies the
# conversion rules themselves cross-engine.
# ---------------------------------------------------------------------------

_HTML_PARTS_SPARK = None  # built in-function to avoid import-order issues


def _synth_html_spark(doc_id, text, lang, source):
    sid = doc_id.cast("string")
    return F.concat(
        F.lit("<h1>Doc "), sid, F.lit("</h1><p>"),
        F.substring(text, 1, 160),
        F.lit('</p><ul><li><b>lang:</b> '), lang,
        F.lit("</li><li><em>source:</em> "), source,
        F.lit("</li></ul><blockquote>quoted reply</blockquote>"),
        F.lit('<a href="https://archive.example/'), sid,
        F.lit('">permalink</a><hr><img src="https://img.example/'), sid,
        F.lit('.png"/><img width="1" height="1" src="https://track.example/p.gif"/>'),
    )


_SYNTH_HTML_SQL = (
    "'<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || substr(text, 1, 160)"
    " || '</p><ul><li><b>lang:</b> ' || lang"
    " || '</li><li><em>source:</em> ' || source"
    " || '</li></ul><blockquote>quoted reply</blockquote>'"
    " || '<a href=\"https://archive.example/' || CAST(doc_id AS VARCHAR)"
    " || '\">permalink</a><hr><img src=\"https://img.example/' || CAST(doc_id AS VARCHAR)"
    " || '.png\"/><img width=\"1\" height=\"1\" src=\"https://track.example/p.gif\"/>'"
)


def _html_to_md_oracle() -> str:
    from email_etl_spark.functions.email_text import html_to_markdown_sql

    return f"""
WITH h AS (SELECT doc_id, {_SYNTH_HTML_SQL} AS html FROM documents)
SELECT doc_id, {html_to_markdown_sql("html")} AS md
FROM h ORDER BY doc_id
"""


@register(
    "html_to_md",
    oracle=_html_to_md_oracle(),
    doc=(
        "HTML→markdown body conversion with html2text fidelity (ref: "
        "src/providers/gmail/provider.py:17,352): headers, links, images, "
        "bold/italic/code, lists, blockquotes survive as markdown; "
        "script/style/tracking-pixels drop. Pure JVM regex chain — one "
        "scan-project stage, no Python — and the oracle is generated from "
        "the same rule table, so the rules are hash-checked cross-engine."
    ),
)
def html_to_md(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.functions.email_text import html_to_markdown

    docs = load_table(spark, sf_dir, "documents")
    html = _synth_html_spark(
        F.col("doc_id"), F.col("text"), F.col("lang"), F.col("source")
    )
    return (
        docs.select("doc_id", html_to_markdown(html).alias("md"))
        .orderBy("doc_id")
    )


def _bpe_oracle() -> str:
    """BPE's merge loop is not SQL-expressible, but its merge table is
    deterministic — so the expected counts for the committed corpora
    are static facts. JOIN documents on md5(text) against the
    generated lookup (scripts/gen_bpe_expected.py): counts depend only
    on the text, so one table serves every SF, and an uncovered text
    drops its row — a new corpus fails the row-count gate loudly."""
    from email_etl_spark.plans._bpe_expected import EXPECTED

    vals = ",\n".join(f"('{h}', {n}, {c})" for h, n, c in EXPECTED)
    return f"""
WITH expected(h, nb, nc) AS (VALUES {vals})
SELECT d.doc_id,
       CAST(e.nb AS BIGINT) AS n_bpe_tokens,
       CAST(len({_TOKS}) AS BIGINT) AS n_regex_tokens,
       CAST(e.nc AS BIGINT) AS n_chars_at_64_tokens
FROM documents d JOIN expected e ON md5(d.text) = e.h
ORDER BY d.doc_id
"""


@register(
    "bpe_token_count",
    oracle=_bpe_oracle(),
    doc=(
        "True byte-level BPE token counting (ref: src/embeddings.py:5,20 "
        "— tiktoken counts + budget truncation). Real merge-loop BPE over "
        "a deterministically trained merge table (functions/bpe.py), run "
        "as an Arrow pandas_udf; the regex `token_count` stays as the "
        "oracle-checked cheap path. Output contrasts BPE vs regex counts "
        "and the 64-token budget truncation length per document. "
        "Driver-checkable: the oracle joins a generated static table of "
        "md5(text) -> expected counts (see _bpe_oracle / "
        "scripts/gen_bpe_expected.py); exactness of the merge loop "
        "itself is pinned by tests/test_bpe.py."
    ),
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.functions.bpe import bpe_token_count_col, bpe_truncate_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bpe_token_count_col(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        T.token_count(F.col("text")).cast("bigint").alias("n_regex_tokens"),
        F.length(bpe_truncate_col(F.col("text"), 64))
        .cast("bigint")
        .alias("n_chars_at_64_tokens"),
    ).orderBy("doc_id")


@register(
    "unigram_logprob",
    headline=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n_total FROM tok),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(LN(CAST(c.c AS DOUBLE) / n.n_total), 6) AS DECIMAL(18,6)) AS lp
  FROM tok t JOIN cnt c USING (tok) CROSS JOIN n
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(lp) * 1000000 AS BIGINT) AS logprob_e6,
       CAST((2 * CAST(SUM(lp) * 1000000 AS BIGINT) + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS avg_logprob_e6
FROM scored GROUP BY doc_id ORDER BY doc_id
""",
    doc=(
        "Unigram language-model surprise score per document — the "
        "classic perplexity-flavored quality filter for training-data "
        "curation (low avg log-prob = gibberish / boilerplate outliers). "
        "Per-token ln(count/N) is rounded to DECIMAL(18,6) BEFORE the "
        "per-doc sum, making the distributed aggregation exact and "
        "order-insensitive (float addition order can never flip the "
        "result). The vocabulary table broadcasts (vocab ≪ corpus); at "
        "extreme vocab sizes the join degrades to shuffle + AQE skew "
        "handling. Two shuffles total: token counts, per-doc rollup."
    ),
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # n_total = Σ vocab counts, attached to every vocab row by ONE
    # unpartitioned window over the (vocab-sized) rollup — the whole
    # per-token lp value is then precomputed on vocab rows INSIDE the
    # single broadcast build. The previous shape shipped `cnt` and a
    # separate agg-of-cnt as TWO broadcasts, and building the second
    # replayed the full tokenize+explode+agg lineage (exchanges are
    # only reused between identical subtrees): one whole corpus pass
    # and one broadcast build deleted (guide §1.2 / §2.4). The window
    # is vocab-sized single-partition work, the accepted
    # dimension-window class (io.present_sorted note).
    n_total = F.sum("c").over(Window.partitionBy())
    lp_tbl = cnt.select(
        "tok",
        F.round(F.log(F.col("c").cast("double") / n_total), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    scored = toks.join(F.broadcast(lp_tbl), "tok").select("doc_id", "lp")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            # exact e6 integers off the e6 decimal lattice; the avg's
            # (2*S6 + n) div (2*n) truncates toward zero identically
            # in both engines (S6 negative) — no double output
            F.expr("CAST(sum(lp) * 1000000 AS BIGINT)").alias("logprob_e6"),
            F.expr(
                "CAST((2 * CAST(sum(lp) * 1000000 AS BIGINT) + count(*))"
                " div (2 * count(*)) AS BIGINT)"
            ).alias("avg_logprob_e6"),
        )
        .orderBy("doc_id")
    )


@register(
    "repetition_ratio",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS bg
  FROM t
)
SELECT doc_id,
       len(bg) AS n_bigrams,
       len(list_distinct(bg)) AS n_uniq_bigrams,
       CASE WHEN len(bg) > 0
            THEN CAST(FLOOR((len(bg) - len(list_distinct(bg))) * 10000.0 / len(bg)) AS BIGINT)
            ELSE 0 END AS rep_bps
FROM b ORDER BY doc_id
""",
    doc=(
        "Within-document bigram repetition ratio — the standard "
        "boilerplate/spam signal in training-data curation (high "
        "repeated-n-gram fraction = low-value doc). Entirely "
        "array-local column work: bigrams are built with a transform "
        "over the token array, never exploded, so the plan is a "
        "zero-shuffle scan-and-project that parallelizes "
        "embarrassingly at any corpus size. Ratio follows the repo's "
        "exact-integer-bps convention."
    ),
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bg = F.when(
        F.size("toks") >= 2,
        F.expr("transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"),
    ).otherwise(F.array().cast("array<string>"))
    n = F.size("bg").cast("bigint")
    uniq = F.size(F.array_distinct("bg")).cast("bigint")
    return (
        docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .select("doc_id", bg.alias("bg"))
        .select(
            "doc_id",
            n.alias("n_bigrams"),
            uniq.alias("n_uniq_bigrams"),
            F.when(n > 0, F.floor((n - uniq) * 10000.0 / n).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("rep_bps"),
        )
        .orderBy("doc_id")
    )


_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\b555-[0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


@register(
    "pii_scrub",
    oracle=f"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN substr(md5('pii:' || CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                   || CAST((doc_id * 7) % 256 AS VARCHAR)
              ELSE text END AS body
  FROM documents
),
counted AS (
  SELECT doc_id, body,
         len(regexp_extract_all(body, '{_PII_EMAIL}')) AS n_emails,
         len(regexp_extract_all(body, '{_PII_PHONE}')) AS n_phones,
         len(regexp_extract_all(body, '{_PII_IP}')) AS n_ips
  FROM seeded
)
SELECT doc_id, n_emails, n_phones, n_ips,
       sha256(regexp_replace(regexp_replace(regexp_replace(body,
              '{_PII_EMAIL}', '[EMAIL]', 'g'),
              '{_PII_IP}', '[IP]', 'g'),
              '{_PII_PHONE}', '[PHONE]', 'g')) AS scrub_sha
FROM counted ORDER BY doc_id
""",
    doc=(
        "PII detection + redaction over the corpus: email / phone / "
        "IPv4 regex counts and a sha256 of the scrubbed text so the "
        "*replacement output* (not just the counts) is hash-verified "
        "cross-engine. The synthetic corpus contains no natural PII, "
        "so a deterministic md5-gated quarter of documents gets a "
        "seeded contact footer inside the query — keeping the check "
        "non-vacuous (the r1 action_items lesson) while both engines "
        "must agree on seeding, regex semantics, and replacement "
        "order. Pure scan-and-project: zero shuffles, regexes stay in "
        "the JVM (no Python UDF), column pruning reaches the scan."
    ),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    footer = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    seeded = F.substring(
        F.md5(F.concat(F.lit("pii:"), F.col("doc_id").cast("string"))), 1, 1
    ).isin("0", "1", "2", "3")
    body = F.when(seeded, F.concat(F.col("text"), footer)).otherwise(F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("body"), _PII_EMAIL, "[EMAIL]"),
            _PII_IP,
            "[IP]",
        ),
        _PII_PHONE,
        "[PHONE]",
    )
    return (
        docs.select("doc_id", body.alias("body"))
        .select(
            "doc_id",
            F.regexp_count(F.col("body"), F.lit(_PII_EMAIL)).cast("bigint").alias("n_emails"),
            F.regexp_count(F.col("body"), F.lit(_PII_PHONE)).cast("bigint").alias("n_phones"),
            F.regexp_count(F.col("body"), F.lit(_PII_IP)).cast("bigint").alias("n_ips"),
            F.sha2(scrubbed, 256).alias("scrub_sha"),
        )
        .orderBy("doc_id")
    )


@register(
    "langid_confusion",
    oracle=f"""
SELECT lang AS lang_declared, {_lang_case_sql()} AS lang_detected, COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc=(
        "Language-ID confusion matrix: declared vs detected language "
        "counts — the eval a pipeline runs to calibrate its langid "
        "filter before trusting it at corpus scale. One scan + one "
        "partial-aggregated shuffle of (pair, count) rows."
    ),
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.col("lang").alias("lang_declared"),
            T.lang_guess(F.col("text")).alias("lang_detected"),
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_declared", "lang_detected")
    )


@register(
    "token_length_histogram",
    oracle=f"""
WITH t AS (
  SELECT lang, len({_TOKS}) AS n FROM documents
),
b AS (
  SELECT lang, CAST(FLOOR(LOG2(n + 1)) AS BIGINT) AS bucket, n FROM t
)
SELECT lang, bucket,
       COUNT(*) AS n_docs,
       CAST(MIN(n) AS BIGINT) AS min_tokens,
       CAST(MAX(n) AS BIGINT) AS max_tokens
FROM b GROUP BY lang, bucket ORDER BY lang, bucket
""",
    doc=(
        "Per-language log2-bucketed token-length histogram — the "
        "sequence-length planning input for packing/curriculum "
        "decisions (how much of each language sits in each length "
        "band). Bucket boundaries are exact integer log2 floors, so "
        "both engines bucket identically; one scan + one "
        "partial-aggregated shuffle."
    ),
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = T.token_count(F.col("text"))
    return (
        docs.select("lang", n.alias("n"))
        .select("lang", F.floor(F.log2(F.col("n") + 1)).cast("bigint").alias("bucket"), "n")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n").cast("bigint").alias("min_tokens"),
            F.max("n").cast("bigint").alias("max_tokens"),
        )
        .orderBy("lang", "bucket")
    )


LIFT_MIN_COUNT = 5
LIFT_TOP = 5


@register(
    "label_top_terms",
    oracle=f"""
WITH d AS (
  SELECT e.label, UNNEST({_TOKS}) AS tok
  FROM documents JOIN embeddings e ON doc_id = e.vec_id
),
c AS (SELECT label, tok, COUNT(*) AS n FROM d GROUP BY 1, 2),
l AS (SELECT label, SUM(n) AS label_toks FROM c GROUP BY label),
t AS (SELECT tok, SUM(n) AS tok_total FROM c GROUP BY tok),
scored AS (
  SELECT c.label, c.tok, c.n,
         ROUND(CAST(c.n * (SELECT SUM(n) FROM c) AS DOUBLE)
               / (l.label_toks * t.tok_total), 4) AS lift
  FROM c JOIN l USING (label) JOIN t USING (tok)
  WHERE c.n >= {LIFT_MIN_COUNT}
),
r AS (SELECT label, tok, n, lift,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY lift DESC, n DESC, tok) AS rank
      FROM scored)
SELECT CAST(label AS BIGINT) AS label, tok, n, lift, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {LIFT_TOP} ORDER BY label, rank
""",
    doc=(
        "Distinctive terms per embedding label (cluster labeling): lift "
        "= in-label relative term frequency over corpus relative "
        "frequency, min-count filtered, top-5 per label. The numerator "
        "and denominator are exact integer products folded into ONE "
        "double division before rounding, so a distributed run and the "
        "single-threaded oracle agree bit-for-bit. Shuffles: the "
        "doc->label join keys on id; term counts are map-side combined "
        "on (label, tok); lift joins run over the vocab-sized counts "
        "table, never corpus rows (SURVEY §2.L)."
    ),
)
def label_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    d = docs.join(emb, "doc_id").select("label", F.explode(T.tokens(F.col("text"))).alias("tok"))
    c = d.groupBy("label", "tok").agg(F.count("*").alias("n"))
    # marginals as WINDOWS over the vocab-sized count table: the join
    # form re-derived the corpus explode+join pipeline once per
    # marginal (4 corpus passes); windows reuse ONE derivation and
    # shuffle only vocab-sized rows (cluster_top_terms convention)
    label_toks = F.sum("n").over(Window.partitionBy("label"))
    tok_total = F.sum("n").over(Window.partitionBy("tok"))
    n_all = F.sum("n").over(Window.partitionBy())
    scored = (
        c.select(
            "label",
            "tok",
            "n",
            label_toks.alias("label_toks"),
            tok_total.alias("tok_total"),
            n_all.alias("n_all"),
        )
        .where(F.col("n") >= LIFT_MIN_COUNT)
        .select(
            "label",
            "tok",
            "n",
            F.round(
                (F.col("n") * F.col("n_all")).cast("double")
                / (F.col("label_toks") * F.col("tok_total")),
                4,
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("lift"), F.desc("n"), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= LIFT_TOP)
        .select(F.col("label").cast("bigint").alias("label"), "tok", "n", "lift", F.col("rank").cast("bigint").alias("rank"))
        .orderBy("label", "rank")
    )


PMI_MIN_COUNT = 5
PMI_TOP = 20


@register(
    "cooccurrence_pmi",
    oracle=f"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents),
bi AS (
  SELECT toks[u.i] AS w1, toks[u.i + 1] AS w2
  FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
),
cb AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bi GROUP BY 1, 2),
uni AS (SELECT UNNEST(toks) AS w FROM t),
cu AS (SELECT w, COUNT(*) AS n_w FROM uni GROUP BY w),
tot AS (SELECT (SELECT SUM(n_ab) FROM cb) AS b_total, (SELECT SUM(n_w) FROM cu) AS n_total),
scored AS (
  SELECT cb.w1 || ' ' || cb.w2 AS gram, cb.n_ab,
         ROUND(ln(CAST(cb.n_ab AS DOUBLE) * tot.n_total * tot.n_total
                  / (tot.b_total * a.n_w * b.n_w)), 4) AS pmi
  FROM cb
  JOIN cu a ON cb.w1 = a.w
  JOIN cu b ON cb.w2 = b.w
  CROSS JOIN tot
  WHERE cb.n_ab >= {PMI_MIN_COUNT}
)
SELECT gram, CAST(n_ab AS BIGINT) AS n_ab, pmi
FROM scored ORDER BY pmi DESC, gram LIMIT {PMI_TOP}
""",
    doc=(
        "Bigram pointwise mutual information, top-20 collocations with a "
        "min-count floor (phrase mining / tokenizer-merge candidates). "
        "PMI folds the exact integer counts into ONE double expression "
        "(n_ab*N^2 / (B*n_a*n_b)) before the single ln + round, so "
        "parallelism cannot reorder the arithmetic. Bigram and unigram "
        "counts are map-side combined; the PMI joins run over the "
        "vocab-sized count tables; corpus totals broadcast as 1-row "
        "aggregates; final top-20 is TakeOrderedAndProject."
    ),
)
def cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialized token array — see ngram_topk / test_plan_guard
    tokd = docs.select(T.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    idx = F.when(F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
        ),
    )
    bi = tokd.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    cb = bi.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    cu = (
        tokd.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    tot = cb.agg(F.sum("n_ab").alias("b_total")).crossJoin(
        cu.agg(F.sum("n_w").alias("n_total"))
    )
    a = cu.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    b = cu.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))
    scored = (
        cb.where(F.col("n_ab") >= PMI_MIN_COUNT)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("gram"),
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n_total")
                    * F.col("n_total")
                    / (F.col("b_total") * F.col("n_a") * F.col("n_b"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "gram").limit(PMI_TOP)


@register(
    "length_deciles",
    oracle=f"""
WITH t AS (SELECT lang, doc_id, len({_TOKS}) AS n FROM documents),
d AS (SELECT lang, n, NTILE(10) OVER (PARTITION BY lang ORDER BY n, doc_id) AS decile FROM t)
SELECT lang, CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_docs,
       MIN(n) AS min_tokens,
       MAX(n) AS max_tokens,
       CAST(SUM(n) AS BIGINT) AS total_tokens
FROM d GROUP BY 1, 2 ORDER BY lang, decile
""",
    doc=(
        "Token-length deciles per language (curriculum/packing planning: "
        "which length bands hold the tokens). NTILE over (n, doc_id) — "
        "the doc_id tiebreak makes band boundaries deterministic, so "
        "both engines cut identical deciles. One window shuffle on "
        "lang; at 100 TB swap NTILE for approx quantile cuts and "
        "broadcast the boundaries (shape unchanged)."
    ),
)
def length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", "doc_id", T.token_count(F.col("text")).alias("n"))
    w = Window.partitionBy("lang").orderBy("n", "doc_id")
    d = t.withColumn("decile", F.ntile(10).over(w))
    return (
        d.groupBy("lang", F.col("decile").cast("bigint").alias("decile"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
            F.sum("n").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang", "decile")
    )


@register(
    "source_overlap",
    oracle="""
WITH f AS (
  SELECT DISTINCT source,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
per_src AS (SELECT source, COUNT(*) AS n_fp FROM f GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
  FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, CAST(i.n_common AS BIGINT) AS n_common,
       CAST((20000 * i.n_common + (pa.n_fp + pb.n_fp - i.n_common))
            // (2 * (pa.n_fp + pb.n_fp - i.n_common)) AS BIGINT) AS jaccard_bps
FROM inter i
JOIN per_src pa ON i.src_a = pa.source
JOIN per_src pb ON i.src_b = pb.source
WHERE i.n_common >= 1
ORDER BY jaccard_bps DESC, src_a, src_b
""",
    doc=(
        "Pairwise source content overlap (mirror / re-crawl detection "
        "before mixture weighting): Jaccard of the sources' distinct "
        "content-fingerprint sets. The pair space is generated by a "
        "self-join ON THE FINGERPRINT KEY — only fingerprints shared by "
        "2+ sources ever pair up, so the join output is bounded by true "
        "co-occurrence, never |sources|^2 x corpus. Exact integer "
        "intersection/union presented as half-up integer bps. At 100 TB "
        "the fp self-join partitions by fingerprint hash like any "
        "equality join; hot boilerplate fingerprints salt via "
        "operators/skew.py."
    ),
)
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select("source", T.fingerprint(F.col("text")).alias("fp")).distinct()
    per_src = f.groupBy("source").agg(F.count("*").alias("n_fp"))
    a, b = f.alias("a"), f.alias("b")
    inter = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").alias("n_common"))
    )
    pa = per_src.select(F.col("source").alias("src_a"), F.col("n_fp").alias("n_a"))
    pb = per_src.select(F.col("source").alias("src_b"), F.col("n_fp").alias("n_b"))
    return (
        inter.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            # half-up integer bps (exact-presentation convention): no
            # ROUND over a double quotient in an output or sort key
            F.expr(
                "(20000L * n_common + (n_a + n_b - n_common))"
                " div (2L * (n_a + n_b - n_common))"
            )
            .cast("bigint")
            .alias("jaccard_bps"),
        )
        .orderBy(F.desc("jaccard_bps"), "src_a", "src_b")
    )


def _jsd_sql() -> str:
    # per-token terms: pa/m folds to 2*na*Nb/(na*Nb + nb*Na) — pure
    # integer products inside one double division + one ln
    ca = "CAST(na AS DOUBLE) / na_tot * ln(CAST(2 * na * nb_tot AS DOUBLE) / (na * nb_tot + nb * na_tot))"
    cb = "CAST(nb AS DOUBLE) / nb_tot * ln(CAST(2 * nb * na_tot AS DOUBLE) / (nb * na_tot + na * nb_tot))"
    return f"""
WITH c AS (
  SELECT source, UNNEST({_TOKS}) AS tok FROM documents
),
cnt AS (SELECT source, tok, COUNT(*) AS n FROM c GROUP BY 1, 2),
tot AS (SELECT source, SUM(n) AS n_tot FROM cnt GROUP BY source),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b, a.n AS na, b.n AS nb,
         ta.n_tot AS na_tot, tb.n_tot AS nb_tot
  FROM cnt a
  JOIN cnt b ON a.tok = b.tok AND a.source < b.source
  JOIN tot ta ON a.source = ta.source
  JOIN tot tb ON b.source = tb.source
),
agg AS (
  SELECT src_a, src_b, na_tot, nb_tot,
         SUM(CAST(ROUND({ca}, 9) AS DECIMAL(18,9))) AS sum_a,
         SUM(CAST(ROUND({cb}, 9) AS DECIMAL(18,9))) AS sum_b,
         SUM(na) AS sa, SUM(nb) AS sb
  FROM shared GROUP BY 1, 2, 3, 4
)
SELECT src_a, src_b,
       ROUND(0.5 * CAST(sum_a + sum_b AS DOUBLE)
             + 0.5 * ln(2.0) * (CAST(na_tot - sa AS DOUBLE) / na_tot
                                + CAST(nb_tot - sb AS DOUBLE) / nb_tot), 4) AS jsd
FROM agg ORDER BY src_a, src_b
"""


@register(
    "js_divergence",
    oracle=_jsd_sql(),
    doc=(
        "Jensen-Shannon divergence between every source pair's unigram "
        "distribution (distribution-level mirror detection — the "
        "statistical complement of source_overlap's exact-fingerprint "
        "Jaccard). Per-token terms fold the probabilities into pure "
        "integer products (2*na*Nb/(na*Nb+nb*Na)) so each is one "
        "double division + one ln, rounded to DECIMAL(18,9) BEFORE the "
        "distributed sum; tokens absent from one source contribute "
        "their exact ln(2) mass via integer remainders (Na-SA)/Na — no "
        "full-outer token join needed. Pair space is vocab-bounded by "
        "the token-key join, never corpus-bounded (SURVEY §2.L)."
    ),
)
def js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
    cnt = c.groupBy("source", "tok").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("source").agg(F.sum("n").alias("n_tot"))
    a = cnt.select(F.col("source").alias("src_a"), "tok", F.col("n").alias("na"))
    b = cnt.select(F.col("source").alias("src_b"), "tok", F.col("n").alias("nb"))
    ta = tot.select(F.col("source").alias("src_a"), F.col("n_tot").alias("na_tot"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n_tot").alias("nb_tot"))
    shared = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
    )
    ca = (
        F.col("na").cast("double")
        / F.col("na_tot")
        * F.log(
            (2 * F.col("na") * F.col("nb_tot")).cast("double")
            / (F.col("na") * F.col("nb_tot") + F.col("nb") * F.col("na_tot"))
        )
    )
    cb = (
        F.col("nb").cast("double")
        / F.col("nb_tot")
        * F.log(
            (2 * F.col("nb") * F.col("na_tot")).cast("double")
            / (F.col("nb") * F.col("na_tot") + F.col("na") * F.col("nb_tot"))
        )
    )
    agg = shared.groupBy("src_a", "src_b", "na_tot", "nb_tot").agg(
        F.sum(F.round(ca, 9).cast("decimal(18,9)")).alias("sum_a"),
        F.sum(F.round(cb, 9).cast("decimal(18,9)")).alias("sum_b"),
        F.sum("na").alias("sa"),
        F.sum("nb").alias("sb"),
    )
    jsd = F.round(
        F.lit(0.5) * (F.col("sum_a") + F.col("sum_b")).cast("double")
        + F.lit(0.5)
        * F.log(F.lit(2.0))
        * (
            (F.col("na_tot") - F.col("sa")).cast("double") / F.col("na_tot")
            + (F.col("nb_tot") - F.col("sb")).cast("double") / F.col("nb_tot")
        ),
        4,
    )
    return agg.select("src_a", "src_b", jsd.alias("jsd")).orderBy("src_a", "src_b")


@register(
    "vocab_growth",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
fs AS (SELECT tok, MIN(doc_id) AS first_seen FROM tok GROUP BY tok),
b AS (SELECT first_seen // 50 AS bucket, COUNT(*) AS n_new FROM fs GROUP BY 1)
SELECT CAST(bucket AS BIGINT) AS bucket,
       n_new,
       CAST(SUM(n_new) OVER (ORDER BY bucket) AS BIGINT) AS vocab_size
FROM b ORDER BY bucket
""",
    doc=(
        "Vocabulary growth curve (Heaps-law profile): per 50-doc ingest "
        "bucket, how many never-before-seen tokens appear and the "
        "cumulative vocabulary size — the curation signal for corpus "
        "saturation (a flattening curve means new data adds little "
        "lexical novelty). First-seen is one map-side-combined "
        "min-aggregate over the exploded token stream; the cumulative "
        "window runs over the tiny bucket rollup, never the corpus "
        "(SURVEY §2.D)."
    ),
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_seen"))
    buckets = (
        first_seen.groupBy(F.expr("first_seen div 50").cast("bigint").alias("bucket"))
        .agg(F.count("*").alias("n_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        buckets.withColumn("vocab_size", F.sum("n_new").over(w).cast("bigint"))
        .orderBy("bucket")
    )


@register(
    "quality_length_corr",
    oracle=f"""
WITH t AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS x,
         CAST(ROUND(0.4 * LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             + 0.3 * LEAST(4.0 * {_stop_sql(T.STOPWORDS)} / GREATEST(CAST(len({_TOKS}) AS DOUBLE), 1.0), 1.0)
             + 0.3 * (1.0 - LEAST(4.0 * {_PUNCT} / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 1.0)),
           4) AS DECIMAL(5,4)) AS y
  FROM documents
),
s AS (
  SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y * 10000 AS BIGINT)) AS HUGEINT) AS sy4,
         CAST(SUM(CAST(y * 10000 AS BIGINT) * CAST(y * 10000 AS BIGINT)) AS HUGEINT) AS syy8,
         CAST(SUM(x * CAST(y * 10000 AS BIGINT)) AS HUGEINT) AS sxy4
  FROM t GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(n * sxy4 - sx * sy4 AS VARCHAR) AS corr_num_e4,
       CAST(n * sxx - sx * sx AS VARCHAR) AS var_x_num,
       CAST(n * syy8 - sy4 * sy4 AS VARCHAR) AS var_y_num_e8
FROM s ORDER BY source
""",
    doc=(
        "Pearson correlation between document length and the quality "
        "heuristic, per source — the sanity check that a quality "
        "filter is not just a length filter (|r| near 1 means the "
        "expensive signal adds nothing over n_chars). Every cross-row "
        "sum is EXACT (integer chars, quality in integer e4 units), "
        "so the statistic is order-insensitive at any parallelism, "
        "and r ships as the exact signed rational triple r = "
        "corr_num_e4 / sqrt(var_x_num * var_y_num_e8) — Pearson's "
        "numerator n*sxy-sx*sy and both variance numerators as "
        "exact canonical digit strings (units cancel: e4 numerator "
        "over sqrt(1 * e8); decimal-typed output columns render as "
        "float64 in pandas-layer clients and hash-mismatch — the r10 "
        "driver red); no double output at all, the r9 ks_stat red "
        "proved shared IEEE trees are not env-stable. sqrt + divide "
        "is the caller's last-mile op (SURVEY §2.D)."
    ),
)
def quality_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.length("text").cast("bigint").alias("x"),
        (T.quality_score(F.col("text")).cast("decimal(5,4)") * 10000)
        .cast("bigint")
        .alias("y4"),
    )
    s = t.groupBy("source").agg(
        # per-row products cast to DECIMAL(38,0) BEFORE the sum: Spark's
        # BIGINT sum wraps silently at 100 TB row counts (DuckDB's SUM
        # auto-promotes to HUGEINT)
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum(F.col("y4").cast("decimal(38,0)")).alias("sy4"),
        F.sum((F.col("y4") * F.col("y4")).cast("decimal(38,0)")).alias("syy8"),
        F.sum((F.col("x") * F.col("y4")).cast("decimal(38,0)")).alias("sxy4"),
    )
    return (
        s.select(
            "source",
            F.col("n").cast("bigint").alias("n_docs"),
            # digit-string presentation: DECIMAL(38,0) output columns
            # hash-mismatch across engines in type-faithful client
            # layers (pandas renders DuckDB decimals as float64 — the
            # r10 driver red); strings are conversion-invariant and
            # lossless at any scale
            F.expr("CAST(CAST(n * sxy4 - sx * sy4 AS DECIMAL(38,0)) AS STRING)").alias(
                "corr_num_e4"
            ),
            F.expr("CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) AS STRING)").alias("var_x_num"),
            F.expr("CAST(CAST(n * syy8 - sy4 * sy4 AS DECIMAL(38,0)) AS STRING)").alias(
                "var_y_num_e8"
            ),
        )
        .orderBy("source")
    )


_SUMLEN = f"list_sum(list_transform({_TOKS}, x -> len(x)))"
_NSTOP_DISTINCT = (
    "len(list_intersect(list_distinct(" + _TOKS + "), "
    "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS) + "]))"
)


@register(
    "gopher_quality",
    oracle=f"""
WITH d AS (
  SELECT source,
         len({_TOKS}) AS n,
         COALESCE({_SUMLEN}, 0) AS sum_len,
         len(list_distinct({_TOKS})) AS n_distinct,
         {_NSTOP_DISTINCT} AS n_stop
  FROM documents
), r AS (
  SELECT source,
         CASE WHEN n BETWEEN 30 AND 90 THEN 1 ELSE 0 END AS p_wc,
         CASE WHEN 3 * n <= sum_len AND sum_len <= 10 * n THEN 1 ELSE 0 END AS p_mwl,
         CASE WHEN 5 * n_distinct >= 2 * n THEN 1 ELSE 0 END AS p_ttr,
         CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS p_stop
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p_wc) * 10000 // COUNT(*) AS BIGINT) AS pass_wordcount_bps,
       CAST(SUM(p_mwl) * 10000 // COUNT(*) AS BIGINT) AS pass_meanwordlen_bps,
       CAST(SUM(p_ttr) * 10000 // COUNT(*) AS BIGINT) AS pass_ttr_bps,
       CAST(SUM(p_stop) * 10000 // COUNT(*) AS BIGINT) AS pass_stopword_bps,
       CAST(SUM(p_wc * p_mwl * p_ttr * p_stop) * 10000 // COUNT(*) AS BIGINT) AS pass_all_bps
FROM r GROUP BY source ORDER BY source
""",
    doc=(
        "Gopher/C4-style rule-filter report per source (Rae et al. "
        "2021, public recipe, thresholds adapted to this corpus): "
        "word-count bounds [30,90], mean word length in [3,10] as the "
        "pure-integer compare 3n <= sum_len <= 10n, type-token ratio "
        ">= 0.40 as 5*distinct >= 2*n, and >= 2 distinct stopword "
        "hits. Every rule is exact integer arithmetic (no float "
        "knife-edges), rates are exact-integer bps. One scan + one "
        "map-side-combined groupBy(source): embarrassingly parallel "
        "at 100 TB, no shuffle beyond |sources| rows (SURVEY §2.D)."
    ),
)
def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialized token array: the four rule columns below would
    # otherwise each re-run the tokenizer per row
    tokd = docs.select("source", T.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    t = tokd.select(
        "source",
        F.size(toks).cast("bigint").alias("n"),
        F.coalesce(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)),
            F.lit(0).cast("bigint"),
        ).alias("sum_len"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in T.STOPWORDS]),
            )
        ).cast("bigint").alias("n_stop"),
    )
    r = t.select(
        "source",
        F.when((F.col("n") >= 30) & (F.col("n") <= 90), 1).otherwise(0).alias("p_wc"),
        F.when(
            (3 * F.col("n") <= F.col("sum_len")) & (F.col("sum_len") <= 10 * F.col("n")), 1
        ).otherwise(0).alias("p_mwl"),
        F.when(5 * F.col("n_distinct") >= 2 * F.col("n"), 1).otherwise(0).alias("p_ttr"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("p_stop"),
    )
    out = r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("p_wc").alias("s_wc"),
        F.sum("p_mwl").alias("s_mwl"),
        F.sum("p_ttr").alias("s_ttr"),
        F.sum("p_stop").alias("s_stop"),
        F.sum(
            F.col("p_wc") * F.col("p_mwl") * F.col("p_ttr") * F.col("p_stop")
        ).alias("s_all"),
    )
    return (
        out.select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.expr("s_wc * 10000L div n_docs").cast("bigint").alias("pass_wordcount_bps"),
            F.expr("s_mwl * 10000L div n_docs").cast("bigint").alias("pass_meanwordlen_bps"),
            F.expr("s_ttr * 10000L div n_docs").cast("bigint").alias("pass_ttr_bps"),
            F.expr("s_stop * 10000L div n_docs").cast("bigint").alias("pass_stopword_bps"),
            F.expr("s_all * 10000L div n_docs").cast("bigint").alias("pass_all_bps"),
        )
        .orderBy("source")
    )


@register(
    "bigram_logprob",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, toks[u.i] AS w1, toks[u.i + 1] AS w2
  FROM tok CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
scored AS (
  SELECT b.doc_id,
         CAST(ROUND(LN(CAST(c2.c2 AS DOUBLE) / c1.c1), 6) AS DECIMAL(18,6)) AS lp
  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(lp) * 1000000 AS BIGINT) AS logprob_e6,
       CAST((2 * CAST(SUM(lp) * 1000000 AS BIGINT) + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS avg_logprob_e6
FROM scored GROUP BY doc_id ORDER BY doc_id
""",
    doc=(
        "Bigram language-model surprise per document: MLE conditional "
        "p(w2|w1) = c(w1 w2) / c(w1 .) over the corpus bigram stream "
        "(never zero for observed bigrams, so no smoothing knife-edge). "
        "The sharper perplexity-flavored quality filter next to "
        "unigram_logprob — word-salad docs score low even when their "
        "unigrams are common. Same exactness discipline: per-bigram ln "
        "rounded to DECIMAL(18,6) BEFORE the distributed per-doc sum. "
        "Bigram count tables broadcast (vocab^eff ≪ corpus; degrade to "
        "shuffle join + AQE at extreme vocab). Three shuffles: two "
        "count tables, one per-doc rollup (SURVEY §2.L)."
    ),
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array FIRST: referencing the tokenizer
    # expression inside the per-position lambda re-tokenizes per
    # element (the O(rows x positions) pitfall functions/hashing.py
    # documents) — 20x slower at sf0.1
    tokd = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    bgs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # flat string grams ("w1 w2"; tokens never contain spaces, so the
    # mapping is bijective and w1 recovers via substring_index) keep
    # the explode and both count joins on ONE key column — the
    # struct-array form measured 4x slower at sf0.1
    bt = tokd.select("doc_id", F.explode(bgs).alias("bg")).select(
        "doc_id", "bg", F.substring_index(F.col("bg"), " ", 1).alias("w1")
    )
    c2 = bt.groupBy("bg").agg(F.count("*").alias("c2"))
    # context counts derive from the bigram counts (sum over the
    # vocab-sized c2, NOT a third pass over the corpus bigram stream):
    # the lazy stream is recomputed per consumer, so every extra
    # consumer is a full scan+tokenize pass
    c1 = (
        c2.select(F.substring_index(F.col("bg"), " ", 1).alias("w1"), "c2")
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    lp = (
        F.round(F.log(F.col("c2").cast("double") / F.col("c1")), 6)
        .cast("decimal(18,6)")
        .alias("lp")
    )
    scored = (
        bt.join(F.broadcast(c2), "bg")
        .join(F.broadcast(c1), "w1")
        .select("doc_id", lp)
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            # exact e6 integers off the e6 decimal lattice (see
            # unigram_logprob) — no double output
            F.expr("CAST(sum(lp) * 1000000 AS BIGINT)").alias("logprob_e6"),
            F.expr(
                "CAST((2 * CAST(sum(lp) * 1000000 AS BIGINT) + count(*))"
                " div (2 * count(*)) AS BIGINT)"
            ).alias("avg_logprob_e6"),
        )
        .orderBy("doc_id")
    )


def _char_hist_kernel(texts):
    """Arrow kernel: text -> per-doc character-count array in
    codepoint order (== the UTF8-binary order Spark's array_sort and
    the oracle's list_sort use — UTF-8 byte order preserves codepoint
    order). Counts are EXACT integers; the ln/fold stays JVM-side so
    the transcendental runs on the engine path the oracle already
    hash-matches."""
    import numpy as np
    import pandas as pd

    out = []
    for txt in texts:
        if txt is None:
            out.append(None)
            continue
        cp = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
        if cp.size == 0:
            out.append([])
            continue
        out.append(np.unique(cp, return_counts=True)[1].tolist())
    return pd.Series(out)


_CHAR_HIST_UDF = None


@register(
    "char_entropy",
    oracle="""
WITH c AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1), i -> substr(text, i, 1)) AS chars
  FROM documents
),
t AS (
  SELECT doc_id, len(chars) AS n,
         list_reduce(
           list_prepend(0.0,
             list_transform(
               list_sort(list_distinct(chars)),
               d -> CAST(len(list_filter(chars, ch -> ch = d)) AS DOUBLE)
                    * LN(len(list_filter(chars, ch -> ch = d))))),
           (acc, x) -> acc + x) AS s
  FROM c
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
       ROUND(LN(n) - s / n, 4) AS char_entropy
FROM t ORDER BY doc_id
""",
    doc=(
        "Character-level Shannon entropy per document (gibberish / "
        "base64-blob / repeated-padding detection — the classic "
        "cheap quality gate next to the word-level heuristics): "
        "H = ln(N) - (sum n_c ln n_c) / N. The per-char counts come "
        "from one Arrow batch pass (exact integers, codepoint order); "
        "Σ c·ln(c) is a JVM fold over those counts in sorted-char "
        "order, so the double sum has a fixed order on both engines "
        "(bit-identical without decimal scaffolding). Embarrassingly "
        "parallel at any scale (SURVEY §2.D)."
    ),
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 (guide §4.2 + §1.2): the old form materialized a char ARRAY
    # per doc via transform(sequence, i -> substr(text, i, 1)) —
    # substr walks i chars on UTF8 strings, so the build alone is
    # O(len²) char steps — and then re-filtered that array once per
    # DISTINCT character (O(n·d) interpreted lambdas). One Arrow pass
    # computes the exact per-char counts (integers — no float
    # question); Σ c·ln(c) is the SAME JVM fold over the same values
    # in the same sorted-char order, so the double output is
    # bit-identical. Measured 14.3 s -> 0.9 s over the sf0.1 corpus.
    global _CHAR_HIST_UDF
    if _CHAR_HIST_UDF is None:  # lazy: pandas_udf needs an active session
        _CHAR_HIST_UDF = F.pandas_udf(_char_hist_kernel, "array<bigint>")
    from email_etl_spark.io import parallelize_scan

    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    cd = docs.select(
        "doc_id", F.length("text").alias("n"), _CHAR_HIST_UDF(F.col("text")).alias("cnt")
    )
    s = F.aggregate(
        F.col("cnt"),
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
    )
    t = cd.select("doc_id", "n", s.alias("s"))
    return t.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        F.round(F.log(F.col("n").cast("double")) - F.col("s") / F.col("n"), 4).alias(
            "char_entropy"
        ),
    ).orderBy("doc_id")


@register(
    "zipf_fit",
    oracle=f"""
WITH tok AS (SELECT lang, unnest({_TOKS}) AS tok FROM documents),
cnt AS (SELECT lang, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2),
ranked AS (
  SELECT lang, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rank
  FROM cnt
),
terms AS (
  SELECT lang,
         CAST(ROUND(LN(rank), 6) AS DECIMAL(18,6)) AS x,
         CAST(ROUND(LN(n), 6) AS DECIMAL(18,6)) AS y,
         CAST(ROUND(LN(rank) * LN(rank), 6) AS DECIMAL(18,6)) AS xx,
         CAST(ROUND(LN(rank) * LN(n), 6) AS DECIMAL(18,6)) AS xy
  FROM ranked
),
s AS (
  SELECT lang, COUNT(*) AS m,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(xx) AS DOUBLE) AS sxx, CAST(SUM(xy) AS DOUBLE) AS sxy
  FROM terms GROUP BY lang
)
SELECT lang, CAST(m AS BIGINT) AS n_types,
       ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 4) AS zipf_slope,
       ROUND((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 4) AS zipf_intercept
FROM s ORDER BY lang
""",
    doc=(
        "Zipf-law fit per language: least-squares slope of ln(freq) "
        "vs ln(rank) over the vocabulary (natural corpora fit slope "
        "~ -1; synthetic/templated/spammy corpora bend away — a "
        "corpus-health diagnostic for curation). Rank ties break on "
        "token so both engines rank identically; every per-type term "
        "is pre-rounded to DECIMAL(18,6) before the distributed sums "
        "(order-insensitive, quality_length_corr convention), and the "
        "closed-form slope/intercept is fixed-order scalar arithmetic "
        "over per-group scalars. The window runs over the vocab-sized "
        "count table, never corpus rows (SURVEY §2.D)."
    ),
)
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
    cnt = tok.groupBy("lang", "tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
    ranked = cnt.withColumn("rank", F.row_number().over(w))
    lr = F.log(F.col("rank").cast("double"))
    ln = F.log(F.col("n").cast("double"))
    terms = ranked.select(
        "lang",
        F.round(lr, 6).cast("decimal(18,6)").alias("x"),
        F.round(ln, 6).cast("decimal(18,6)").alias("y"),
        F.round(lr * lr, 6).cast("decimal(18,6)").alias("xx"),
        F.round(lr * ln, 6).cast("decimal(18,6)").alias("xy"),
    )
    s = terms.groupBy("lang").agg(
        F.count("*").alias("m"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "lang",
        F.col("m").cast("bigint").alias("n_types"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("m"), 4).alias("zipf_intercept"),
    ).orderBy("lang")


CHARGRAM_K = 3
CHARGRAM_TOP = 20


@register(
    "langid_chargram",
    oracle=f"""
WITH tg_doc AS (
  SELECT doc_id, lang AS lang_declared,
         list_distinct(list_transform(range(1, length(text) - {CHARGRAM_K} + 2),
                                      i -> substr(text, i, {CHARGRAM_K}))) AS tgs
  FROM documents
),
tgx AS (SELECT doc_id, lang_declared, unnest(tgs) AS tg FROM tg_doc),
cnt AS (SELECT lang_declared AS lang, tg, COUNT(*) AS n FROM tgx GROUP BY 1, 2),
prof AS (
  SELECT lang, tg FROM (
    SELECT lang, tg,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tg) AS rn
    FROM cnt
  ) WHERE rn <= {CHARGRAM_TOP}
),
hits AS (
  SELECT t.doc_id, p.lang, COUNT(*) AS n_hits
  FROM tgx t JOIN prof p ON t.tg = p.tg
  GROUP BY 1, 2
),
pred AS (
  SELECT doc_id, lang AS lang_pred FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, lang) AS rn
    FROM hits
  ) WHERE rn = 1
)
SELECT d.lang_declared, COALESCE(p.lang_pred, 'und') AS lang_pred,
       COUNT(*) AS n_docs
FROM tg_doc d LEFT JOIN pred p USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc=(
        "Char-trigram language ID confusion matrix — the n-gram "
        "profile method (Cavnar/Trenkle 1994, public) next to the "
        "stopword heuristic lang_id: per-language top-20 trigram "
        "profiles are TRAINED from the declared labels (distinct "
        "trigram presence, count-ranked with trigram tiebreak), then "
        "every doc is classified by profile-hit count (argmax, lang "
        "tiebreak; no hits -> 'und') and cross-tabbed against its "
        "declared label. Scale shape: profiles are a vocab-sized "
        "top-k window broadcast into the hit join; doc trigram sets "
        "are doc-local arrays; the per-doc argmax is one keyed "
        "window. Self-training on its own gate keeps the oracle "
        "closed over the same corpus (SURVEY §2.D)."
    ),
)
def langid_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # r10 (guide §1.2): substr(text, i, K) walks i chars on UTF8
    # strings, so the old per-position transform was O(len²) char
    # steps per doc. Build the 3-grams by zipping the char array with
    # its 1- and 2-shifted slices instead — O(len) per row, and no
    # lambda references an OUTER column, so CollapseProject cannot
    # inline the split back into a per-element body (the
    # test_no_tokenizer_inside_lambda_bodies pitfall: a first rewrite
    # via slice(cs, i, K) inside a transform lambda was silently
    # re-inlined and stayed quadratic). concat_ws skips the null
    # padding zip_with adds past the shorter slice, reproducing
    # substr's end-of-string truncation exactly.
    n = F.size(F.col("cs"))
    gram3 = F.zip_with(
        F.zip_with(
            F.col("cs"),
            F.slice(F.col("cs"), 2, n - 1),
            lambda a, b: F.concat_ws("", a, b),
        ),
        F.slice(F.col("cs"), 3, n - 2),
        lambda a, b: F.concat_ws("", a, b),
    )
    tgs = F.array_distinct(
        F.when(n >= CHARGRAM_K, F.slice(gram3, 1, n - (CHARGRAM_K - 1))).otherwise(
            F.array(F.substring(F.col("text"), 1, CHARGRAM_K))
        )
    )
    from email_etl_spark.io import parallelize_scan as _ps

    # heavy per-row gram work: spread the single-split scan (io.py).
    # localCheckpoint (r11, guide §2.4 / the topic_coherence branch
    # convention): the gram table feeds THREE branches (profile counts,
    # the classification hit join, and the final declared-label join),
    # and each lazy consumer re-ran the whole zip_with gram build —
    # one materialized pass now serves all three.
    tg_doc = _ps(docs).select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        "text",
        F.split(F.col("text"), "").alias("cs"),
    ).select("doc_id", "lang_declared", tgs.alias("tgs")).localCheckpoint(eager=True)
    tgx = tg_doc.select("doc_id", "lang_declared", F.explode("tgs").alias("tg"))
    cnt = tgx.groupBy(F.col("lang_declared").alias("lang"), "tg").agg(
        F.count("*").alias("n")
    )
    wl = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tg"))
    prof = (
        cnt.withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") <= CHARGRAM_TOP)
        .select("lang", "tg")
    )
    hits = (
        tgx.join(F.broadcast(prof), "tg")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_hits"))
    )
    # per-doc argmax (n_hits DESC, lang ASC) as one aggregation:
    # min(struct(-n_hits, lang)) replays the row_number window's order
    # with map-side partial combining (guide §2.3; the semdedup_prune
    # rewrite) — langs are distinct per (doc, lang) group, no ties
    pred = (
        hits.groupBy("doc_id")
        .agg(
            F.min(
                F.struct((-F.col("n_hits")).alias("nn"), F.col("lang").alias("lang"))
            ).alias("b")
        )
        .select("doc_id", F.col("b.lang").alias("lang_pred"))
    )
    return (
        tg_doc.select("doc_id", "lang_declared")
        .join(pred, "doc_id", "left")
        .groupBy("lang_declared", F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_declared", "lang_pred")
    )


@register(
    "perplexity_buckets",
    oracle=f"""
WITH tok AS (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents),
cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n_total FROM tok),
scored AS (
  SELECT t.doc_id, t.lang,
         CAST(ROUND(LN(CAST(c.c AS DOUBLE) / n.n_total), 6) AS DECIMAL(18,6)) AS lp
  FROM tok t JOIN cnt c USING (tok) CROSS JOIN n
),
per_doc AS (
  SELECT doc_id, lang,
         ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_lp
  FROM scored GROUP BY doc_id, lang
),
tiled AS (
  SELECT lang, avg_lp,
         NTILE(3) OVER (PARTITION BY lang ORDER BY avg_lp DESC, doc_id) AS tile
  FROM per_doc
)
SELECT lang,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       MIN(avg_lp) AS lo, MAX(avg_lp) AS hi
FROM tiled GROUP BY lang, tile ORDER BY lang, MIN(tile)
""",
    doc=(
        "CCNet-style perplexity bucketing (Wenzek et al. 2020, public "
        "recipe): per-language head/middle/tail terciles by unigram-LM "
        "average log-prob (head = least surprising; CCNet trains on "
        "head+middle, drops tail). Deterministic NTILE with doc_id "
        "tiebreak makes band cuts engine-identical (length_deciles "
        "convention); the LM scoring reuses the pre-rounded decimal "
        "sum discipline of unigram_logprob. The tercile window runs "
        "per language — at 100 TB swap NTILE for approx-quantile cut "
        "points broadcast back (plan shape otherwise unchanged) "
        "(SURVEY §2.D)."
    ),
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = toks.agg(F.count("*").alias("n_total"))
    lp = (
        F.round(F.log(F.col("c").cast("double") / F.col("n_total")), 6)
        .cast("decimal(18,6)")
        .alias("lp")
    )
    per_doc = (
        toks.join(F.broadcast(cnt), "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "lang", lp)
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias("avg_lp"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("avg_lp"), F.asc("doc_id"))
    tiled = per_doc.withColumn("tile", F.ntile(3).over(w))
    return (
        tiled.groupBy("lang", "tile")
        .agg(F.count("*").alias("n_docs"), F.min("avg_lp").alias("lo"), F.max("avg_lp").alias("hi"))
        .select(
            "lang",
            F.when(F.col("tile") == 1, "head")
            .when(F.col("tile") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n_docs",
            "lo",
            "hi",
            "tile",
        )
        .orderBy("lang", "tile")
        .drop("tile")
    )


@register(
    "vocab_coverage",
    oracle=f"""
WITH tok AS (SELECT lang, unnest({_TOKS}) AS tok FROM documents),
cnt AS (SELECT lang, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2),
ranked AS (
  SELECT lang, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rank
  FROM cnt
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN rank <= 10 THEN n ELSE 0 END) * 10000 // SUM(n) AS BIGINT) AS cov10_bps,
       CAST(SUM(CASE WHEN rank <= 25 THEN n ELSE 0 END) * 10000 // SUM(n) AS BIGINT) AS cov25_bps,
       CAST(SUM(CASE WHEN rank <= 50 THEN n ELSE 0 END) * 10000 // SUM(n) AS BIGINT) AS cov50_bps
FROM ranked GROUP BY lang ORDER BY lang
""",
    doc=(
        "Vocabulary coverage curve per language: the share of corpus "
        "tokens covered by the top-10/25/50 most frequent types "
        "(count-ranked, token tiebreak) — the vocab-size-planning "
        "input for tokenizer training (where does coverage saturate?). "
        "Exact-integer bps from conditional sums over the vocab-sized "
        "ranked table; the rank window never touches corpus rows "
        "(SURVEY §2.D)."
    ),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
    cnt = tok.groupBy("lang", "tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
    ranked = cnt.withColumn("rank", F.row_number().over(w))
    cov = lambda k: (  # noqa: E731
        F.sum(F.when(F.col("rank") <= k, F.col("n")).otherwise(0)) * 10000
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.sum("n").cast("bigint").alias("n_tokens"),
            cov(10).alias("c10"),
            cov(25).alias("c25"),
            cov(50).alias("c50"),
        )
        .select(
            "lang",
            "n_types",
            "n_tokens",
            F.expr("c10 div n_tokens").cast("bigint").alias("cov10_bps"),
            F.expr("c25 div n_tokens").cast("bigint").alias("cov25_bps"),
            F.expr("c50 div n_tokens").cast("bigint").alias("cov50_bps"),
        )
        .orderBy("lang")
    )


@register(
    "charclass_profile",
    oracle="""
WITH d AS (
  SELECT lang,
         length(text) AS nc,
         len(regexp_extract_all(text, '[a-zA-Z]')) AS nl,
         len(regexp_extract_all(text, '[0-9]')) AS nd,
         len(regexp_extract_all(text, '\\s')) AS nw
  FROM documents
)
SELECT lang,
       CAST(SUM(nc) AS BIGINT) AS total_chars,
       CAST(SUM(nl) * 10000 // SUM(nc) AS BIGINT) AS letter_bps,
       CAST(SUM(nd) * 10000 // SUM(nc) AS BIGINT) AS digit_bps,
       CAST(SUM(nw) * 10000 // SUM(nc) AS BIGINT) AS space_bps,
       CAST((SUM(nc) - SUM(nl) - SUM(nd) - SUM(nw)) * 10000 // SUM(nc) AS BIGINT) AS other_bps
FROM d GROUP BY lang ORDER BY lang
""",
    doc=(
        "Character-class composition per language: letters / digits / "
        "whitespace / other as exact-integer bps of total characters — "
        "the cheap corpus-health screen that flags binary junk, "
        "markup-heavy or digit-spam shards before tokenization "
        "(complements char_entropy's distributional view, SURVEY "
        "§2.D). One scan, four JVM regex counters per row, map-side "
        "combined integer sums; nothing downstream of the rollup "
        "touches text."
    ),
)
def charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.length("text").alias("nc"),
        F.regexp_count(F.col("text"), F.lit("[a-zA-Z]")).alias("nl"),
        F.regexp_count(F.col("text"), F.lit("[0-9]")).alias("nd"),
        F.regexp_count(F.col("text"), F.lit("\\s")).alias("nw"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.sum("nc").cast("bigint").alias("total_chars"),
            F.expr("sum(nl) * 10000L div sum(nc)").cast("bigint").alias("letter_bps"),
            F.expr("sum(nd) * 10000L div sum(nc)").cast("bigint").alias("digit_bps"),
            F.expr("sum(nw) * 10000L div sum(nc)").cast("bigint").alias("space_bps"),
            F.expr("(sum(nc) - sum(nl) - sum(nd) - sum(nw)) * 10000L div sum(nc)")
            .cast("bigint")
            .alias("other_bps"),
        )
        .orderBy("lang")
    )


KWIC_TERM = "spark"
KWIC_TOP = 20


@register(
    "kwic_contexts",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
u AS (
  SELECT doc_id, toks, u.i
  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)
  WHERE toks[u.i] = '{KWIC_TERM}'
),
c AS (
  SELECT CASE WHEN i > 1 THEN toks[i - 1] ELSE '_' END AS prev_tok,
         CASE WHEN i < len(toks) THEN toks[i + 1] ELSE '_' END AS next_tok
  FROM u
)
SELECT prev_tok, next_tok, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM c GROUP BY prev_tok, next_tok
ORDER BY n_occurrences DESC, prev_tok, next_tok
LIMIT {KWIC_TOP}
""",
    doc=(
        "Keyword-in-context mining: the top (prev, next) token "
        "contexts around every occurrence of the focal term — the "
        "concordance view corpus linguists and prompt-leak hunters "
        "run (complements cooccurrence_pmi's doc-level collocation "
        "with position-level adjacency; SURVEY §2.D). Lambda-free "
        "shape: posexplode the token stream once, per-doc lag/lead "
        "window for neighbors (the sessionize shuffle, keyed by doc), "
        "filter to the focal term AFTER the window so contexts at "
        "doc edges keep their '_' sentinel; context counts map-side "
        "combine and the cut is TakeOrderedAndProject. No per-element "
        "re-tokenization anywhere (the test_plan_guard discipline)."
    ),
)
def kwic_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "tok")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    ctx = tok.select(
        "tok",
        F.coalesce(F.lag("tok").over(w), F.lit("_")).alias("prev_tok"),
        F.coalesce(F.lead("tok").over(w), F.lit("_")).alias("next_tok"),
    )
    return (
        ctx.where(F.col("tok") == KWIC_TERM)
        .groupBy("prev_tok", "next_tok")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "prev_tok", "next_tok")
        .limit(KWIC_TOP)
    )


def _code_switch_oracle() -> str:
    langs = list(T.LANG_PROFILES)
    scores = {lang: _stop_sql(words) for lang, words in T.LANG_PROFILES.items()}
    cols = ", ".join(f"{scores[lg]} AS s_{lg}" for lg in langs)
    names = [f"s_{lg}" for lg in langs]
    s1 = "GREATEST(" + ", ".join(names) + ")"
    pair_mins = ", ".join(
        f"LEAST({names[i]}, {names[j]})"
        for i in range(len(names))
        for j in range(i + 1, len(names))
    )
    s2 = f"GREATEST({pair_mins})"  # max of pairwise minimums = 2nd max
    return f"""
WITH sc AS (SELECT lang, {cols} FROM documents),
m AS (
  SELECT lang,
         CASE WHEN {s2} > 0 AND 2 * {s2} >= {s1} THEN 1 ELSE 0 END AS mixed
  FROM sc
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(mixed) AS BIGINT) AS n_mixed,
       CAST(SUM(mixed) * 10000 // COUNT(*) AS BIGINT) AS mixed_bps
FROM m GROUP BY lang ORDER BY lang
"""


@register(
    "code_switch_report",
    oracle=_code_switch_oracle(),
    doc=(
        "Code-switching / mixed-language QA: docs whose SECOND-best "
        "stopword-profile score is at least half the best — the "
        "screen that catches interleaved-language documents a hard "
        "argmax langid silently misfiles (they degrade both the "
        "declared shard and token statistics; SURVEY §2.D). The "
        "second-max over the 5 per-language integer scores is the "
        "max-of-pairwise-minimums identity — pure integer GREATEST/"
        "LEAST, engine-identical. One scan, one projection of the "
        "score vector, map-side-combined per-declared-lang rollup."
    ),
)
def code_switch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = T.lang_scores(F.col("text"))
    langs = list(scores)
    sc = docs.select("lang", *[scores[lg].alias(f"s_{lg}") for lg in langs])
    names = [F.col(f"s_{lg}") for lg in langs]
    s1 = F.greatest(*names)
    pair_mins = [
        F.least(names[i], names[j])
        for i in range(len(names))
        for j in range(i + 1, len(names))
    ]
    s2 = F.greatest(*pair_mins)
    mixed = F.when((s2 > 0) & (2 * s2 >= s1), 1).otherwise(0)
    return (
        sc.select("lang", mixed.alias("mixed"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("mixed").cast("bigint").alias("n_mixed"),
            F.expr("sum(mixed) * 10000L div count(*)").cast("bigint").alias("mixed_bps"),
        )
        .orderBy("lang")
    )


@register(
    "activity_punchcard",
    oracle="""
SELECT isodow(ts) AS dow, dayname(ts) AS day_name,
       CAST(date_part('hour', ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2, 3 ORDER BY dow, hour
""",
    doc=(
        "Weekday×hour activity punchcard (counts + distinct users "
        "per cell) — the classic 168-cell rhythm view behind "
        "staffing/maintenance-window decisions (reference "
        "hourly/daily patterns axis, SURVEY §2.H). One scan, "
        "map-side-combined counts; the distinct-user count shuffles "
        "(cell, user) pairs once — bounded by active users per cell, "
        "never raw events."
    ),
)
def activity_punchcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday(F.col("ts")) + 1).alias("dow"),
            F.date_format("ts", "EEEE").alias("day_name"),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


def _text_drift_sql() -> str:
    ca = "CAST(na AS DOUBLE) / na_tot * ln(CAST(2 * na * nb_tot AS DOUBLE) / (na * nb_tot + nb * na_tot))"
    cb = "CAST(nb AS DOUBLE) / nb_tot * ln(CAST(2 * nb * na_tot AS DOUBLE) / (nb * na_tot + na * nb_tot))"
    return f"""
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS mid FROM documents),
c AS (
  SELECT source,
         CASE WHEN doc_id <= mid.mid THEN 0 ELSE 1 END AS half,
         UNNEST({_TOKS}) AS tok
  FROM documents, mid
),
cnt AS (SELECT source, half, tok, COUNT(*) AS n FROM c GROUP BY 1, 2, 3),
tot AS (SELECT source, half, SUM(n) AS n_tot FROM cnt GROUP BY 1, 2),
shared AS (
  SELECT a.source, a.n AS na, b.n AS nb, ta.n_tot AS na_tot, tb.n_tot AS nb_tot
  FROM cnt a
  JOIN cnt b ON a.source = b.source AND a.tok = b.tok AND a.half = 0 AND b.half = 1
  JOIN tot ta ON a.source = ta.source AND ta.half = 0
  JOIN tot tb ON b.source = tb.source AND tb.half = 1
),
agg AS (
  SELECT source, na_tot, nb_tot,
         SUM(CAST(ROUND({ca}, 9) AS DECIMAL(18,9))) AS sum_a,
         SUM(CAST(ROUND({cb}, 9) AS DECIMAL(18,9))) AS sum_b,
         SUM(na) AS sa, SUM(nb) AS sb
  FROM shared GROUP BY 1, 2, 3
)
SELECT source,
       CAST(na_tot AS BIGINT) AS n_tok_first,
       CAST(nb_tot AS BIGINT) AS n_tok_second,
       CAST(500 * CAST((sum_a + sum_b) * 1000000000 AS BIGINT)
            + (693147180559945::HUGEINT *
               ((1000000000::HUGEINT * (na_tot - sa)) // na_tot
                + (1000000000::HUGEINT * (nb_tot - sb)) // nb_tot))
              // 2000000000000::HUGEINT
            AS BIGINT) AS jsd_pico
FROM agg ORDER BY source
"""


@register(
    "text_drift",
    oracle=_text_drift_sql(),
    doc=(
        "Per-source ingest drift: Jensen-Shannon divergence between "
        "each source's unigram distribution over the FIRST and SECOND "
        "half of its documents (id-midpoint split — the monotone "
        "ingest-order mapping embedding_drift uses for vectors, "
        "applied to text; SURVEY §2.D). A rising jsd flags a source "
        "whose content is changing under the pipeline — template "
        "rollouts, crawler drift, topic shifts — before it skews "
        "training mixtures tuned on old profiles. Same exact-"
        "arithmetic shape as js_divergence: integer-product "
        "probability folds, per-token terms rounded to DECIMAL(18,9) "
        "before the distributed sum, absent-token ln(2) mass from "
        "integer remainders; the half-pair join is token-key bounded "
        "and the midpoint is a 1-row broadcast. jsd ships as "
        "pure-integer jsd_pico: 500*(10^9*(sum_a+sum_b)) plus the "
        "absent mass as (ln2*10^15 literal) * (ppb remainders) div "
        "2*10^12 — every op exact integer (HUGEINT/DECIMAL(38,0)), no "
        "final ROUND(double), no engine-evaluated ln(2)."
    ),
)
def text_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(
        F.expr("(min(doc_id) + max(doc_id)) div 2").alias("mid")
    )
    c = (
        docs.crossJoin(F.broadcast(mid))
        .select(
            "source",
            F.when(F.col("doc_id") <= F.col("mid"), 0).otherwise(1).alias("half"),
            F.explode(T.tokens(F.col("text"))).alias("tok"),
        )
    )
    # cache the vocab-sized (source, half, tok) count table: it feeds
    # four branches (half-a counts, half-b counts, two totals) and
    # caching stops the corpus tokenize + midpoint broadcast from
    # re-evaluating per branch (the dedup-family sh.cache() convention)
    cnt = c.groupBy("source", "half", "tok").agg(F.count("*").alias("n")).cache()
    tot = cnt.groupBy("source", "half").agg(F.sum("n").alias("n_tot"))
    a = cnt.where(F.col("half") == 0).select("source", "tok", F.col("n").alias("na"))
    b = cnt.where(F.col("half") == 1).select("source", "tok", F.col("n").alias("nb"))
    ta = tot.where(F.col("half") == 0).select("source", F.col("n_tot").alias("na_tot"))
    tb = tot.where(F.col("half") == 1).select("source", F.col("n_tot").alias("nb_tot"))
    shared = (
        a.join(b, ["source", "tok"])
        .join(F.broadcast(ta), "source")
        .join(F.broadcast(tb), "source")
    )
    ca = (
        F.col("na").cast("double")
        / F.col("na_tot")
        * F.log(
            (2 * F.col("na") * F.col("nb_tot")).cast("double")
            / (F.col("na") * F.col("nb_tot") + F.col("nb") * F.col("na_tot"))
        )
    )
    cb = (
        F.col("nb").cast("double")
        / F.col("nb_tot")
        * F.log(
            (2 * F.col("nb") * F.col("na_tot")).cast("double")
            / (F.col("nb") * F.col("na_tot") + F.col("na") * F.col("nb_tot"))
        )
    )
    agg = shared.groupBy("source", "na_tot", "nb_tot").agg(
        F.sum(F.round(ca, 9).cast("decimal(18,9)")).alias("sum_a"),
        F.sum(F.round(cb, 9).cast("decimal(18,9)")).alias("sum_b"),
        F.sum("na").alias("sa"),
        F.sum("nb").alias("sb"),
    )
    # exact pico-unit presentation: the shared-token mass is the exact
    # DECIMAL(18,9) sum (*10^9*500 = pico/2), the absent-token mass is
    # ln2 as the INTEGER literal 693147180559945 (ln2*10^15, engine-
    # independent) times ppb integer remainders — every op is exact
    # integer arithmetic in DECIMAL(38,0), so no final ROUND(double)
    # and no engine-evaluated ln(2)
    jsd = F.expr(
        "500 * CAST((sum_a + sum_b) * 1000000000 AS BIGINT)"
        " + CAST((CAST(693147180559945 AS DECIMAL(38,0)) *"
        " ((CAST(1000000000 AS DECIMAL(38,0)) * (na_tot - sa)) div na_tot"
        "  + (CAST(1000000000 AS DECIMAL(38,0)) * (nb_tot - sb)) div nb_tot))"
        " div 2000000000000 AS BIGINT)"
    )
    return agg.select(
        "source",
        F.col("na_tot").cast("bigint").alias("n_tok_first"),
        F.col("nb_tot").cast("bigint").alias("n_tok_second"),
        jsd.cast("bigint").alias("jsd_pico"),
    ).orderBy("source")


_NOVELTY_K = 4  # word n-gram width for the novelty screen


@register(
    "ngram_novelty",
    oracle=f"""
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS mid FROM documents),
tok AS (
  SELECT doc_id, lang, CASE WHEN doc_id <= mid.mid THEN 0 ELSE 1 END AS half,
         {_TOKS} AS toks
  FROM documents, mid
),
g AS (
  SELECT lang, half, UNNEST(
    CASE WHEN len(toks) >= {_NOVELTY_K}
         THEN list_transform(range(1, len(toks) - {_NOVELTY_K - 2}),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
         ELSE [] END) AS ng
  FROM tok
),
seen AS (SELECT DISTINCT lang, ng FROM g WHERE half = 0),
test AS (
  SELECT g.lang, COUNT(*) AS n_test_ngrams,
         SUM(CASE WHEN s.ng IS NULL THEN 1 ELSE 0 END) AS n_novel
  FROM g LEFT JOIN seen s ON g.lang = s.lang AND g.ng = s.ng
  WHERE g.half = 1
  GROUP BY g.lang
)
SELECT lang,
       CAST(n_test_ngrams AS BIGINT) AS n_test_ngrams,
       CAST(n_novel AS BIGINT) AS n_novel,
       CAST(n_novel * 10000 // n_test_ngrams AS BIGINT) AS novelty_bps
FROM test ORDER BY lang
""",
    doc=(
        f"N-gram novelty screen: share of the corpus's SECOND id-half "
        f"{_NOVELTY_K}-grams never seen in the first half, per language "
        "(integer bps) — the memorization/novelty measurement "
        "generative-model evals run against training data (low novelty "
        "= the new data re-treads old text; pairs with vocab_growth's "
        "unigram saturation curve at the phrase level; SURVEY §2.D). "
        "One tokenize pass feeds both halves; the first-half distinct "
        "n-gram set joins the second-half stream on the (lang, ngram) "
        "key — vocabulary-bounded shuffle, never docs x positions; "
        "counts and rates are pure integers with non-negative "
        "truncating div in both engines."
    ),
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.expr("(min(doc_id) + max(doc_id)) div 2").alias("mid"))
    toks = (
        parallelize_scan(docs)
        .crossJoin(F.broadcast(mid))
        .select(
            "lang",
            F.when(F.col("doc_id") <= F.col("mid"), 0).otherwise(1).alias("half"),
            T.tokens(F.col("text")).alias("toks"),
        )
    )
    # materialize the token array before the per-position transform
    # (the O(rows x positions) re-tokenization pitfall — see
    # c63730c/bad7b7a); filter >= k first so transform bounds are valid
    k = _NOVELTY_K
    grams = (
        toks.where(F.size("toks") >= k)
        .select(
            "lang",
            "half",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {k}), "
                    f"i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3]))"
                )
            ).alias("ng"),
        )
    )
    seen = grams.where(F.col("half") == 0).select("lang", "ng").distinct()
    test = (
        grams.where(F.col("half") == 1)
        .join(seen.withColumn("hit", F.lit(1)), ["lang", "ng"], "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_test_ngrams"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).cast("bigint").alias("n_novel"),
        )
    )
    return test.select(
        "lang",
        "n_test_ngrams",
        "n_novel",
        F.expr("n_novel * 10000 div n_test_ngrams").cast("bigint").alias("novelty_bps"),
    ).orderBy("lang")


_BURST_MIN_DF = 5
_BURST_TOP = 20


@register(
    "burstiness",
    oracle=f"""
WITH tok AS (SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
d AS (SELECT tok, doc_id, COUNT(*) AS n FROM tok GROUP BY tok, doc_id),
s AS (
  SELECT tok, CAST(SUM(n) AS BIGINT) AS cf, CAST(COUNT(*) AS BIGINT) AS df
  FROM d GROUP BY tok
)
SELECT tok AS term, cf, df,
       CAST(cf * 100 // df AS BIGINT) AS burstiness_centi
FROM s WHERE df >= {_BURST_MIN_DF}
ORDER BY burstiness_centi DESC, term LIMIT {_BURST_TOP}
""",
    doc=(
        "Term burstiness (Church/Gale): mean occurrences per "
        "CONTAINING document (collection frequency over document "
        "frequency, exact integer centi-units) for terms above a "
        f"df>={_BURST_MIN_DF} floor, top-{_BURST_TOP} burstiest — "
        "separates topical terms (bursty: many hits in few docs) from "
        "function words (spread: ~1 hit everywhere), the signal that "
        "tunes BM25-style saturation and stopword lists beyond raw "
        "frequency (SURVEY §2.D). Two map-side-combined aggregates "
        "over one exploded token stream, TakeOrderedAndProject cut; "
        "pure integer arithmetic end to end."
    ),
)
def burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    d = tok.groupBy("tok", "doc_id").agg(F.count("*").alias("n"))
    s = d.groupBy("tok").agg(
        F.sum("n").cast("bigint").alias("cf"),
        F.count("*").cast("bigint").alias("df"),
    )
    return (
        s.where(F.col("df") >= _BURST_MIN_DF)
        .select(
            F.col("tok").alias("term"),
            "cf",
            "df",
            F.expr("cf * 100 div df").cast("bigint").alias("burstiness_centi"),
        )
        .orderBy(F.desc("burstiness_centi"), "term")
        .limit(_BURST_TOP)
    )


@register(
    "readability_fk",
    oracle=f"""
WITH d AS (
  SELECT lang, source,
         CAST(len({_TOKS}) AS BIGINT) AS w,
         CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS s,
         CAST(COALESCE(list_sum(list_transform({_TOKS},
             x -> GREATEST(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0) AS BIGINT) AS y
  FROM documents
), f AS (
  SELECT lang, source, w, s, y,
         CASE WHEN 39 * w * w + 1180 * y * s <= 2359 * s * w
              THEN 1 ELSE 0 END AS easy
  FROM d WHERE w > 0
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS sum_words,
       CAST(SUM(s) AS BIGINT) AS sum_sentences,
       CAST(SUM(y) AS BIGINT) AS sum_syllables,
       CAST(SUM(w) * 100 // SUM(s) AS BIGINT) AS words_per_sentence_centi,
       CAST(SUM(y) * 100 // SUM(w) AS BIGINT) AS syllables_per_word_centi,
       CAST(390 * SUM(w) // SUM(s) + 11800 * SUM(y) // SUM(w) - 15590 AS BIGINT)
           AS fk_grade_milli,
       CAST(SUM(easy) * 10000 // COUNT(*) AS BIGINT) AS easy_share_bps
FROM f GROUP BY lang, source ORDER BY lang, source
""",
    doc=(
        "Flesch-Kincaid readability profile per (lang, source) — the "
        "classic curation-grade accessibility signal (Kincaid et al. "
        "1975, public formula: 0.39*words/sentence + 11.8*syllables/"
        "word - 15.59). Sentences = '[.!?]+' runs (min 1), syllables = "
        "vowel-group count per token (min 1, the standard heuristic). "
        "All knife-edges eliminated: the grade is reported in exact "
        "integer milli-units over BIGINT sums, and the per-doc 'easy' "
        "band (grade <= 8) is the cross-multiplied integer predicate "
        "39*w*w + 1180*y*s <= 2359*s*w — no float ever materializes. "
        "One scan + one map-side-combined groupBy(lang, source): "
        "embarrassingly parallel at 100 TB, shuffle is |lang x source| "
        "partial-agg rows (SURVEY §2.D; complements gopher_quality and "
        "quality_score as a third independent filter axis)."
    ),
)
def readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(
        "lang",
        "source",
        T.tokens(F.col("text")).alias("toks"),
        F.greatest(
            F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
        ).cast("bigint").alias("s"),
    )
    d = tokd.select(
        "lang",
        "source",
        "s",
        F.size("toks").cast("bigint").alias("w"),
        F.coalesce(
            F.aggregate(
                "toks",
                F.lit(0).cast("bigint"),
                lambda a, x: a
                + F.greatest(F.lit(1), F.regexp_count(x, F.lit("[aeiouy]+"))),
            ),
            F.lit(0).cast("bigint"),
        ).alias("y"),
    ).where(F.col("w") > 0)
    f = d.withColumn(
        "easy",
        F.when(
            39 * F.col("w") * F.col("w") + 1180 * F.col("y") * F.col("s")
            <= 2359 * F.col("s") * F.col("w"),
            1,
        ).otherwise(0),
    )
    out = f.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("sum_words"),
        F.sum("s").alias("sum_sentences"),
        F.sum("y").alias("sum_syllables"),
        F.sum("easy").alias("s_easy"),
    )
    return (
        out.select(
            "lang",
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_words").cast("bigint").alias("sum_words"),
            F.col("sum_sentences").cast("bigint").alias("sum_sentences"),
            F.col("sum_syllables").cast("bigint").alias("sum_syllables"),
            F.expr("sum_words * 100L div sum_sentences")
            .cast("bigint")
            .alias("words_per_sentence_centi"),
            F.expr("sum_syllables * 100L div sum_words")
            .cast("bigint")
            .alias("syllables_per_word_centi"),
            F.expr(
                "390L * sum_words div sum_sentences"
                " + 11800L * sum_syllables div sum_words - 15590L"
            )
            .cast("bigint")
            .alias("fk_grade_milli"),
            F.expr("s_easy * 10000L div n_docs")
            .cast("bigint")
            .alias("easy_share_bps"),
        )
        .orderBy("lang", "source")
    )


KEYWORDS_PER_DOC = 3


@register(
    "doc_keywords",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tf, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
  FROM s
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, CAST(tf AS BIGINT) AS tf, score
FROM r WHERE rank <= {KEYWORDS_PER_DOC} ORDER BY doc_id, rank
""",
    doc=(
        "Per-document TF-IDF keyword extraction (SURVEY §2.D — the "
        "auto-tagging surface next to categorize_docs; the reference "
        "tags emails via LLM, src/llm_integration.py:94-150 — this is "
        "the deterministic lexical analog): top-3 terms per doc by "
        "tf x ln(N/df), rounded score then lexical tie-break (the "
        "tfidf_search float convention). One tokenize+count shuffle "
        "builds the (doc, term, tf) table; df and N are vocabulary-"
        "sized broadcasts joined back onto it; the per-doc rank "
        "window is the only other corpus-sized sort. Keywords stream "
        "out per doc — the persisted tag table a search/labeling "
        "service reads."
    ),
)
def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    # materialize the postings table once: both df (its term rollup)
    # and the scoring join read it, and without this the tokenize +
    # count pipeline builds twice (the dup_graph_degrees lesson). At
    # cluster scale this is the persisted inverted (doc, term, tf)
    # table every downstream reader shares.
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).localCheckpoint(eager=True)
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    s = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        s.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KEYWORDS_PER_DOC)
        .select(
            "doc_id",
            F.col("rank").cast("bigint").alias("rank"),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            "score",
        )
        .orderBy("doc_id", "rank")
    )


@register(
    "hapax_rate_by_source",
    oracle=f"""
WITH t AS (
  SELECT source, unnest({_TOKS}) AS term FROM documents
),
c AS (SELECT source, term, COUNT(*) AS n FROM t GROUP BY 1, 2)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT)
         AS hapax_bps,
       CAST(COUNT(*) * 10000 // SUM(n) AS BIGINT) AS ttr_bps
FROM c GROUP BY source ORDER BY source
""",
    doc=(
        "Hapax-legomenon rate and type-token ratio per source — the "
        "OCR/gibberish fingerprint (clean prose has a stable hapax "
        "share; OCR noise and random text push it toward 100% because "
        "every error mints a new 'word'; machine-generated boilerplate "
        "pushes BOTH ratios toward 0). One tokenize + (source, term) "
        "count — shuffles only the distinct vocabulary per source, "
        "never token instances — then a map-side-combined per-source "
        "rollup; all ratios exact integer bps. Complements "
        "vocab_stats' global view with the per-source contrast "
        "mixture_weights consumes (SURVEY §2.D)."
    ),
)
def hapax_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(T.tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("n"))
    )
    hap = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return (
        c.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            hap.cast("bigint").alias("n_hapax"),
            F.expr(
                "sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000 div count(*)"
            )
            .cast("bigint")
            .alias("hapax_bps"),
            F.expr("count(*) * 10000 div sum(n)").cast("bigint").alias("ttr_bps"),
        )
        .orderBy("source")
    )


def _fertility_oracle() -> str:
    """Per-language tokenizer fertility from the same static BPE fact
    table as bpe_token_count (_bpe_expected.py): token counts depend
    only on the text, so the per-doc join + per-lang sums are exact in
    any engine; an uncovered text drops its row and fails the gate."""
    from email_etl_spark.plans._bpe_expected import EXPECTED

    vals = ",\n".join(f"('{h}', {n})" for h, n, _ in EXPECTED)
    return f"""
WITH expected(h, nb) AS (VALUES {vals}),
per_doc AS (
  SELECT d.lang, e.nb, len({_TOKS}) AS nw, length(d.text) AS nc
  FROM documents d JOIN expected e ON md5(d.text) = e.h
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(nb) AS BIGINT) AS bpe_tokens,
       CAST(SUM(nw) AS BIGINT) AS words,
       CAST((20000 * SUM(nb) + SUM(nw)) // (2 * SUM(nw)) AS BIGINT)
           AS fertility_e4,
       CAST((20000 * SUM(nc) + SUM(nb)) // (2 * SUM(nb)) AS BIGINT)
           AS chars_per_token_e4
FROM per_doc GROUP BY lang ORDER BY lang
"""


@register(
    "tokenizer_fertility",
    oracle=_fertility_oracle(),
    doc=(
        "Tokenizer fertility by language: BPE tokens per word and "
        "chars per BPE token — THE standard multilingual-tokenizer "
        "eval (fertility >> 1 means a language is over-segmented, "
        "paying more sequence length per sentence; the first number "
        "a vocab-allocation decision reads). Spark side runs the real "
        "merge-loop BPE (functions/bpe.py, Arrow pandas_udf) + the "
        "JVM-regex word count in ONE scan and reduces to per-lang "
        "integer sums (map-side combined); ratios ship as half-up "
        "integer e4 units — exact, no ROUND(double). Oracle joins the generated "
        "static fact table (scripts/gen_bpe_expected.py) — the "
        "bpe_token_count convention — so the driver hash-checks the "
        "whole aggregation path (SURVEY §2.D)."
    ),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.functions.bpe import bpe_token_count_col

    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    per_doc = docs.select(
        "lang",
        bpe_token_count_col(F.col("text")).cast("bigint").alias("nb"),
        T.token_count(F.col("text")).cast("bigint").alias("nw"),
        F.length("text").cast("bigint").alias("nc"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nb").cast("bigint").alias("bpe_tokens"),
            F.sum("nw").cast("bigint").alias("words"),
            F.sum("nc").cast("bigint").alias("chars"),
        )
        # half-up integer e4 units — exact, no ROUND(double) on the
        # count-ratio quotients (r9 halfway-class conversion)
        .select(
            "lang",
            "n_docs",
            "bpe_tokens",
            "words",
            F.expr("(20000 * bpe_tokens + words) div (2 * words)")
            .cast("bigint")
            .alias("fertility_e4"),
            F.expr("(20000 * chars + bpe_tokens) div (2 * bpe_tokens)")
            .cast("bigint")
            .alias("chars_per_token_e4"),
        )
        .orderBy("lang")
    )


BPE_PAIR_TOPK = 50


@register(
    "bpe_pair_counts",
    oracle=f"""
WITH w AS (
  SELECT u.w AS word
  FROM documents,
       UNNEST({_TOKS}) AS u(w)
),
p AS (
  SELECT substr(word, i.i, 2) AS pair
  FROM w, UNNEST(range(1, length(word))) AS i(i)
  WHERE length(word) >= 2
)
SELECT pair, COUNT(*) AS n
FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT {BPE_PAIR_TOPK}
""",
    doc=(
        "Adjacent-symbol pair counts over the corpus — the DISTRIBUTED "
        "step of BPE tokenizer training (each merge iteration picks "
        "argmax over exactly these statistics; at 100 TB the pair "
        "count is the only part that must scan the corpus — the "
        "argmax+table update is driver-side over a vocab-sized "
        "summary, which is how functions/bpe.py's trainer consumes "
        "it). Entirely JVM-side: words from one regex split, pairs "
        "from transform(sequence(...)) — a lambda-free explode, no "
        "Python in the hot path; count is map-side combined and the "
        "top-50 cut is TakeOrderedAndProject with a lexical tiebreak "
        "(SURVEY §2.D)."
    ),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
        ).alias("word")
    ).where(F.length("word") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(BPE_PAIR_TOPK)
    )


KN_D = 0.75  # absolute discount


@register(
    "kneser_ney_bigram",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, toks[u.i] AS w1, toks[u.i + 1] AS w2
  FROM tok CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1 FROM c2 GROUP BY w1),
cont AS (SELECT w2, COUNT(*) AS cont FROM c2 GROUP BY w2),
t AS (SELECT COUNT(*) AS t FROM c2),
scored AS (
  SELECT b.doc_id,
         CAST(ROUND(LN(
             (CAST(c2.c2 AS DOUBLE) - {KN_D}) / c1.c1
             + ({KN_D} * c1.n1 / c1.c1) * (CAST(cont.cont AS DOUBLE) / t.t)
           ), 6) AS DECIMAL(18,6)) AS lp
  FROM bg b
  JOIN c2 USING (w1, w2) JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN t
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(lp) AS DOUBLE) AS kn_logprob,
       CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_kn_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
""",
    doc=(
        "Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; "
        "Chen & Goodman 1998 — THE n-gram smoothing): "
        "p(w2|w1) = max(c-D,0)/c(w1·) + D·N1+(w1·)/c(w1·) · "
        "N1+(·w2)/|bigram types| — the continuation-probability term "
        "is what separates it from bigram_logprob's raw MLE (words "
        "frequent only inside fixed phrases stop looking probable "
        "everywhere). All counts — bigram, left-marginal, follower "
        "types, continuation types, type total — are exact-integer "
        "map-side-combined aggregates off ONE bigram stream; the "
        "log-prob is a single structurally-identical double expression "
        "in both engines, rounded to DECIMAL(18,6) before the per-doc "
        "sum (order-insensitive at any parallelism) (SURVEY §2.D)."
    ),
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    tok = docs.select("doc_id", toks.alias("toks"))
    bg = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # the bigram-count table feeds FOUR branches (c1, cont, t, and the
    # scoring join) and a lazy branch re-runs the whole
    # tokenize+explode+agg lineage per consumer — localCheckpoint
    # truncates it to one evaluation (the topic_coherence convention;
    # the table is bigram-vocab-sized, not corpus-sized)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2")).localCheckpoint(eager=True)
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"), F.count("*").alias("n1"))
    cont = c2.groupBy("w2").agg(F.count("*").alias("cont"))
    t = c2.agg(F.count("*").alias("t"))
    lp = F.expr(
        f"CAST(ROUND(LN((CAST(c2 AS DOUBLE) - {KN_D}) / c1"
        f" + ({KN_D} * n1 / c1) * (CAST(cont AS DOUBLE) / t)), 6)"
        " AS DECIMAL(18,6))"
    )
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(t))
        .select("doc_id", lp.alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp").cast("double").alias("kn_logprob"),
            # UNROUNDED quotient on purpose: both engines divide the
            # same exact-decimal sum by the same count, so the IEEE
            # result is bit-identical — a final ROUND(...,6) would
            # re-introduce the decimal-string vs binary half-way
            # divergence it is meant to prevent (sf0.1 doc hit an
            # exact .5 at 6 dp)
            (F.sum("lp").cast("double") / F.count("*")).alias("avg_kn_logprob"),
        )
        .orderBy("doc_id")
    )


SKIPGRAM_TOPK = 30
_NEG = "md5('neg:' || center || ':' || context)"
_HEXP = "0123456789abcdef"
_NEG_H = (
    f"(65536 * (16 * (strpos('{_HEXP}', substr({_NEG}, 1, 1)) - 1)"
    f"          + strpos('{_HEXP}', substr({_NEG}, 2, 1)) - 1)"
    f" + 256 * (16 * (strpos('{_HEXP}', substr({_NEG}, 3, 1)) - 1)"
    f"          + strpos('{_HEXP}', substr({_NEG}, 4, 1)) - 1)"
    f" + (16 * (strpos('{_HEXP}', substr({_NEG}, 5, 1)) - 1)"
    f"    + strpos('{_HEXP}', substr({_NEG}, 6, 1)) - 1))"
)


@register(
    "skipgram_pairs",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
pairs AS (
  SELECT toks[u.i] AS center, toks[u.i + d.d] AS context
  FROM tok
  CROSS JOIN UNNEST(range(1, len(toks) + 1)) AS u(i)
  CROSS JOIN UNNEST([-2, -1, 1, 2]) AS d(d)
  WHERE u.i + d.d >= 1 AND u.i + d.d <= len(toks)
),
c AS (SELECT center, context, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
vocab AS (
  SELECT word, ROW_NUMBER() OVER (ORDER BY word) AS rk, COUNT(*) OVER () AS v
  FROM (SELECT DISTINCT center AS word FROM c)
),
hx AS (SELECT center, context, n, {_NEG_H} AS h FROM c)
SELECT hx.center, hx.context, CAST(hx.n AS BIGINT) AS n, neg.word AS neg_word
FROM hx JOIN vocab neg ON neg.rk = 1 + (hx.h % (SELECT MAX(v) FROM vocab))
ORDER BY hx.n DESC, hx.center, hx.context LIMIT {SKIPGRAM_TOPK}
""",
    doc=(
        "Skip-gram training-pair generation (word2vec / fastText input; "
        "Mikolov et al. 2013): (center, context) pairs within a ±2 "
        "window plus one hash-derived NEGATIVE sample per pair — the "
        "data-gen pass an embedding-training pipeline runs over the "
        "whole corpus. Pair explosion is a lambda-free JVM "
        "flatten(transform(sequence(...))) — no self-join on position "
        "(the window offsets are plan constants), no Python; negatives "
        "come from md5 mod |vocab| against the ranked vocabulary (the "
        "engine-reproducible stand-in for frequency^0.75 sampling — "
        "deterministic, no RNG), joined by equality on rank. Top-30 "
        "pairs with a full (n desc, center, context) tiebreak "
        "(SURVEY §2.D)."
    ),
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    tok = docs.select(toks.alias("toks")).where(F.size("toks") > 0)
    pairs = tok.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(toks) - 1), i ->"
                " filter(transform(array(-2, -1, 1, 2), d ->"
                "   CASE WHEN i + d >= 0 AND i + d < size(toks)"
                "        THEN struct(toks[i] AS center, toks[i + d] AS context)"
                "   END), x -> x IS NOT NULL)))"
            )
        ).alias("p")
    ).select("p.center", "p.context")
    c = pairs.groupBy("center", "context").agg(F.count("*").alias("n"))
    wv = Window.orderBy("word")
    vocab = (
        c.select(F.col("center").alias("word"))
        .distinct()
        .select("word", F.row_number().over(wv).alias("rk"))
    )
    vsize = vocab.agg(F.max("rk").alias("v"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("neg:"), F.col("center"), F.lit(":"), F.col("context"))),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    hx = c.select("center", "context", "n", h.alias("h")).crossJoin(
        F.broadcast(vsize)
    )
    neg = vocab.select(F.col("rk").alias("nrk"), F.col("word").alias("neg_word"))
    return (
        hx.withColumn("nrk", F.lit(1) + F.col("h") % F.col("v"))
        .join(F.broadcast(neg), "nrk")
        .select("center", "context", F.col("n").cast("bigint").alias("n"), "neg_word")
        .orderBy(F.desc("n"), "center", "context")
        .limit(SKIPGRAM_TOPK)
    )


@register(
    "bigram_entropy_text",
    oracle=f"""
WITH tok AS (SELECT lang, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT lang, toks[u.i] AS w1, toks[u.i + 1] AS w2
  FROM tok CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
),
c2 AS (SELECT lang, w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2, 3),
c1 AS (SELECT lang, w1, SUM(n) AS n1 FROM c2 GROUP BY 1, 2),
tot AS (SELECT lang, SUM(n1) AS nt FROM c1 GROUP BY 1),
h AS (
  SELECT c2.lang,
         SUM(CAST(ROUND(-(CAST(c2.n AS DOUBLE) / tot.nt)
                        * ln(CAST(c2.n AS DOUBLE) / c1.n1), 9)
             AS DECIMAL(18,9))) AS h_cond,
         SUM(CAST(ROUND(-(CAST(c2.n AS DOUBLE) / tot.nt)
                        * ln(CAST(c2.n AS DOUBLE) / tot.nt), 9)
             AS DECIMAL(18,9))) AS h_joint
  FROM c2 JOIN c1 USING (lang, w1) JOIN tot USING (lang)
  GROUP BY c2.lang
)
SELECT tot.lang,
       CAST(tot.nt AS BIGINT) AS n_bigrams,
       ROUND(CAST(h.h_cond AS DOUBLE), 4) AS cond_entropy,
       ROUND(CAST(h.h_joint AS DOUBLE), 4) AS joint_entropy
FROM tot JOIN h USING (lang) ORDER BY tot.lang
""",
    doc=(
        "Conditional word-bigram entropy per language, "
        "H(w2|w1) = -sum p(w1,w2) ln p(w2|w1), plus the joint entropy "
        "— the information-theoretic text-complexity metric (how "
        "predictable is the next word; low conditional entropy = "
        "templated/boilerplate text, and the gap joint - cond = H(w1) "
        "recovers the unigram entropy). The TEXT twin of "
        "markov_entropy_rate's event-chain machinery, and the "
        "corpus-level statistic behind Kneser-Ney's effectiveness. "
        "One bigram explode feeds every count table (map-side "
        "combined); entropy terms pre-round to DECIMAL(18,9) before "
        "the order-insensitive per-lang sums (SURVEY §2.D)."
    ),
)
def bigram_entropy_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
    tok = docs.select("lang", toks.alias("toks")).where(F.size("toks") >= 2)
    bg = tok.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
            )
        ).alias("p"),
    ).select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c2 = bg.groupBy("lang", "w1", "w2").agg(F.count("*").alias("n"))
    wl1 = Window.partitionBy("lang", "w1")
    wl = Window.partitionBy("lang")
    t = c2.select(
        "lang",
        "n",
        F.sum("n").over(wl1).alias("n1"),
        F.sum("n").over(wl).alias("nt"),
    )
    term_cond = F.round(
        -(F.col("n").cast("double") / F.col("nt"))
        * F.log(F.col("n").cast("double") / F.col("n1")),
        9,
    ).cast("decimal(18,9)")
    term_joint = F.round(
        -(F.col("n").cast("double") / F.col("nt"))
        * F.log(F.col("n").cast("double") / F.col("nt")),
        9,
    ).cast("decimal(18,9)")
    return (
        t.select("lang", "nt", term_cond.alias("tc"), term_joint.alias("tj"))
        .groupBy("lang", "nt")
        .agg(F.sum("tc").alias("h_cond"), F.sum("tj").alias("h_joint"))
        .select(
            "lang",
            F.col("nt").cast("bigint").alias("n_bigrams"),
            F.round(F.col("h_cond").cast("double"), 4).alias("cond_entropy"),
            F.round(F.col("h_joint").cast("double"), 4).alias("joint_entropy"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# keyphrase_rake — RAKE keyword extraction (Rose et al. 2010).
# ---------------------------------------------------------------------------

_RAKE_MAX_WORDS = 3
_RAKE_TOPK = 10
_RAKE_STOP_RE = r"\b(" + "|".join(T.STOPWORDS) + r")\b"


@register(
    "keyphrase_rake",
    oracle=f"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t FROM documents
),
ph AS (
  SELECT trim(p) AS phrase
  FROM norm, unnest(str_split(regexp_replace(t, '{_RAKE_STOP_RE}', '|', 'g'), '|')) AS u(p)
),
occ AS (
  SELECT phrase, list_filter(str_split(phrase, ' '), x -> x <> '') AS ws
  FROM ph
  WHERE trim(phrase) <> ''
    AND len(list_filter(str_split(phrase, ' '), x -> x <> '')) BETWEEN 1 AND {_RAKE_MAX_WORDS}
),
wstat AS (
  SELECT w, COUNT(*) AS freq, SUM(len(ws)) AS deg
  FROM occ, unnest(ws) AS u(w)
  GROUP BY w
),
wscore AS (
  SELECT w, CAST(ROUND(CAST(deg AS DOUBLE) / freq, 9) AS DECIMAL(18,9)) AS s FROM wstat
),
pcount AS (SELECT phrase, ws, COUNT(*) AS n_occ FROM occ GROUP BY phrase, ws),
pscore AS (
  SELECT p.phrase, p.n_occ, len(p.ws) AS n_words, SUM(ws2.s) AS score
  FROM pcount p, unnest(p.ws) AS u(w)
  JOIN wscore ws2 ON ws2.w = u.w
  GROUP BY p.phrase, p.n_occ, p.ws
)
SELECT phrase,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_occ AS BIGINT) AS n_occurrences,
       CAST(score AS DOUBLE) AS score
FROM pscore
ORDER BY score DESC, n_occ DESC, phrase
LIMIT {_RAKE_TOPK}
""",
    doc=(
        "RAKE keyphrase extraction (Rose et al. 2010, public "
        "algorithm): candidate phrases are maximal stopword-free token "
        "runs (1..3 words; boundaries at stopwords — punctuation is "
        "already folded by the shared tokenizer normalization), word "
        "scores are degree/frequency over phrase co-occurrence, a "
        "phrase scores the sum of its words — the corpus-level "
        "keyword view next to doc_keywords' per-doc TF-IDF tags. "
        "Scale shape: one scan, phrase splitting is row-local regex "
        "(the stopword-boundary regex is a plan constant), word stats "
        "are vocab-sized and broadcast back over the DISTINCT-phrase "
        "table, per-word scores pre-rounded to DECIMAL(18,9) so the "
        "per-phrase sum is order-insensitive, TakeOrderedAndProject "
        "top-{_RAKE_TOPK} (SURVEY §2.D).".replace(
            "{_RAKE_TOPK}", str(_RAKE_TOPK)
        )
    ),
)
def keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    ph = docs.select(
        F.explode(F.split(F.regexp_replace(norm, _RAKE_STOP_RE, "|"), "\\|")).alias("p")
    )
    ws = F.filter(F.split(F.trim(F.col("p")), " "), lambda x: x != "")
    occ = (
        ph.select(F.trim(F.col("p")).alias("phrase"), ws.alias("ws"))
        .where(
            (F.col("phrase") != "")
            & (F.size("ws") >= 1)
            & (F.size("ws") <= _RAKE_MAX_WORDS)
        )
    )
    wstat = (
        occ.select(F.explode("ws").alias("w"), F.size("ws").alias("plen"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
    )
    wscore = wstat.select(
        "w",
        F.round(F.col("deg").cast("double") / F.col("freq"), 9)
        .cast("decimal(18,9)")
        .alias("s"),
    )
    pcount = occ.groupBy("phrase", "ws").agg(F.count("*").alias("n_occ"))
    pscore = (
        pcount.select("phrase", "n_occ", F.size("ws").alias("n_words"), F.explode("ws").alias("w"))
        .join(F.broadcast(wscore), "w")
        .groupBy("phrase", "n_occ", "n_words")
        .agg(F.sum("s").alias("score"))
    )
    return (
        pscore.select(
            "phrase",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_occ").cast("bigint").alias("n_occurrences"),
            F.col("score").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("n_occurrences"), "phrase")
        .limit(_RAKE_TOPK)
    )


@register(
    "simpson_diversity",
    oracle=f"""
WITH t AS (
  SELECT lang, u.tok FROM (SELECT lang, {_TOKS} AS toks FROM documents), unnest(toks) AS u(tok)
),
c AS (SELECT lang, tok, COUNT(*) AS n FROM t GROUP BY 1, 2)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) * 10000
            // (CAST(SUM(n) AS HUGEINT) * (SUM(n) - 1)) AS BIGINT) AS simpson_bps,
       CAST(CAST(SUM(n) AS HUGEINT) * (SUM(n) - 1) AS DOUBLE)
         / CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS DOUBLE) AS inv_simpson
FROM c GROUP BY lang ORDER BY lang
""",
    doc=(
        "Simpson concentration index of the token distribution per "
        "language — P(two random tokens are the same type), the "
        "heavy-top-sensitive twin of the entropy family (entropy "
        "weights the tail, Simpson the head: boilerplate floods show "
        "up here first) — plus the inverse-Simpson 'effective "
        "vocabulary size'. The unbiased form sum n_i(n_i-1)/(N(N-1)) "
        "is PURE INTEGER (HUGEINT/DECIMAL(38,0) products, truncating "
        "div) — no float probabilities at all; one tokenize pass, one "
        "vocab-sized count table, inv_simpson is a single identical "
        "double division (SURVEY §2.D)."
    ),
)
def simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    c = (
        docs.select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("n"))
    )
    return (
        c.groupBy("lang")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.expr(
                "CAST(sum(CAST(n AS DECIMAL(38,0)) * (n - 1)) * 10000 AS DECIMAL(38,0))"
                " div (CAST(sum(n) AS DECIMAL(38,0)) * (sum(n) - 1))"
            )
            .cast("bigint")
            .alias("simpson_bps"),
            F.expr(
                "CAST(CAST(sum(n) AS DECIMAL(38,0)) * (sum(n) - 1) AS DOUBLE)"
                " / CAST(sum(CAST(n AS DECIMAL(38,0)) * (n - 1)) AS DOUBLE)"
            ).alias("inv_simpson"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# lm_cross_source — cross-source unigram-LM perplexity matrix.
# ---------------------------------------------------------------------------


@register(
    "lm_cross_source",
    oracle=f"""
WITH t AS (
  SELECT source, u.tok FROM (SELECT source, {_TOKS} AS toks FROM documents), unnest(toks) AS u(tok)
),
c AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2),
tots AS (SELECT source, SUM(n) AS tt, COUNT(*) AS ty FROM c GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM c),
-- every (target token row) x (model source): c_s = count under the model
x AS (
  SELECT tgt.source AS target, m.source AS model, tgt.tok, tgt.n AS c_t,
         COALESCE(cs.n, 0) AS c_s, m.tt AS t_s
  FROM c tgt
  CROSS JOIN tots m
  LEFT JOIN c cs ON cs.source = m.source AND cs.tok = tgt.tok
),
terms AS (
  SELECT target, model,
         CAST(c_t AS DECIMAL(19,0))
           * CAST(ROUND(LN((CAST(c_s AS DOUBLE) + 1.0) / (t_s + vocab.v)), 9) AS DECIMAL(18,9)) AS w
  FROM x CROSS JOIN vocab
)
SELECT terms.target, terms.model,
       CAST(tt AS BIGINT) AS n_target_tokens,
       -CAST(SUM(w) AS DOUBLE) / tt AS cross_entropy
FROM terms JOIN tots ON tots.source = terms.target
GROUP BY terms.target, terms.model, tt
ORDER BY target, model
""",
    doc=(
        "Cross-source unigram-LM cross-entropy matrix: train an "
        "add-one-smoothed unigram model on each source, score every "
        "source's token distribution under every model — the "
        "directional who-resembles-whom view (js_divergence is "
        "symmetric; a crawl that SUBSUMES another shows low H one way "
        "and high the other), and the standard cheap proxy for "
        "domain-similarity data selection next to dsir_weights. "
        "Per-token ln terms are pre-rounded to DECIMAL(18,9) and "
        "weighted by exact integer counts, so distributed sums are "
        "order-insensitive; the matrix is sources² rows, the join is "
        "vocab-key bounded (token-count tables, never documents), "
        "one tokenize pass feeds everything (SURVEY §2.D/§2.L)."
    ),
)
def lm_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    c = (
        docs.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("n"))
    )
    tots = c.groupBy("source").agg(F.sum("n").alias("tt"), F.count("*").alias("ty"))
    vocab = c.agg(F.countDistinct("tok").alias("v"))
    tgt = c.select(
        F.col("source").alias("target"), "tok", F.col("n").alias("c_t")
    )
    models = tots.select(F.col("source").alias("model"), F.col("tt").alias("t_s"))
    cs = c.select(F.col("source").alias("model"), "tok", F.col("n").alias("c_s0"))
    x = (
        tgt.crossJoin(F.broadcast(models))
        .join(cs, ["model", "tok"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "target",
            "model",
            "c_t",
            F.coalesce(F.col("c_s0"), F.lit(0)).alias("c_s"),
            "t_s",
            "v",
        )
    )
    # DECIMAL(19,0) x DECIMAL(18,9) -> DECIMAL(38,9): exactly at
    # Spark's precision cap, so the product keeps all 9 decimals. A
    # bare BIGINT operand promotes to DECIMAL(20,0) and the (39,9)
    # result gets precision-adjusted to (38,8) — silently rounding
    # each term to 8 dp while DuckDB keeps 9 (measured 1e-11 drift).
    w = F.col("c_t").cast("decimal(19,0)") * F.round(
        F.log((F.col("c_s").cast("double") + 1.0) / (F.col("t_s") + F.col("v"))), 9
    ).cast("decimal(18,9)")
    return (
        x.select("target", "model", w.alias("w"))
        .groupBy("target", "model")
        .agg(F.sum("w").alias("sw"))
        .join(tots.withColumnRenamed("source", "target"), "target")
        .select(
            "target",
            "model",
            F.col("tt").cast("bigint").alias("n_target_tokens"),
            (-F.col("sw").cast("double") / F.col("tt")).alias("cross_entropy"),
        )
        .orderBy("target", "model")
    )


# ---------------------------------------------------------------------------
# collocation_llr — Dunning log-likelihood-ratio collocations.
# ---------------------------------------------------------------------------

LLR_MIN_COUNT = 5
LLR_TOP = 20


def _llr_expr() -> str:
    """Dunning G² from the bigram contingency table, as ONE shared
    expression over the exact integer marginals (k terms guard their
    ln with CASE so empty cells contribute 0, the G² convention)."""
    # Expectation cells multiply two corpus-sized marginals — in BIGINT
    # that wraps silently past ~3e9 total bigrams (Spark non-ANSI;
    # DuckDB would widen to HUGEINT, so the engines would diverge).
    # The products feed a double LN anyway, so the first factor is cast
    # to DOUBLE before multiplying — identical below 2^53 and safe
    # above. Observed cells (k) stay exact integers.
    cells = [
        ("k11", "n_ab", "CAST(c1 AS DOUBLE) * c2"),
        ("k12", "c1 - n_ab", "CAST(c1 AS DOUBLE) * (bt - c2)"),
        ("k21", "c2 - n_ab", "(CAST(bt AS DOUBLE) - c1) * c2"),
        ("k22", "bt - c1 - c2 + n_ab", "(CAST(bt AS DOUBLE) - c1) * (bt - c2)"),
    ]
    terms = " + ".join(
        f"(CASE WHEN ({k}) > 0 THEN CAST({k} AS DOUBLE)"
        f" * LN(CAST({k} AS DOUBLE) * bt / ({e})) ELSE 0.0 END)"
        for _, k, e in cells
    )
    return f"ROUND(2.0 * ({terms}), 4)"


@register(
    "collocation_llr",
    oracle=f"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents),
bi AS (
  SELECT toks[u.i] AS w1, toks[u.i + 1] AS w2
  FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
),
cb AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bi GROUP BY 1, 2),
m1 AS (SELECT w1, SUM(n_ab) AS c1 FROM cb GROUP BY w1),
m2 AS (SELECT w2, SUM(n_ab) AS c2 FROM cb GROUP BY w2),
tot AS (SELECT SUM(n_ab) AS bt FROM cb),
scored AS (
  SELECT cb.w1 || ' ' || cb.w2 AS gram, cb.n_ab, {_llr_expr()} AS llr
  FROM cb JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN tot
  WHERE cb.n_ab >= {LLR_MIN_COUNT}
)
SELECT gram, CAST(n_ab AS BIGINT) AS n_ab, llr
FROM scored ORDER BY llr DESC, gram LIMIT {LLR_TOP}
""",
    doc=(
        "Dunning log-likelihood-ratio collocations (Dunning 1993, the "
        "standard significance-aware alternative to PMI): G² over the "
        "exact bigram contingency table — PMI over-rewards rare pairs "
        "(two hapaxes that co-occur once get maximal PMI), G² weighs "
        "the evidence mass, so it surfaces collocations you can "
        "trust at corpus scale; together with cooccurrence_pmi it "
        "brackets phrase-mining / tokenizer-merge candidates. All "
        "four contingency cells derive from the ONE bigram count "
        "table's marginals (no second corpus pass); G² is a single "
        "shared double expression over exact integers, rounded to 4 "
        "dp; TakeOrderedAndProject top-20 (SURVEY §2.D)."
    ),
)
def collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(T.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    idx = F.when(F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
        ),
    )
    bi = tokd.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    cb = bi.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    m1 = cb.groupBy("w1").agg(F.sum("n_ab").alias("c1"))
    m2 = cb.groupBy("w2").agg(F.sum("n_ab").alias("c2"))
    tot = cb.agg(F.sum("n_ab").alias("bt"))
    return (
        cb.where(F.col("n_ab") >= LLR_MIN_COUNT)
        .join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("gram"),
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.expr(_llr_expr()).alias("llr"),
        )
        .orderBy(F.desc("llr"), "gram")
        .limit(LLR_TOP)
    )


@register(
    "yule_k",
    oracle=f"""
WITH t AS (
  SELECT lang, u.tok FROM (SELECT lang, {_TOKS} AS toks FROM documents), unnest(toks) AS u(tok)
),
c AS (SELECT lang, tok, COUNT(*) AS m FROM t GROUP BY 1, 2),
sp AS (SELECT lang, m, COUNT(*) AS vm FROM c GROUP BY 1, 2)
SELECT lang,
       CAST(SUM(m * vm) AS BIGINT) AS n_tokens,
       CAST(SUM(vm) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN m = 1 THEN vm ELSE 0 END) AS BIGINT) AS v1,
       CAST(SUM(CASE WHEN m = 2 THEN vm ELSE 0 END) AS BIGINT) AS v2,
       CAST((SUM(CAST(m AS HUGEINT) * m * vm) - SUM(m * vm)) * 10000000
            // (CAST(SUM(m * vm) AS HUGEINT) * SUM(m * vm)) AS BIGINT) AS yule_k_milli
FROM sp GROUP BY lang ORDER BY lang
""",
    doc=(
        "Yule's K lexical-richness characteristic per language (Yule "
        "1944: K = 10^4 (S2 - N)/N^2 over the frequency spectrum S2 = "
        "sum m^2 V_m) — the classic size-INVARIANT repetitiveness "
        "constant: TTR and hapax rate fall as a corpus grows even "
        "when the text character is unchanged, K does not, so "
        "cross-SF or cross-snapshot comparisons are honest. Reported "
        "in exact integer milli-K (HUGEINT/DECIMAL(38,0) moments, "
        "truncating div); one tokenize pass, vocab-sized counts, "
        "spectrum-sized rollup (SURVEY §2.D)."
    ),
)
def yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    c = (
        docs.select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("m"))
    )
    sp = c.groupBy("lang", "m").agg(F.count("*").alias("vm"))
    return (
        sp.groupBy("lang")
        .agg(
            F.sum(F.col("m") * F.col("vm")).cast("bigint").alias("n_tokens"),
            F.sum("vm").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("m") == 1, F.col("vm")).otherwise(0))
            .cast("bigint")
            .alias("v1"),
            F.sum(F.when(F.col("m") == 2, F.col("vm")).otherwise(0))
            .cast("bigint")
            .alias("v2"),
            F.expr(
                "CAST((sum(CAST(m AS DECIMAL(38,0)) * m * vm) - sum(m * vm)) * 10000000 AS DECIMAL(38,0))"
                " div (CAST(sum(m * vm) AS DECIMAL(38,0)) * sum(m * vm))"
            )
            .cast("bigint")
            .alias("yule_k_milli"),
        )
        .orderBy("lang")
    )


GT_MAX_R = 5


@register(
    "good_turing_counts",
    oracle=f"""
WITH t AS (
  SELECT u.tok FROM (SELECT {_TOKS} AS toks FROM documents), unnest(toks) AS u(tok)
),
c AS (SELECT tok, COUNT(*) AS m FROM t GROUP BY 1),
sp AS (SELECT m AS r, COUNT(*) AS v_r FROM c GROUP BY 1),
n AS (SELECT SUM(r * v_r) AS nt FROM sp),
j AS (
  SELECT a.r, a.v_r, COALESCE(b.v_r, 0) AS v_r1
  FROM sp a LEFT JOIN sp b ON b.r = a.r + 1
  WHERE a.r <= {GT_MAX_R}
)
SELECT CAST(j.r AS BIGINT) AS r,
       CAST(j.v_r AS BIGINT) AS v_r,
       CAST(j.v_r1 AS BIGINT) AS v_r_next,
       CAST((j.r + 1) * j.v_r1 * 1000 // j.v_r AS BIGINT) AS r_star_milli,
       CAST((SELECT v_r FROM sp WHERE r = 1) * 10000 // n.nt AS BIGINT) AS unseen_mass_bps
FROM j CROSS JOIN n ORDER BY r
""",
    doc=(
        "Good-Turing frequency re-estimation over the corpus token "
        "spectrum (Good 1953): adjusted counts r* = (r+1) V_{{r+1}} / "
        "V_r for r <= 5 plus the missing-mass estimate V_1/N — THE "
        "classical answer to 'how much probability belongs to words "
        "we have never seen', and the smoothing companion to "
        "kneser_ney_bigram (KN's discount is calibrated against "
        "exactly these spectrum ratios). Pure integer milli/bps "
        "arithmetic over the frequency-of-frequencies table (spectrum "
        "cardinality <= max token count — tiny); one tokenize pass "
        "feeds vocab then spectrum rollups (SURVEY §2.D)."
    ),
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    c = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("m"))
    )
    sp = c.groupBy(F.col("m").alias("r")).agg(F.count("*").alias("v_r"))
    n = sp.agg(F.sum(F.col("r") * F.col("v_r")).alias("nt"))
    v1 = sp.where(F.col("r") == 1).select(F.col("v_r").alias("v1"))
    nxt = sp.select((F.col("r") - 1).alias("r"), F.col("v_r").alias("v_r1"))
    return (
        sp.where(F.col("r") <= GT_MAX_R)
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(v1))
        .select(
            F.col("r").cast("bigint").alias("r"),
            F.col("v_r").cast("bigint").alias("v_r"),
            F.coalesce(F.col("v_r1"), F.lit(0)).cast("bigint").alias("v_r_next"),
            F.expr("(r + 1) * coalesce(v_r1, 0) * 1000 div v_r")
            .cast("bigint")
            .alias("r_star_milli"),
            F.expr("v1 * 10000 div nt").cast("bigint").alias("unseen_mass_bps"),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# heaps_law_fit — log-log OLS of the vocabulary growth curve.
# ---------------------------------------------------------------------------

_HEAPS_BUCKET = 50  # docs per ingest bucket (vocab_growth's grain)


def _heaps_oracle() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
tb AS (SELECT doc_id // {_HEAPS_BUCKET} AS bucket, COUNT(*) AS n_tok
       FROM tok GROUP BY 1),
fs AS (SELECT tok, MIN(doc_id) AS first_seen FROM tok GROUP BY tok),
vb AS (SELECT first_seen // {_HEAPS_BUCKET} AS bucket, COUNT(*) AS n_new
       FROM fs GROUP BY 1),
cum AS (
  SELECT tb.bucket,
         SUM(tb.n_tok) OVER (ORDER BY tb.bucket) AS cum_tok,
         SUM(COALESCE(vb.n_new, 0)) OVER (ORDER BY tb.bucket) AS cum_vocab
  FROM tb LEFT JOIN vb USING (bucket)
),
pts AS (
  SELECT CAST(ROUND(LN(CAST(cum_tok AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lx,
         CAST(ROUND(LN(CAST(cum_vocab AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ly
  FROM cum WHERE cum_tok > 0 AND cum_vocab > 0
),
s AS (
  SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
         SUM(lx * lx) AS sxx, SUM(ly * ly) AS syy, SUM(lx * ly) AS sxy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS beta,
       ROUND(EXP(CAST(sy AS DOUBLE) / n
             - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * CAST(sx AS DOUBLE) / n), 6) AS k,
       CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
            THEN 0.0
            ELSE ROUND(POWER(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) END AS r2
FROM s
"""


@register(
    "heaps_law_fit",
    oracle=_heaps_oracle(),
    doc=(
        "Heaps-law fit V(N) = K*N^beta over the ingest-order "
        "vocabulary growth curve: log-log OLS on the per-bucket "
        "(cumulative tokens, cumulative vocab) points that "
        "vocab_growth plots — beta is the one-number lexical-novelty "
        "constant (English prose ~0.4-0.6; beta near 1 means every "
        "batch is new vocabulary = dirty tokens; near 0 means the "
        "corpus is saturated and more data buys no diversity). The "
        "ln terms are pre-rounded to DECIMAL(18,9) so the OLS moment "
        "sums are exact and order-insensitive; the point table is "
        "bucket-sized, never corpus-sized (SURVEY §2.D)."
    ),
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    tb = toks.groupBy(
        F.expr(f"doc_id div {_HEAPS_BUCKET}").cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("n_tok"))
    fs = toks.groupBy("tok").agg(F.min("doc_id").alias("first_seen"))
    vb = fs.groupBy(
        F.expr(f"first_seen div {_HEAPS_BUCKET}").cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("n_new"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        tb.join(vb, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tok").over(w).alias("cum_tok"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).alias("cum_vocab"),
        )
        .where((F.col("cum_tok") > 0) & (F.col("cum_vocab") > 0))
    )
    pts = cum.select(
        F.round(F.log(F.col("cum_tok").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("lx"),
        F.round(F.log(F.col("cum_vocab").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("ly"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    # moments stay EXACT decimals through the sums; the OLS combination
    # runs in DOUBLE on the already-cast sums — identical expression
    # text in both engines (wide-decimal products would silently lose
    # scale under Spark's 38-digit cap and cancel catastrophically)
    num = F.expr(
        "n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    den = F.expr(
        "n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    )
    deny = F.expr(
        "n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    beta = num / den
    return s.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(beta, 6).alias("beta"),
        F.round(
            F.exp(
                F.expr("CAST(sy AS DOUBLE) / n")
                - beta * F.expr("CAST(sx AS DOUBLE) / n")
            ),
            6,
        ).alias("k"),
        # saturated-vocab degenerate case (constant ly → deny = 0, the
        # shape of this synthetic corpus): define r2 = 0 identically in
        # both engines instead of 0/0
        F.when(den * deny == 0, F.lit(0.0))
        .otherwise(F.round(F.pow(num, 2) / (den * deny), 6))
        .alias("r2"),
    )


# ---------------------------------------------------------------------------
# gibberish_profile — consonant-run / charclass garbage detection.
# ---------------------------------------------------------------------------

_CONS_RE = "[bcdfghjklmnpqrstvwxyz]{2,}"
_GIB_RUN = 4  # flag threshold: a >=4-consonant run is un-English-like


@register(
    "gibberish_profile",
    oracle=f"""
WITH r AS (
  SELECT source,
         COALESCE(list_max(list_transform(
           regexp_extract_all(lower(text), '{_CONS_RE}'), x -> length(x))), 0)
           AS max_run
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(max_run) AS BIGINT) AS max_consonant_run,
       CAST(SUM(CASE WHEN max_run >= {_GIB_RUN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(CASE WHEN max_run >= {_GIB_RUN} THEN 1 ELSE 0 END) * 10000
            // COUNT(*) AS BIGINT) AS flagged_bps,
       CAST(SUM(max_run) * 1000 // COUNT(*) AS BIGINT) AS mean_run_milli
FROM r GROUP BY source ORDER BY source
""",
    doc=(
        "OCR-garbage / gibberish screen per source: the longest "
        "consonant run in each doc (regexp_extract_all over a shared "
        "pattern — a >=4-consonant run almost never occurs in real "
        "English but is the signature of OCR line noise, base64 "
        "blobs, and mojibake), rolled up to per-source flag rates in "
        "exact integer bps/milli units. Complements charclass_profile "
        "(which counts character CLASSES, not runs) in the quality-"
        "filter family; one scan, source-sized rollup (SURVEY §2.D)."
    ),
)
def gibberish_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    runs = F.expr(
        f"transform(regexp_extract_all(lower(text), '{_CONS_RE}', 0), x -> length(x))"
    )
    max_run = F.coalesce(F.array_max(runs), F.lit(0))
    r = docs.select("source", max_run.alias("max_run"))
    flagged = F.when(F.col("max_run") >= _GIB_RUN, 1).otherwise(0)
    return (
        r.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("max_run").cast("bigint").alias("max_consonant_run"),
            F.sum(flagged).cast("bigint").alias("n_flagged"),
            F.expr(
                f"sum(CASE WHEN max_run >= {_GIB_RUN} THEN 1 ELSE 0 END) * 10000"
                " div count(*)"
            )
            .cast("bigint")
            .alias("flagged_bps"),
            F.expr("sum(max_run) * 1000 div count(*)")
            .cast("bigint")
            .alias("mean_run_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# burrows_delta — stylometric source distance.
# ---------------------------------------------------------------------------

_BD_TERMS = 20  # most-frequent-terms basis (Burrows' classic uses MFW)


def _burrows_oracle() -> str:
    return f"""
WITH tok AS (
  SELECT source, u.tok FROM (SELECT source, {_TOKS} AS toks FROM documents),
       unnest(toks) AS u(tok)
),
top AS (
  SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
                   ORDER BY c DESC, tok LIMIT {_BD_TERMS})
),
st AS (SELECT source, COUNT(*) AS n_tok FROM tok GROUP BY source),
rf AS (
  -- relative frequency in exact integer NANO-units (truncating
  -- integer division): every later moment stays integer, because
  -- ROUND(double, 9) is ulp-unstable across engines
  SELECT t.source, t.tok,
         CAST(COUNT(*) * 1000000000 // ANY_VALUE(st.n_tok) AS BIGINT) AS rf_nano
  FROM tok t JOIN top USING (tok) JOIN st ON t.source = st.source
  GROUP BY t.source, t.tok
),
grid AS (
  SELECT s.source, tp.tok, COALESCE(rf.rf_nano, 0) AS rf_nano
  FROM (SELECT source FROM st) s CROSS JOIN top tp
  LEFT JOIN rf ON rf.source = s.source AND rf.tok = tp.tok
),
ns AS (SELECT COUNT(*) AS s FROM st),
mu AS (
  SELECT tok, CAST(SUM(rf_nano) // (SELECT s FROM ns) AS BIGINT) AS mu_nano
  FROM grid GROUP BY tok
),
sig AS (
  SELECT g.tok,
         CAST(ROUND(SQRT(CAST(SUM(CAST(g.rf_nano - m.mu_nano AS DECIMAL(38,0))
                                  * (g.rf_nano - m.mu_nano)) AS DOUBLE)
              / (SELECT s FROM ns))) AS BIGINT) AS sig_nano
  FROM grid g JOIN mu m USING (tok) GROUP BY g.tok
),
z AS (
  -- z in exact integer MICRO-units: sign * (|diff_nano| * 1e6 //
  -- sig_nano) — positive integer division is identical across
  -- engines (ROUND(double, 6) is not: the same quotient can land on
  -- different 6th digits under different half-rules)
  SELECT g.source, g.tok,
         CASE WHEN s.sig_nano > 0
              THEN CASE WHEN g.rf_nano >= m.mu_nano THEN 1 ELSE -1 END
                   * (ABS(g.rf_nano - m.mu_nano) * 1000000 // s.sig_nano)
              ELSE 0 END AS z_micro
  FROM grid g JOIN mu m USING (tok) JOIN sig s ON s.tok = g.tok
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(ABS(a.z_micro - b.z_micro)) // {_BD_TERMS} AS BIGINT)
           AS delta_micro
  FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, delta_micro FROM pairs ORDER BY source_a, source_b
"""


@register(
    "burrows_delta",
    oracle=_burrows_oracle(),
    doc=(
        "Burrows' Delta stylometric distance between sources: z-score "
        "each source's relative frequency of the corpus's top-"
        f"{_BD_TERMS} terms against the cross-source distribution, "
        "distance = mean |z_a − z_b| — the standard authorship/"
        "register-drift measure (two 'different' sources with near-"
        "zero Delta are the same upstream crawl wearing two labels; "
        "complements js_divergence with a function-word-weighted, "
        "variance-normalized view; delta reported in exact integer "
        "micro-units — ROUND(double,6) half-rules differ across "
        "engines). All moments ride pre-rounded "
        "DECIMALs (exact distributed sums); the z grid is "
        "(sources×terms)-sized, the pair join sources²-sized "
        "(SURVEY §2.D)."
    ),
)
def burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
    top = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_BD_TERMS)
        .select("tok")
    )
    # st and grid feed 2 and 4 downstream branches respectively, and a
    # lazy branch re-runs the whole tokenize+explode lineage per
    # consumer (measured: ~12 corpus passes for one query run).
    # localCheckpoint truncates both — they are source-dimension-sized
    # (|sources| and |sources|x20 rows), the topic_coherence class.
    st = tok.groupBy("source").agg(F.count("*").alias("n_tok")).localCheckpoint(eager=True)
    rf = (
        tok.join(F.broadcast(top), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
        .join(st, "source")
        .select(
            "source",
            "tok",
            # exact integer NANO-units (truncating div): all later
            # moments stay integer — ROUND(double, 9) is ulp-unstable
            # across engines
            F.expr("c * 1000000000L div n_tok").cast("bigint").alias("rf_nano"),
        )
    )
    grid = (
        st.select("source")
        .crossJoin(F.broadcast(top))
        .join(rf, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.coalesce(F.col("rf_nano"), F.lit(0)).cast("bigint").alias("rf_nano"),
        )
    ).localCheckpoint(eager=True)
    ns = st.agg(F.count("*").alias("s"))
    mu = (
        grid.groupBy("tok")
        .agg(F.sum("rf_nano").alias("srf"))
        .crossJoin(F.broadcast(ns))
        .select("tok", F.expr("srf div s").cast("bigint").alias("mu_nano"))
    )
    sig = (
        grid.join(F.broadcast(mu), "tok")
        .groupBy("tok")
        .agg(
            F.sum(
                F.expr(
                    "CAST(rf_nano - mu_nano AS DECIMAL(38,0)) * (rf_nano - mu_nano)"
                )
            ).alias("ss")
        )
        .crossJoin(F.broadcast(ns))
        .select(
            "tok",
            F.round(F.sqrt(F.col("ss").cast("double") / F.col("s")))
            .cast("bigint")
            .alias("sig_nano"),
        )
    )
    # z in exact integer micro-units (see the oracle comment):
    # positive integer division is cross-engine deterministic where
    # ROUND(double, 6) is not
    z = (
        grid.join(F.broadcast(mu), "tok")
        .join(F.broadcast(sig), "tok")
        .select(
            "source",
            "tok",
            F.when(
                F.col("sig_nano") > 0,
                F.when(F.col("rf_nano") >= F.col("mu_nano"), 1).otherwise(-1)
                * F.expr("ABS(rf_nano - mu_nano) * 1000000 div sig_nano"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("z_micro"),
        )
    )
    a = z.select(F.col("source").alias("source_a"), "tok", F.col("z_micro").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "tok", F.col("z_micro").alias("zb"))
    return (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.expr(f"sum(ABS(za - zb)) div {_BD_TERMS}")
            .cast("bigint")
            .alias("delta_micro")
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# readability_ari_cli — letter/char-based readability (no syllables).
# ---------------------------------------------------------------------------


@register(
    "readability_ari_cli",
    oracle=f"""
WITH d AS (
  SELECT lang, source,
         CAST(len({_TOKS}) AS BIGINT) AS w,
         CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS l,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]')) AS BIGINT) AS c
  FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS sum_words,
       CAST(SUM(s) AS BIGINT) AS sum_sentences,
       CAST(SUM(l) AS BIGINT) AS sum_letters,
       CAST(SUM(c) AS BIGINT) AS sum_chars,
       CAST(4710 * SUM(c) // SUM(w) + 500 * SUM(w) // SUM(s) - 21430 AS BIGINT)
           AS ari_milli,
       CAST(5880 * SUM(l) // SUM(w) - 29600 * SUM(s) // SUM(w) - 15800 AS BIGINT)
           AS cli_milli
FROM d WHERE w > 0
GROUP BY lang, source ORDER BY lang, source
""",
    doc=(
        "Automated Readability Index + Coleman-Liau per (lang, source) "
        "— the two classic CHARACTER-based readability grades (ARI "
        "1967: 4.71*chars/word + 0.5*words/sentence - 21.43; "
        "Coleman-Liau 1975: 5.88*letters/word - 29.6*sentences/word "
        "- 15.8). They need no syllable heuristic, so alongside "
        "readability_fk the pair gives a syllable-free second opinion "
        "the curation funnel can cross-check (vowel-run counting is "
        "the noisiest part of FK on OCR'd or code-mixed text). "
        "Everything is exact integers: letter/char tallies are regexp "
        "counts, both grades are reported in milli-units over BIGINT "
        "sums with integer division, sentences floor at 1 per doc "
        "(readability_fk convention). One scan + one map-side-combined "
        "groupBy(lang, source) — embarrassingly parallel at 100 TB "
        "(SURVEY §2.D)."
    ),
)
def readability_ari_cli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        "source",
        T.token_count(F.col("text")).cast("bigint").alias("w"),
        F.greatest(F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+")))
        .cast("bigint")
        .alias("s"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]")).cast("bigint").alias("l"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]")).cast("bigint").alias("c"),
    ).where(F.col("w") > 0)
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("sum_words"),
            F.sum("s").cast("bigint").alias("sum_sentences"),
            F.sum("l").cast("bigint").alias("sum_letters"),
            F.sum("c").cast("bigint").alias("sum_chars"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "sum_words",
            "sum_sentences",
            "sum_letters",
            "sum_chars",
            F.expr("4710 * sum_chars div sum_words + 500 * sum_words div sum_sentences - 21430")
            .cast("bigint")
            .alias("ari_milli"),
            F.expr("5880 * sum_letters div sum_words - 29600 * sum_sentences div sum_words - 15800")
            .cast("bigint")
            .alias("cli_milli"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# word_length_profile — character-length distribution of the tokens.
# ---------------------------------------------------------------------------

_WLP_LONG = 7  # tokens with >= 7 chars count as "long"


@register(
    "word_length_profile",
    oracle=f"""
WITH t AS (SELECT lang, UNNEST({_TOKS}) AS tok FROM documents),
d AS (SELECT lang, CAST(len(tok) AS BIGINT) AS wl FROM t)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(MIN(wl) AS BIGINT) AS min_len,
       CAST(MAX(wl) AS BIGINT) AS max_len,
       CAST(SUM(wl) * 100 // COUNT(*) AS BIGINT) AS mean_len_centi,
       ROUND(SQRT((CAST(SUM(wl * wl) AS DOUBLE) * COUNT(*)
                   - CAST(SUM(wl) AS DOUBLE) * SUM(wl))
                  / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1))), 4) AS std_len,
       CAST(SUM(CASE WHEN wl >= {_WLP_LONG} THEN 1 ELSE 0 END) * 10000 // COUNT(*)
            AS BIGINT) AS long_share_bps
FROM d GROUP BY lang ORDER BY lang
""",
    doc=(
        "Word-length distribution per language: token count, min/max/"
        "mean/std character length and the share of long (>=7-char) "
        "tokens. The classic stylometric axis (Mendenhall's "
        "characteristic curves) and a cheap tokenizer-health signal — "
        "a language whose mean word length or long-token share drifts "
        "between snapshots usually changed tokenization or picked up "
        "boilerplate, before perplexity moves (complements vocab_stats' "
        "type-level view with a TOKEN-level one, and charclass_profile's "
        "char classes with LENGTHS). Integer moments (sum, sum-of-"
        "squares off the explode) feed one shared std expression; "
        "one scan + one groupBy(lang) — the explode carries only "
        "(lang, len) pairs, never token strings (SURVEY §2.D)."
    ),
)
def word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", T.tokens(F.col("text")).alias("toks"))
    d = toks.select(
        "lang", F.explode(F.transform("toks", F.length)).alias("wl")
    ).select("lang", F.col("wl").cast("bigint").alias("wl"))
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.min("wl").cast("bigint").alias("min_len"),
            F.max("wl").cast("bigint").alias("max_len"),
            F.sum("wl").cast("bigint").alias("s"),
            F.sum(F.col("wl") * F.col("wl")).cast("bigint").alias("q"),
            F.sum(F.when(F.col("wl") >= _WLP_LONG, 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
        )
        .select(
            "lang",
            "n_tokens",
            "min_len",
            "max_len",
            F.expr("s * 100 div n_tokens").cast("bigint").alias("mean_len_centi"),
            F.round(
                F.sqrt(
                    F.expr(
                        "(CAST(q AS DOUBLE) * n_tokens - CAST(s AS DOUBLE) * s)"
                        " / (CAST(n_tokens AS DOUBLE) * (n_tokens - 1))"
                    )
                ),
                4,
            ).alias("std_len"),
            F.expr("nl * 10000 div n_tokens").cast("bigint").alias("long_share_bps"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# smog_readability — polysyllable-based readability grade.
# ---------------------------------------------------------------------------


@register(
    "smog_readability",
    oracle=f"""
WITH d AS (
  SELECT lang, source,
         CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS s,
         CAST(COALESCE(len(list_filter({_TOKS},
             x -> len(regexp_extract_all(x, '[aeiouy]+')) >= 3)), 0) AS BIGINT) AS p,
         CAST(len({_TOKS}) AS BIGINT) AS w
  FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s) AS BIGINT) AS sum_sentences,
       CAST(SUM(p) AS BIGINT) AS sum_polysyllables,
       CAST(SUM(p) * 10000 // SUM(w) AS BIGINT) AS polysyllable_share_bps,
       ROUND(1.043 * SQRT(30.0 * CAST(SUM(p) AS DOUBLE) / SUM(s)) + 3.1291, 4)
           AS smog_grade
FROM d WHERE w > 0
GROUP BY lang, source ORDER BY lang, source
""",
    doc=(
        "SMOG readability grade per (lang, source) (McLaughlin 1969, "
        "public formula: 1.043*sqrt(30*polysyllables/sentences) + "
        "3.1291): the POLYSYLLABLE-count member of the readability "
        "battery — FK weights mean syllable load, ARI/CLI count "
        "characters, SMOG counts only hard words (>=3 vowel-run "
        "syllables), which tracks comprehension-test scores best on "
        "health/legal text. Polysyllable and sentence tallies are "
        "exact integers off one scan (same vowel-run heuristic and "
        "min-1-sentence floor as readability_fk); the grade is ONE "
        "shared sqrt expression over the two BIGINT sums, plus the "
        "hard-word share in exact bps. Map-side-combined "
        "groupBy(lang, source) (SURVEY §2.D)."
    ),
)
def smog_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "source",
        F.greatest(F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+")))
        .cast("bigint")
        .alias("s"),
        T.tokens(F.col("text")).alias("toks"),
    )
    d = toks.select(
        "lang",
        "source",
        "s",
        F.size("toks").cast("bigint").alias("w"),
        F.coalesce(
            F.size(
                F.filter(
                    F.col("toks"),
                    lambda x: F.regexp_count(x, F.lit("[aeiouy]+")) >= 3,
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("p"),
    ).where(F.col("w") > 0)
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("s").cast("bigint").alias("sum_sentences"),
            F.sum("p").cast("bigint").alias("sum_polysyllables"),
            F.sum("w").cast("bigint").alias("sw"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "sum_sentences",
            "sum_polysyllables",
            F.expr("sum_polysyllables * 10000 div sw")
            .cast("bigint")
            .alias("polysyllable_share_bps"),
            F.round(
                1.043
                * F.sqrt(
                    30.0
                    * F.col("sum_polysyllables").cast("double")
                    / F.col("sum_sentences")
                )
                + 3.1291,
                4,
            ).alias("smog_grade"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# unigram_noise_table — word2vec-style negative-sampling distribution.
# ---------------------------------------------------------------------------

_NOISE_TOP = 50
_NOISE_POW = 0.75


@register(
    "unigram_noise_table",
    oracle=f"""
WITH t AS (SELECT UNNEST({_TOKS}) AS tok FROM documents),
f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY tok),
p AS (
  SELECT tok, c,
         CAST(ROUND(POW(CAST(c AS DOUBLE), {_NOISE_POW}), 6)
              AS DECIMAL(18,6)) AS w
  FROM f
),
s AS (SELECT SUM(w) AS tot FROM p)
SELECT tok, c AS freq,
       CAST((1000000 * CAST(w * 1000000 AS BIGINT))
            // CAST(tot * 1000000 AS BIGINT) AS BIGINT) AS noise_ppm
FROM p CROSS JOIN s
ORDER BY c DESC, tok LIMIT {_NOISE_TOP}
""",
    doc=(
        "Negative-sampling noise distribution (word2vec convention, "
        "Mikolov et al. 2013): unigram frequency raised to 0.75, "
        f"normalized — top-{_NOISE_TOP} table. The 3/4 power is the "
        "published flattening that keeps frequent words from "
        "dominating the noise draws; skipgram_pairs generates the "
        "positive pairs, THIS is the companion artifact a trainer "
        "samples negatives from. Per-token powered weights are "
        "pre-rounded to DECIMAL(18,6) so the normalizer is an exact "
        "order-insensitive sum, and the normalized probability ships "
        "as pure-integer noise_ppm = (10^6*w) div tot over the exact "
        "micro-unit integers (no final ROUND(double), the r8 halfway "
        "hazard); one tokenize scan + one vocab rollup, top-K via "
        "TakeOrderedAndProject (SURVEY §2.D)."
    ),
)
def unigram_noise_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    f = t.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    p = f.select(
        "tok",
        "c",
        F.round(F.pow(F.col("c").cast("double"), _NOISE_POW), 6)
        .cast("decimal(18,6)")
        .alias("w"),
    )
    s = p.agg(F.sum("w").alias("tot"))
    return (
        p.crossJoin(F.broadcast(s))
        .select(
            "tok",
            F.col("c").alias("freq"),
            # w and tot are DECIMAL(18,6): *10^6 recovers exact
            # integers, so the quotient is pure integer arithmetic
            # (DECIMAL(38,0): tot*10^6 passes BIGINT at corpus scale)
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * CAST(w * 1000000 AS DECIMAL(38,0)))"
                " div CAST(tot * 1000000 AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("noise_ppm"),
        )
        .orderBy(F.desc("freq"), "tok")
        .limit(_NOISE_TOP)
    )


# ---------------------------------------------------------------------------
# pii_density_by_source — PII exposure monitoring rollup.
# ---------------------------------------------------------------------------


@register(
    "pii_density_by_source",
    oracle=f"""
WITH seeded AS (
  SELECT source,
         CASE WHEN substr(md5('pii:' || CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                   || CAST((doc_id * 7) % 256 AS VARCHAR)
              ELSE text END AS body
  FROM documents
),
counted AS (
  SELECT source,
         CAST(len(regexp_extract_all(body, '{_PII_EMAIL}')) AS BIGINT) AS ne,
         CAST(len(regexp_extract_all(body, '{_PII_PHONE}')) AS BIGINT) AS np,
         CAST(len(regexp_extract_all(body, '{_PII_IP}')) AS BIGINT) AS ni
  FROM seeded
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_with_pii,
       CAST(SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
            AS BIGINT) AS pii_doc_share_bps,
       CAST(SUM(ne) AS BIGINT) AS n_emails,
       CAST(SUM(np) AS BIGINT) AS n_phones,
       CAST(SUM(ni) AS BIGINT) AS n_ips
FROM counted GROUP BY source ORDER BY source
""",
    doc=(
        "PII exposure rollup per source (emails / phones / IPv4s and "
        "the share of documents carrying ANY, in bps): the monitoring "
        "dashboard over pii_scrub's detectors — scrub transforms "
        "documents one at a time, THIS is the view a privacy review "
        "reads to rank which ingestion sources leak and whether a "
        "release gate should block one (release_gate's privacy row). "
        "Same deterministic md5-gated seeding as pii_scrub (the "
        "synthetic corpus has no natural PII; the check must stay "
        "non-vacuous), same JVM regexes, one scan + one map-side-"
        "combined groupBy(source) (SURVEY §2.D)."
    ),
)
def pii_density_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    footer = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    seeded = F.substring(
        F.md5(F.concat(F.lit("pii:"), F.col("doc_id").cast("string"))), 1, 1
    ).isin("0", "1", "2", "3")
    body = F.when(seeded, F.concat(F.col("text"), footer)).otherwise(F.col("text"))
    counted = docs.select(
        "source",
        F.regexp_count(body, F.lit(_PII_EMAIL)).cast("bigint").alias("ne"),
        F.regexp_count(body, F.lit(_PII_PHONE)).cast("bigint").alias("np"),
        F.regexp_count(body, F.lit(_PII_IP)).cast("bigint").alias("ni"),
    )
    any_pii = (F.col("ne") + F.col("np") + F.col("ni") > 0).cast("bigint")
    return (
        counted.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(any_pii).cast("bigint").alias("n_docs_with_pii"),
            F.expr(
                "SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) * 10000"
                " div COUNT(*)"
            )
            .cast("bigint")
            .alias("pii_doc_share_bps"),
            F.sum("ne").cast("bigint").alias("n_emails"),
            F.sum("np").cast("bigint").alias("n_phones"),
            F.sum("ni").cast("bigint").alias("n_ips"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# term_burstiness_topk — Church–Gale per-term burstiness.
# ---------------------------------------------------------------------------

_TB_TOP = 30


@register(
    "term_burstiness_topk",
    oracle=f"""
WITH t AS (SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents),
f AS (
  SELECT tok,
         CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM t GROUP BY tok
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents)
SELECT tok, cf AS collection_freq, df AS doc_freq,
       CAST(cf * 1000 // df AS BIGINT) AS burstiness_milli,
       CAST(df * 10000 // n.nd AS BIGINT) AS doc_share_bps
FROM f CROSS JOIN n
ORDER BY cf DESC, tok LIMIT {_TB_TOP}
""",
    doc=(
        "Church–Gale term burstiness for the top-30 terms: collection "
        "frequency over document frequency — how many times a term "
        "repeats WITHIN the documents that contain it (burstiness "
        "~1.0 = function-word-like even spread; high = topical/"
        "template terms that clump). The term-level companion to the "
        "doc-level burstiness query, and the signal behind BM25-style "
        "saturation constants and stopword-list audits (a 'stopword' "
        "with high burstiness is actually topical). Exact integer "
        "milli/bps ratios off one tokenize scan + one vocab rollup "
        "(the distinct-doc count shuffles (tok, doc) pairs once), "
        "top-K via TakeOrderedAndProject (SURVEY §2.D)."
    ),
)
def term_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    f = t.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("cf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    n = docs.agg(F.count("*").cast("bigint").alias("nd"))
    return (
        f.crossJoin(F.broadcast(n))
        .select(
            "tok",
            F.col("cf").alias("collection_freq"),
            F.col("df").alias("doc_freq"),
            F.expr("cf * 1000 div df").cast("bigint").alias("burstiness_milli"),
            F.expr("df * 10000 div nd").cast("bigint").alias("doc_share_bps"),
        )
        .orderBy(F.desc("collection_freq"), "tok")
        .limit(_TB_TOP)
    )


# ---------------------------------------------------------------------------
# Lexical-diversity family (round 8): Yule's K and MATTR — the
# curation signals behind "is this corpus template spam or real
# language" (ref: the reference's quality scoring surface,
# src/embeddings.py prepare/quality path, re-expressed as corpus
# statistics). Both are exact-integer formulations: no doubles until
# the final presentation column.
# ---------------------------------------------------------------------------

_MATTR_W = 25  # window tokens; docs shorter than W are excluded


@register(
    "yule_k_by_source",
    oracle=f"""
WITH t AS (SELECT source, UNNEST({_TOKS}) AS tok FROM documents),
g AS (SELECT source, tok, COUNT(*) AS f FROM t GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(f) AS BIGINT) AS n, COUNT(*) AS v,
             SUM(CAST(f AS HUGEINT) * f) AS sf2
      FROM g GROUP BY source)
SELECT source, n AS n_tokens, CAST(v AS BIGINT) AS n_types,
       CAST(sf2 AS BIGINT) AS sum_f2,
       CAST((10000000::HUGEINT * (sf2 - n)) // (CAST(n AS HUGEINT) * n)
            AS BIGINT) AS yule_k_milli
FROM s ORDER BY source
""",
    doc=(
        "Yule's K vocabulary-richness characteristic per source "
        "(Yule 1944): K = 10^4 (sum_m m^2 V_m - N) / N^2 over the "
        "term-frequency spectrum — length-invariant where raw TTR "
        "(vocab_stats) is not, so it compares sources with different "
        "document sizes; high K = repetitive/template text, the "
        "boilerplate-source signal for curation. Two-level aggregation "
        "(the (source, token) shuffle is map-side combined, the "
        "source rollup touches distinct types only); sum f^2 kept in "
        "DECIMAL(38,0)/HUGEINT and K floored in pure integer "
        "milli-units — no double knife-edge at any corpus size "
        "(SURVEY §2.L)."
    ),
)
def yule_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
    g = t.groupBy("source", "tok").agg(F.count("*").alias("f"))
    s = g.groupBy("source").agg(
        F.sum("f").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("v"),
        F.sum(F.col("f").cast("decimal(38,0)") * F.col("f")).alias("sf2"),
    )
    return s.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.col("sf2").cast("bigint").alias("sum_f2"),
        F.expr(
            "cast((cast(10000000 as decimal(38,0)) * (sf2 - n))"
            " div (cast(n as decimal(38,0)) * n) as bigint)"
        ).alias("yule_k_milli"),
    ).orderBy("source")


def _mattr_contrib_kernel(it):
    """Per-doc MATTR distinct-in-window contribution sum. The lag is
    DOC-LOCAL (previous occurrence of the same token within the doc),
    so the old posexplode + per-(doc, tok) lag window shuffled the
    whole token stream for a computation that never crosses documents
    (r10, guide §2.4 — remove shuffles outright). All-integer math:
    s = Σ_pos max(min(pos, nt−W) − max(pos−W+1, prev+1, 0) + 1, 0),
    identical to the old window formula term by term."""
    import pandas as pd

    W = _MATTR_W
    rows = []
    for pdf in it:
        for did, src, toks in zip(pdf["doc_id"], pdf["source"], pdf["toks"]):
            if toks is None:  # NULL text -> null token array (ADVICE r10)
                continue
            nt = len(toks)
            if nt < W:
                continue
            last: dict = {}
            s = 0
            cap = nt - W
            for pos, tok in enumerate(toks):
                prev = last.get(tok, -1)
                lo = max(pos - W + 1, prev + 1, 0)
                hi = min(pos, cap)
                if hi >= lo:
                    s += hi - lo + 1
                last[tok] = pos
            rows.append((int(did), src, s, nt))
    yield pd.DataFrame(rows, columns=["doc_id", "source", "s", "nt"])



@register(
    "mattr_diversity",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, UNNEST({_TOKS}) AS tok,
         generate_subscripts({_TOKS}, 1) - 1 AS pos
  FROM documents
),
n AS (SELECT doc_id, COUNT(*) AS nt FROM t GROUP BY 1),
p AS (
  SELECT doc_id, pos,
         COALESCE(LAG(pos) OVER (PARTITION BY doc_id, tok ORDER BY pos), -1) AS prev
  FROM t
),
c AS (
  SELECT p.doc_id,
         SUM(GREATEST(LEAST(pos, nt - {_MATTR_W}) -
                      GREATEST(pos - {_MATTR_W} + 1, prev + 1, 0) + 1, 0)) AS s
  FROM p JOIN n ON p.doc_id = n.doc_id WHERE nt >= {_MATTR_W} GROUP BY 1
),
m AS (
  SELECT c.doc_id,
         (10000 * s) // ((nt - {_MATTR_W} + 1) * {_MATTR_W}) AS bps
  FROM c JOIN n USING (doc_id)
),
j AS (SELECT m.doc_id, bps, d.source FROM m JOIN documents d USING (doc_id))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(bps) // COUNT(*) AS BIGINT) AS avg_mattr_bps,
       CAST(MIN(bps) AS BIGINT) AS min_mattr_bps,
       CAST(MAX(bps) AS BIGINT) AS max_mattr_bps
FROM j GROUP BY source ORDER BY source
""",
    doc=(
        f"MATTR moving-average type-token ratio (Covington & McFall "
        f"2010), window W={_MATTR_W}: mean TTR over every W-token "
        "window — the length-robust per-document diversity score raw "
        "TTR inflates for short docs. Distributed formulation: instead "
        "of materializing windows (O(positions x W)), each token "
        "occurrence counts the windows where it is the FIRST in-window "
        "occurrence of its type — #windows = |[max(pos-W+1, prev+1, 0), "
        "min(pos, n-W)]| off ONE lag window over the (doc, token) "
        "stream, and the previous-occurrence lag is DOC-LOCAL, so the "
        "whole statistic is one zero-shuffle Arrow pass over the token "
        "arrays + two rollups, exact integer bps end to end (the "
        "sum over occurrences telescopes to sum of per-window distinct "
        "counts — the standard distinct-in-sliding-window identity). "
        f"Docs under {_MATTR_W} tokens are excluded (documented "
        "contract) (SURVEY §2.L)."
    ),
)
def mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    W = _MATTR_W
    docs = load_table(spark, sf_dir, "documents")
    from email_etl_spark.io import parallelize_scan

    # tokenization stays JVM-side (T.tokens is the engine's contract —
    # a Python re-implementation would re-open the lower()/regex
    # unicode parity question); the kernel only does exact integer
    # arithmetic over the token ARRAY, so the result is bit-identical
    c = (
        parallelize_scan(docs)
        .select("doc_id", "source", T.tokens(F.col("text")).alias("toks"))
        .mapInPandas(
            _mattr_contrib_kernel,
            schema="doc_id bigint, source string, s bigint, nt bigint",
        )
    )
    m = c.select(
        "doc_id",
        "source",
        F.expr(f"(10000 * s) div ((nt - {W} + 1) * {W})").alias("bps"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr("sum(bps) div count(*)").cast("bigint").alias("avg_mattr_bps"),
            F.min("bps").cast("bigint").alias("min_mattr_bps"),
            F.max("bps").cast("bigint").alias("max_mattr_bps"),
        )
        .orderBy("source")
    )


@register(
    "gunning_fog",
    oracle=f"""
WITH d AS (
  SELECT lang, source,
         CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS s,
         CAST(COALESCE(len(list_filter({_TOKS},
             x -> len(regexp_extract_all(x, '[aeiouy]+')) >= 3)), 0) AS BIGINT) AS p,
         CAST(len({_TOKS}) AS BIGINT) AS w
  FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS sum_words,
       CAST(SUM(s) AS BIGINT) AS sum_sentences,
       CAST(SUM(p) AS BIGINT) AS sum_complex,
       ROUND(0.4 * (CAST(SUM(w) AS DOUBLE) / SUM(s)
                    + 100.0 * CAST(SUM(p) AS DOUBLE) / SUM(w)), 4) AS fog_index
FROM d WHERE w > 0
GROUP BY lang, source ORDER BY lang, source
""",
    doc=(
        "Gunning fog index per (lang, source) (Gunning 1952, public "
        "formula: 0.4*(words/sentences + 100*complex/words)): the "
        "fourth member of the readability battery — unlike SMOG it "
        "weights BOTH sentence length and hard-word share, the "
        "classic editorial readability target (fog ~12 = broad-"
        "audience prose). Same exact-integer sentence and >=3-vowel-"
        "run complex-word tallies as smog_readability off one scan; "
        "the index is ONE shared double expression over three BIGINT "
        "sums. Map-side-combined groupBy(lang, source) (SURVEY §2.D)."
    ),
)
def gunning_fog(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        "source",
        F.greatest(F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+")))
        .cast("bigint")
        .alias("s"),
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("w"),
        F.coalesce(
            F.size(
                F.filter(
                    T.tokens(F.col("text")),
                    lambda x: F.regexp_count(x, F.lit("[aeiouy]+")) >= 3,
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("p"),
    ).where(F.col("w") > 0)
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("sum_words"),
            F.sum("s").cast("bigint").alias("sum_sentences"),
            F.sum("p").cast("bigint").alias("sum_complex"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "sum_words",
            "sum_sentences",
            "sum_complex",
            F.round(
                0.4
                * (
                    F.col("sum_words").cast("double") / F.col("sum_sentences")
                    + 100.0 * F.col("sum_complex").cast("double") / F.col("sum_words")
                ),
                4,
            ).alias("fog_index"),
        )
        .orderBy("lang", "source")
    )


@register(
    "bigram_entropy_rate",
    oracle=f"""
WITH tokd AS (SELECT lang, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT lang, UNNEST(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM tokd
),
c2 AS (SELECT lang, bg, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT lang, str_split(bg, ' ')[1] AS w1, SUM(c2) AS c1
       FROM c2 GROUP BY 1, 2),
t AS (
  SELECT c2.lang, c2.c2,
         CAST(ROUND(LN(CAST(c2.c2 AS DOUBLE) / c1.c1), 6) AS DECIMAL(18,6)) AS lp
  FROM c2 JOIN c1 ON c2.lang = c1.lang AND str_split(c2.bg, ' ')[1] = c1.w1
)
SELECT lang,
       CAST(SUM(c2) AS BIGINT) AS n_bigrams,
       CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
       ROUND(-CAST(SUM(c2 * lp) AS DOUBLE) / SUM(c2), 4) AS entropy_rate_nats
FROM t GROUP BY lang ORDER BY lang
""",
    doc=(
        "Bigram conditional entropy rate H(w2|w1) per language "
        "(Shannon 1951's n-gram entropy ladder, one rung above "
        "char_entropy / the unigram family): -sum c12*ln(c12/c1) / N "
        "— the sequence-predictability signal that separates real "
        "language (~4-6 nats) from shuffled or template text, and the "
        "statistic behind perplexity-based quality filtering at the "
        "bigram order. Per-bigram ln terms pre-rounded to "
        "DECIMAL(18,6) then summed exactly (order-insensitive, the "
        "unigram_logprob convention); context counts derive from the "
        "vocab-sized bigram rollup, never a second corpus pass; token "
        "arrays materialize BEFORE the per-position lambda "
        "(functions/hashing.py pitfall) (SURVEY §2.D)."
    ),
)
def bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select("lang", T.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    bgs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bt = tokd.select("lang", F.explode(bgs).alias("bg"))
    c2 = bt.groupBy("lang", "bg").agg(F.count("*").alias("c2"))
    c1 = (
        c2.select("lang", F.substring_index(F.col("bg"), " ", 1).alias("w1"), "c2")
        .groupBy("lang", "w1")
        .agg(F.sum("c2").alias("c1"))
    )
    t = c2.select(
        "lang", F.substring_index(F.col("bg"), " ", 1).alias("w1"), "c2"
    ).join(c1, ["lang", "w1"])
    lp = F.round(F.log(F.col("c2").cast("double") / F.col("c1")), 6).cast(
        "decimal(18,6)"
    )
    return (
        t.select("lang", "c2", lp.alias("lp"))
        .groupBy("lang")
        .agg(
            F.sum("c2").cast("bigint").alias("n_bigrams"),
            F.count("*").cast("bigint").alias("n_bigram_types"),
            F.round(
                -F.sum(F.col("c2") * F.col("lp")).cast("double") / F.sum("c2"), 4
            ).alias("entropy_rate_nats"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# chao1_vocab_estimate — how much vocabulary the corpus has NOT shown yet.
# ---------------------------------------------------------------------------


@register(
    "chao1_vocab_estimate",
    oracle=f"""
WITH t AS (SELECT UNNEST({_TOKS}) AS tok FROM documents),
g AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY tok),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM g
)
SELECT n_tokens, v AS vocab_size, f1 AS hapax_types, f2 AS dis_types,
       CAST(v + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
           AS chao1_estimate,
       CAST((10000 * v) // (v + (f1 * (f1 - 1)) // (2 * (f2 + 1)))
           AS BIGINT) AS coverage_bps
FROM s
""",
    doc=(
        "Chao1 richness estimate of the UNSEEN vocabulary (Chao 1984, "
        "bias-corrected form): observed types V plus f1(f1-1)/(2(f2+1)) "
        "from the hapax/dis-legomena counts — the species-richness "
        "lower bound ecologists use, applied to token types. Where "
        "heaps_law_fit extrapolates V(N) forward, Chao1 answers the "
        "curation question directly: what fraction of the reachable "
        "vocabulary has this corpus already covered (coverage_bps)? "
        "One tokenize scan + one map-side-combined vocab rollup + a "
        "1-row frequency-of-frequencies fold; every output is a pure "
        "integer (the bias-corrected denominator f2+1 avoids the f2=0 "
        "pole; truncating div matches // on nonnegative operands — no "
        "final ROUND(double), SURVEY §2.D)."
    ),
)
def chao1_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    g = t.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    s = g.agg(
        F.count("*").cast("bigint").alias("v"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("bigint").alias("f2"),
    )
    return s.select(
        "n_tokens",
        F.col("v").alias("vocab_size"),
        F.col("f1").alias("hapax_types"),
        F.col("f2").alias("dis_types"),
        F.expr("CAST(v + (f1 * (f1 - 1)) div (2 * (f2 + 1)) AS BIGINT)").alias(
            "chao1_estimate"
        ),
        F.expr(
            "CAST((10000 * v) div (v + (f1 * (f1 - 1)) div (2 * (f2 + 1)))"
            " AS BIGINT)"
        ).alias("coverage_bps"),
    )


# ---------------------------------------------------------------------------
# cms_freq_audit — Count-Min sketch with an exact-error audit.
# ---------------------------------------------------------------------------

_CMS_D = 4      # hash rows
_CMS_W = 1024   # buckets per row
_CMS_TOP = 20   # audited heavy tokens


@register(
    "cms_freq_audit",
    oracle=f"""
WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok),
rows_ AS (SELECT UNNEST(range({_CMS_D})) AS r),
cells AS (
  SELECT r.r,
         CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || tok), 1, 8))
              AS BIGINT) % {_CMS_W} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok CROSS JOIN rows_ r GROUP BY 1, 2
),
top AS (SELECT tok, c FROM exact ORDER BY c DESC, tok LIMIT {_CMS_TOP}),
probe AS (
  SELECT t.tok, t.c, r.r,
         CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.tok), 1, 8))
              AS BIGINT) % {_CMS_W} AS bucket
  FROM top t CROSS JOIN rows_ r
),
est AS (
  SELECT p.tok, p.c, MIN(cl.cnt) AS est
  FROM probe p JOIN cells cl ON cl.r = p.r AND cl.bucket = p.bucket
  GROUP BY p.tok, p.c
)
SELECT tok, c AS exact_count, CAST(est AS BIGINT) AS cms_estimate,
       CAST(est - c AS BIGINT) AS overestimate
FROM est ORDER BY exact_count DESC, tok
""",
    doc=(
        "Count-Min sketch frequency estimation with an EXACT-error "
        "audit: a 4x1024 md5-derived CMS over the corpus token stream "
        "(the streaming-frequency sketch every ingest pipeline "
        "considers before paying for exact counts), probed at the 20 "
        "true heavy hitters against their exact counts — the "
        "overestimate column is the sketch's collision cost made "
        "observable per corpus (CMS never underestimates; the audit "
        "would catch a broken hash lane as a NEGATIVE overestimate). "
        "Every hash lane is md5-derived so DuckDB reproduces the "
        "sketch bit-for-bit (the minhash discipline). Distribution: "
        "two map-side-combined rollups over the exploded token "
        "stream — the 4096-cell sketch (dimension-sized at any "
        "corpus scale) and the exact counter the audit needs anyway "
        "(a production CMS keeps only the first); the 80-row probe "
        "set joins the sketch on (row, bucket) — all integer "
        "arithmetic, no doubles anywhere (SURVEY §2.K)."
    ),
)
def cms_freq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    rows = spark.range(_CMS_D).select(F.col("id").cast("int").alias("r"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("tok"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        % _CMS_W
    )
    cells = (
        toks.crossJoin(F.broadcast(rows))
        .select("r", bucket.alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    top = exact.orderBy(F.desc("c"), "tok").limit(_CMS_TOP)
    probe = top.crossJoin(F.broadcast(rows)).select(
        "tok", "c", "r", bucket.alias("bucket")
    )
    est = (
        probe.join(cells, ["r", "bucket"])
        .groupBy("tok", "c")
        .agg(F.min("cnt").alias("est"))
    )
    return est.select(
        "tok",
        F.col("c").alias("exact_count"),
        F.col("est").cast("bigint").alias("cms_estimate"),
        (F.col("est") - F.col("c")).cast("bigint").alias("overestimate"),
    ).orderBy(F.desc("exact_count"), "tok")


# ---------------------------------------------------------------------------
# ocr_artifact_score — OCR/encoding-damage heuristics per source.
# ---------------------------------------------------------------------------


@register(
    "ocr_artifact_score",
    oracle=f"""
WITH t AS (
  SELECT source, {_TOKS} AS toks FROM documents
),
d AS (
  SELECT source,
         len(toks) AS n_tok,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z][0-9]|[0-9][a-z]')))
           AS n_mixed,
         len(list_filter(toks, x -> len(x) = 1)) AS n_single,
         len(list_filter(toks, x -> regexp_matches(x, '[bcdfghjklmnpqrstvwxz]{{5}}')))
           AS n_consonant
  FROM t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_mixed) * 10000 // GREATEST(SUM(n_tok), 1) AS BIGINT)
         AS mixed_alnum_bps,
       CAST(SUM(n_single) * 10000 // GREATEST(SUM(n_tok), 1) AS BIGINT)
         AS single_char_bps,
       CAST(SUM(n_consonant) * 10000 // GREATEST(SUM(n_tok), 1) AS BIGINT)
         AS consonant_run_bps
FROM d GROUP BY source ORDER BY source
""",
    doc=(
        "OCR/encoding-damage screen per source: the share of tokens "
        "showing the three classic scan/mojibake artifacts — "
        "digit-letter fusions ('l0rem'), single-character debris "
        "(column-split words), and 5+ consonant runs (dropped vowels, "
        "byte garbage) — in exact integer bps. The pre-filter a "
        "pretraining pipeline runs on scanned/converted corpora "
        "before any model-based quality score, and the per-source "
        "attribution that decides whether to fix the extractor or "
        "drop the source. All three predicates are array-local "
        "filters inside one projection (no token explode, no "
        "shuffle beyond the source rollup); ratios are truncating "
        "integer division in both engines (SURVEY §2.D)."
    ),
)
def ocr_artifact_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = T.tokens(F.col("text"))
    d = docs.select(
        "source",
        F.size(toks).alias("n_tok"),
        F.size(F.filter(toks, lambda x: x.rlike("[a-z][0-9]|[0-9][a-z]"))).alias(
            "n_mixed"
        ),
        F.size(F.filter(toks, lambda x: F.length(x) == 1)).alias("n_single"),
        F.size(
            F.filter(toks, lambda x: x.rlike("[bcdfghjklmnpqrstvwxz]{5}"))
        ).alias("n_consonant"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.expr("sum(n_mixed) * 10000 div greatest(sum(n_tok), 1)")
            .cast("bigint")
            .alias("mixed_alnum_bps"),
            F.expr("sum(n_single) * 10000 div greatest(sum(n_tok), 1)")
            .cast("bigint")
            .alias("single_char_bps"),
            F.expr("sum(n_consonant) * 10000 div greatest(sum(n_tok), 1)")
            .cast("bigint")
            .alias("consonant_run_bps"),
        )
        .orderBy("source")
    )
