"""LLM-enrichment queries (SURVEY.md §2.K) — the categorization
surface (ref: categorize_emails, src/llm_integration.py:61-114) run
through the deterministic stub client (llm/stub.py).

The stub derives category/priority/action from sha256 bytes of the
text, which makes the WHOLE enrichment pipeline oracle-checkable:
DuckDB reproduces the same sha256 and the same byte arithmetic, so
the Arrow-batched pandas_udf boundary (the exact seam a real LLM
client plugs into) is verified end-to-end, not just rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.llm.stub import CATEGORIES, PRIORITIES, categorize_documents
from email_etl_spark.plans.registry import register

_HEX = "0123456789abcdef"


def _byte_sql(i: int) -> str:
    """sha256 byte i (0-based) of `text` as an integer, from the hex
    string DuckDB's sha256 returns."""
    hi = f"(strpos('{_HEX}', substr(sha256(text), {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('{_HEX}', substr(sha256(text), {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def _pick_sql(options: tuple[str, ...], byte_expr: str) -> str:
    arr = "[" + ", ".join(f"'{o}'" for o in options) + "]"
    return f"{arr}[({byte_expr} % {len(options)}) + 1]"


_SUMMARY_SQL = (
    "array_to_string(list_filter(str_split_regex(text, '\\s+'), x -> x <> '')[1:12], ' ')"
)


@register(
    "categorize_docs",
    oracle=f"""
SELECT doc_id,
       {_pick_sql(CATEGORIES, _byte_sql(0))} AS category,
       {_pick_sql(PRIORITIES, _byte_sql(1))} AS priority,
       {_byte_sql(2)} % 2 = 1 AS action_required,
       {_SUMMARY_SQL} AS summary
FROM documents ORDER BY doc_id
""",
    doc=(
        "LLM categorization contract over the corpus (category, priority, "
        "action_required, 12-word summary) via the deterministic stub "
        "client — verifies the Arrow pandas_udf enrichment seam "
        "end-to-end against a byte-level SQL oracle (SURVEY §2.K)."
    ),
)
def categorize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        categorize_documents(docs)
        .select("doc_id", "category", "priority", "action_required", "summary")
        .orderBy("doc_id")
    )


from email_etl_spark.llm.stub import _ACTION_CUES, extract_actions_udf  # noqa: E402


def _action_sql() -> str:
    cue_match = " OR ".join(f"regexp_matches(low, '\\b{c}\\b')" for c in _ACTION_CUES)
    hi = f"(strpos('{_HEX}', substr(sha256(low), 1, 1)) - 1)"
    lo = f"(strpos('{_HEX}', substr(sha256(low), 2, 1)) - 1)"
    byte0 = f"({hi} * 16 + {lo})"
    pr = "[" + ", ".join(f"'{p}'" for p in PRIORITIES) + "]"
    return f"""
WITH s AS (
  SELECT doc_id, UNNEST(str_split(replace(text, chr(10), ' '), '.')) AS sent
  FROM documents
),
t AS (
  SELECT doc_id, trim(sent, ' \t\r\n') AS sent_t, lower(trim(sent, ' \t\r\n')) AS low
  FROM s
)
SELECT doc_id,
       substr(sent_t, 1, 120) AS description,
       {pr}[({byte0} % {len(PRIORITIES)}) + 1] AS priority
FROM t
WHERE low <> '' AND ({cue_match})
ORDER BY doc_id, description
"""


@register(
    "action_items",
    oracle=_action_sql(),
    doc=(
        "Action-item extraction contract (ref: extract_action_items, "
        "src/llm_integration.py:179-231): cue-phrase sentences exploded to "
        "one row per item with sha-derived priority, through the stub's "
        "Arrow pandas_udf seam, verified against a sentence-level SQL "
        "oracle (SURVEY §2.K)."
    ),
)
def action_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    acted = docs.withColumn("actions", extract_actions_udf()(F.col("text")))
    return (
        acted.select("doc_id", F.explode("actions").alias("a"))
        .select("doc_id", F.col("a.description").alias("description"), F.col("a.priority").alias("priority"))
        .orderBy("doc_id", "description")
    )


from email_etl_spark.llm.stub import EMBED_DIM, embed_documents  # noqa: E402


def _embed_sql() -> str:
    """Byte-exact SQL twin of llm/stub.py::_embed_one: two sha256
    digests ('0:'||text, '1:'||text) → 64 bytes → b/255.0 - 0.5 →
    unit-normalize (sequential-fold norm, same IEEE op order as the
    Python sum) → quantize each component to FLOAT exactly where the
    engine stores float32."""

    def byte(src: str, i: int) -> str:
        hi = f"(strpos('{_HEX}', substr({src}, {2 * i + 1}, 1)) - 1)"
        lo = f"(strpos('{_HEX}', substr({src}, {2 * i + 2}, 1)) - 1)"
        return f"({hi} * 16 + {lo})"

    comps = []
    for d in range(EMBED_DIM):
        src = "h0x" if d < 32 else "h1x"
        comps.append(f"{byte(src, d % 32)} / 255.0 - 0.5")
    vals = "[" + ", ".join(comps) + "]"
    zero = "[" + ", ".join(["CAST(0.0 AS FLOAT)"] * EMBED_DIM) + "]"
    norm = (
        "sqrt(list_reduce(list_prepend(0.0, list_transform(vals, x -> x * x)), "
        "(a, b) -> a + b))"
    )
    return f"""
WITH e AS (
  SELECT doc_id, text,
         sha256('0:' || text) AS h0x, sha256('1:' || text) AS h1x
  FROM documents
),
v AS (SELECT doc_id, text, {vals} AS vals FROM e),
n AS (SELECT doc_id, text, vals, {norm} AS nrm FROM v),
emb AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text, ' \t\r\n') = '' THEN {zero}
              ELSE list_transform(vals, x -> CAST(x / COALESCE(NULLIF(nrm, 0.0), 1.0) AS FLOAT))
         END AS embedding
  FROM n
)
SELECT doc_id,
       CAST(t.range AS BIGINT) AS dim,
       ROUND(CAST(embedding[t.range] AS DOUBLE), 7) AS comp
FROM emb, range(1, {EMBED_DIM} + 1) t
ORDER BY doc_id, dim
"""


@register(
    "embed_docs",
    oracle=_embed_sql(),
    doc=(
        "Batch embedding contract (ref: generate_batch_embeddings, "
        "src/embeddings.py:50-93) through the stub embedder's Arrow "
        "pandas_udf seam — every float32 component hash-matches a "
        "byte-exact SQL oracle (same sha256 bytes, same IEEE op order, "
        "same float32 quantization point). The vector is EXPLODED to one "
        "(doc_id, dim, comp) row per component: scalar columns survive any "
        "canonicalizer, and decimal rounding of a binary float can never "
        "tie (a tie needs an odd/10^k value, which is not dyadic), so "
        "ROUND is deterministic across engines (SURVEY §2.K)."
    ),
)
def embed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = embed_documents(docs).select("doc_id", "embedding")
    return (
        emb.select("doc_id", F.posexplode("embedding").alias("pos", "comp_f"))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("bigint").alias("dim"),
            F.round(F.col("comp_f").cast("double"), 7).alias("comp"),
        )
        # localCheckpoint (r11, guide §5/§3.3): the global orderBy's
        # RangePartitioning runs a separate SAMPLING job that re-executes
        # the child — including the Arrow embedding UDF — end to end;
        # materializing the exploded rows first means the sort (sampling
        # + exchange) reads them instead of re-embedding the corpus
        .localCheckpoint(eager=True)
        .orderBy("doc_id", "dim")
    )


_RERANK_POOL = 20
_RERANK_TOP = 10


def _rerank_oracle() -> str:
    from email_etl_spark.functions.vectors import duckdb_cosine
    from email_etl_spark.plans.search import QUERY_TERMS, QUERY_VEC_ID

    q = " ".join(QUERY_TERMS)
    prefixed = f"'{q}:' || d.text"
    hi0 = f"(strpos('{_HEX}', substr(sha256({prefixed}), 1, 1)) - 1)"
    lo0 = f"(strpos('{_HEX}', substr(sha256({prefixed}), 2, 1)) - 1)"
    hi1 = f"(strpos('{_HEX}', substr(sha256({prefixed}), 3, 1)) - 1)"
    lo1 = f"(strpos('{_HEX}', substr(sha256({prefixed}), 4, 1)) - 1)"
    byte0 = f"({hi0} * 16 + {lo0})"
    byte1 = f"({hi1} * 16 + {lo1})"
    cos = duckdb_cosine("e.embedding", "q.embedding")
    return f"""
WITH cand AS (
  SELECT e.vec_id, {cos} AS retrieval_sim
  FROM embeddings e
  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
  WHERE e.vec_id <> {QUERY_VEC_ID}
  ORDER BY retrieval_sim DESC, e.vec_id
  LIMIT {_RERANK_POOL}
),
s AS (
  SELECT c.vec_id AS doc_id, c.retrieval_sim,
         {byte0} * 256 + {byte1} AS ce_score
  FROM cand c JOIN documents d ON c.vec_id = d.doc_id
)
SELECT doc_id, retrieval_sim, CAST(ce_score AS BIGINT) AS ce_score,
       CAST(ROW_NUMBER() OVER (ORDER BY ce_score DESC, doc_id) AS BIGINT) AS rank
FROM s ORDER BY rank LIMIT {_RERANK_TOP}
"""


@register(
    "crossencoder_rerank",
    oracle=_rerank_oracle(),
    doc=(
        "Two-stage retrieve-then-rerank: the semantic top-20 candidate "
        "pool (broadcast query vector + TakeOrderedAndProject, the "
        "semantic_topk shape) re-scored by a cross-encoder through the "
        "Arrow pandas_udf enrichment seam and cut to the top-10 by the "
        "new score — the serving pattern every production search stack "
        "runs between cheap retrieval and expensive reading (SURVEY "
        "§2.K). The stub scores sha256('query:doc') so DuckDB "
        "reproduces the seam byte-for-byte; candidate texts join on "
        "ids with the 20-row pool broadcast, so the expensive scorer "
        "only ever sees pool-sized batches — at 100 TB the corpus "
        "never reaches the cross-encoder."
    ),
)
def crossencoder_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from email_etl_spark.functions.vectors import cosine_rounded
    from email_etl_spark.io import parallelize_scan
    from email_etl_spark.llm.stub import crossencoder_udf
    from email_etl_spark.plans.search import QUERY_TERMS, QUERY_VEC_ID

    emb = parallelize_scan(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qvec"))
    pool = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_rounded(F.col("embedding"), F.col("qvec")).alias("retrieval_sim"),
        )
        .orderBy(F.desc("retrieval_sim"), "doc_id")
        .limit(_RERANK_POOL)
    )
    docs = load_table(spark, sf_dir, "documents")
    scored = (
        # the pool is LIMIT-bounded (<= _RERANK_POOL rows) in-plan, so the
        # broadcast hint is provably safe — unlike open-ended candidate
        # streams, which never carry one (see plans/dedup.py)
        docs.join(F.broadcast(pool), "doc_id")
        .select(
            "doc_id",
            "retrieval_sim",
            crossencoder_udf(" ".join(QUERY_TERMS))(F.col("text")).alias("ce_score"),
        )
    )
    w = Window.orderBy(F.desc("ce_score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= _RERANK_TOP)
        .select("doc_id", "retrieval_sim", F.col("ce_score").cast("bigint").alias("ce_score"), "rank")
        .orderBy("rank")
    )
