"""Deterministic LLM stand-ins (SURVEY.md §2.K).

The reference calls OpenAI for embeddings (ref: src/embeddings.py:27-93)
and gpt-4o-mini for categorization / summarization / action items
(ref: src/llm_integration.py:61-231). Those are external services; the
engine's job is the distributed plumbing around them:

- batching texts into Arrow-sized chunks,
- a pandas_udf boundary with a fixed output schema,
- deterministic retry-safe semantics (same input → same output).

The stubs below keep every one of those properties with hash-derived
outputs, so pipelines are testable offline and swapping in a real
client is a one-function change at the marked seam.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 64

CATEGORIES = ("Work", "Personal", "Finance", "Shopping", "Travel", "Marketing", "Spam", "Other")
PRIORITIES = ("High", "Medium", "Low")

CATEGORY_SCHEMA = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("action_required", T.BooleanType()),
        T.StructField("summary", T.StringType()),
    ]
)


def _embed_one(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic unit-norm embedding from sha256 of the text.
    <-- SEAM: replace with a real embedding client here; the pandas_udf
    wrapper, batching and schema do not change."""
    if not text or not text.strip():
        return [0.0] * dim
    vals: list[float] = []
    counter = 0
    while len(vals) < dim:
        h = hashlib.sha256(f"{counter}:{text}".encode()).digest()
        vals.extend(b / 255.0 - 0.5 for b in h)
        counter += 1
    vals = vals[:dim]
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


def embed_text_udf():
    """Arrow-batched embedding UDF (ref: generate_batch_embeddings,
    src/embeddings.py:50-93 — batching happens per Arrow chunk here
    instead of per HTTP request)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts):
        return texts.map(lambda t: _embed_one(t or ""))

    # asNondeterministic (guide §4.4): a Generate/filter above the
    # embedding column otherwise gets its inferred non-null predicate
    # pushed BELOW the projection, duplicating the ArrowEvalPython node
    # — every row paid the sha256 embedding twice (seen in
    # plans/r11/embed_docs_before.txt: two ArrowEvalPython, the lower
    # one feeding `Filter size(pythonUDF0) > 0`). The function is
    # value-deterministic; the flag only forbids the optimizer from
    # re-evaluating it.
    return embed.asNondeterministic()


def categorize_udf():
    """Deterministic categorizer with the reference's output contract
    (ref: categorize_emails, src/llm_integration.py:61-114): category,
    priority, action_required, summary."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def one(text):
        text = text or ""
        h = hashlib.sha256(text.encode()).digest()
        return {
            "category": CATEGORIES[h[0] % len(CATEGORIES)],
            "priority": PRIORITIES[h[1] % len(PRIORITIES)],
            "action_required": bool(h[2] % 2),
            "summary": " ".join(text.split()[:12]),
        }

    @pandas_udf(CATEGORY_SCHEMA)
    def categorize(texts):
        return pd.DataFrame([one(t) for t in texts])

    return categorize


def embed_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("embedding", embed_text_udf()(F.col(text_col)))


def categorize_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    out = docs.withColumn("llm", categorize_udf()(F.col(text_col)))
    return out.select(*docs.columns, "llm.category", "llm.priority", "llm.action_required", "llm.summary")


def prepare_email_text(subject: Column, sender: Column, body: Column, max_chars: int = 10000) -> Column:
    """Embedding-input composition (ref: prepare_email_text,
    src/embeddings.py:109-149) as a pure column expression."""
    return F.concat(
        F.lit("Subject: "), F.coalesce(subject, F.lit("")), F.lit("\n"),
        F.lit("From: "), F.coalesce(sender, F.lit("")), F.lit("\n\nContent:\n"),
        F.substring(F.coalesce(body, F.lit("")), 1, max_chars),
    )


ACTION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("description", T.StringType()),
            T.StructField("owner", T.StringType()),
            T.StructField("due", T.StringType()),
            T.StructField("priority", T.StringType()),
        ]
    )
)

# Cue vocabulary: generic request phrasing plus ops-verb cues ("merge",
# "dup" → merge this / deduplicate that). The ops verbs make the stub
# fire on terse engineering corpora — without them the extractor is
# vacuous on the test corpus (0 rows), leaving the explode/priority/
# truncation path unexercised by the correctness gate.
_ACTION_CUES = (
    "please", "todo", "action", "must", "need to", "by friday", "asap",
    "merge", "dup",
)


def extract_actions_udf():
    """Deterministic action-item extractor with the reference's output
    contract (ref: extract_action_items, src/llm_integration.py:179-231):
    list of {description, owner, due, priority}. The stub detects cue
    phrases per sentence; the LLM swap-in happens at this seam."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def one(text):
        import re

        text = text or ""
        out = []
        for sent in text.replace("\n", " ").split("."):
            low = sent.strip().lower()
            if not low:
                continue
            # word-boundary match: 'action' must not fire on 'actionable'
            if any(re.search(rf"\b{re.escape(cue)}\b", low) for cue in _ACTION_CUES):
                h = hashlib.sha256(low.encode()).digest()
                out.append(
                    {
                        "description": sent.strip()[:120],
                        "owner": None,
                        "due": None,
                        "priority": PRIORITIES[h[0] % len(PRIORITIES)],
                    }
                )
        return out

    @pandas_udf(ACTION_SCHEMA)
    def extract(texts):
        return pd.Series([one(t) for t in texts])

    # asNondeterministic (guide §4.4, the embed_text_udf fix): the
    # size(actions) > 0 filter above the explode otherwise gets pushed
    # below the projection and the extractor runs twice per row
    return extract.asNondeterministic()


def extract_action_items(docs: DataFrame, text_col: str = "text") -> DataFrame:
    out = docs.withColumn("actions", extract_actions_udf()(F.col(text_col)))
    return (
        out.where(F.size("actions") > 0)
        .select(*docs.columns, F.explode("actions").alias("action"))
        .select(*docs.columns, "action.description", "action.priority")
    )


def crossencoder_udf(query: str):
    """Deterministic cross-encoder relevance stub: 16-bit integer score
    from sha256 of 'query:doc' (ref: the rerank step a real search
    stack runs between retrieval and answer composition — the
    reference scores candidates inside answer_question,
    src/llm_integration.py:200-260).
    <-- SEAM: replace with a real cross-encoder client; the Arrow
    batching, argument closure and LongType schema do not change."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def score(texts):
        return texts.map(
            lambda t: int.from_bytes(
                hashlib.sha256(f"{query}:{t or ''}".encode()).digest()[:2], "big"
            )
        )

    return score
