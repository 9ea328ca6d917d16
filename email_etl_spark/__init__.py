"""email_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the MrBloodrune/email-etl reference
(email ETL: parse → validate → store → semantic/hybrid search →
pattern analytics), re-expressed Spark-first and extended with
large-scale training-data pipeline operators (dedup, ANN, text
analysis, multimodal plumbing).

Everything is declarative DataFrame/SQL so Catalyst plans the physical
execution; Python UDFs are reserved for genuinely non-relational work
and are always Arrow-batched.
"""

__version__ = "0.1.0"
