"""Provider config/token store (SURVEY §1, ref: src/database.py:333-391).

The reference keeps per-provider config and OAuth tokens in Postgres
tables with ON CONFLICT upserts (save_provider_config /
get_provider_config / save_provider_token / get_provider_token).
Object storage has no in-place update, so the Spark-idiomatic
equivalent is an append-only log + window-latest read — the same
upsert_latest pattern the engine uses for message identity:

- every save appends one row with a monotonically increasing seq
  (wall-clock + per-batch tiebreak);
- reads take the newest row per key via a row_number window;
- expired tokens filter out at read time, matching the reference's
  expires_at check.

State stays tiny (config rows, not corpus rows), so these reads are
driver-cheap everywhere; the value is contract parity, not scale.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_CONFIG_SCHEMA = "provider string, account string, config_key string, config_value string, seq long"
_TOKEN_SCHEMA = (
    "provider string, account string, token_type string, token string, expires_at long, seq long"
)


class ProviderConfigStore:
    """Append-log config/token store rooted at a directory."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.config_path = f"{root}/provider_config"
        self.token_path = f"{root}/provider_tokens"

    # -- config ---------------------------------------------------------
    def save_config(self, provider: str, account: str | None, key: str, value: str) -> None:
        row = [(provider, account or "", key, value, time.time_ns())]
        self.spark.createDataFrame(row, _CONFIG_SCHEMA).write.mode("append").parquet(
            self.config_path
        )

    def get_config(self, provider: str, account: str | None = None) -> dict[str, str]:
        try:
            df = self.spark.read.parquet(self.config_path)
        except Exception:
            return {}
        w = Window.partitionBy("provider", "account", "config_key").orderBy(F.desc("seq"))
        rows = (
            df.where(
                (F.col("provider") == provider) & (F.col("account") == (account or ""))
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("config_key", "config_value")
            .collect()
        )
        return {r.config_key: r.config_value for r in rows}

    # -- tokens ---------------------------------------------------------
    def save_token(
        self,
        provider: str,
        account: str,
        token_type: str,
        token: str,
        expires_at: float | None = None,
    ) -> None:
        exp = int(expires_at) if expires_at is not None else -1
        row = [(provider, account, token_type, token, exp, time.time_ns())]
        self.spark.createDataFrame(row, _TOKEN_SCHEMA).write.mode("append").parquet(
            self.token_path
        )

    def get_token(
        self, provider: str, account: str, token_type: str, now: float | None = None
    ) -> dict[str, Any] | None:
        try:
            df = self.spark.read.parquet(self.token_path)
        except Exception:
            return None
        now = time.time() if now is None else now
        w = Window.partitionBy("provider", "account", "token_type").orderBy(F.desc("seq"))
        rows = (
            df.where(
                (F.col("provider") == provider)
                & (F.col("account") == account)
                & (F.col("token_type") == token_type)
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .where((F.col("expires_at") == -1) | (F.col("expires_at") > F.lit(int(now))))
            .collect()
        )
        if not rows:
            return None
        r = rows[0]
        return {
            "token": r.token,
            "expires_at": None if r.expires_at == -1 else r.expires_at,
        }

    def compact(self) -> DataFrame:
        """Rewrite the config log keeping only the latest row per key —
        the maintenance pass that bounds log growth (run it like any
        table-compaction job)."""
        df = self.spark.read.parquet(self.config_path)
        w = Window.partitionBy("provider", "account", "config_key").orderBy(F.desc("seq"))
        latest = df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
        return latest
