"""SqlEngine — arbitrary-SQL passthrough (ExecuteSQL / SelectHiveQL).

NiFi ancestors:
* ExecuteSQL (standard/ExecuteSQL.java:60-120): run SQL text — either a
  configured property or the incoming FlowFile's content — against a
  DBCPService connection, emit the result as records. Its test suite
  (TestExecuteSQL.java) exercises both the fixed-query and
  incoming-FlowFile-triggered forms.
* SelectHiveQL (nifi-hive-bundle/.../SelectHiveQL.java): same shape
  against Hive.

Spark-first shape: the "connection pool" is the SparkSession's catalog —
tables register as temp views (from DataFrames or parquet dirs) and the
query goes straight to `spark.sql`, so Catalyst plans SQL text and
DataFrame stages as ONE optimized plan when composed inside a Flow.
Provenance emits the same SEND/RECEIVE vocabulary as the rest of the
engine.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nifi_spark.provenance import ProvenanceWriter


class SqlEngine:
    """Registers tables once, then runs arbitrary SQL text against them."""

    def __init__(self, spark: SparkSession,
                 provenance: ProvenanceWriter | None = None):
        self.spark = spark
        self.provenance = provenance
        self._registered: list[str] = []

    # ---------------- registration ----------------
    def register(self, name: str, source: DataFrame | str) -> "SqlEngine":
        """Register a DataFrame or a parquet path as a queryable view."""
        df = (self.spark.read.parquet(source)
              if isinstance(source, str) else source)
        df.createOrReplaceTempView(name)
        self._registered.append(name)
        return self

    def register_dir(self, sf_dir: str, tables: list[str]) -> "SqlEngine":
        """Register `<sf_dir>/<t>.parquet` for each table name."""
        for t in tables:
            self.register(t, os.path.join(sf_dir, f"{t}.parquet"))
        return self

    # ---------------- execution ----------------
    def sql(self, query: str, batch_id: int = 0,
            stage: str = "execute_sql") -> DataFrame:
        """Run SQL text (ExecuteSQL's fixed-property form). Lazy — the
        returned DataFrame is a plan, not a result."""
        out = self.spark.sql(query)
        if self.provenance:
            self.provenance.emit(out, "SEND", batch_id, stage,
                                 content_col=None)
        return out

    def stage(self, query: str, input_names: list[str] | None = None,
              stage: str = "execute_sql") -> Callable:
        """ExecuteSQL as a Flow stage. `input_names[i]` is the view name
        the stage's i-th input DataFrame is registered under before the
        query runs — the incoming-FlowFile-triggered form, where upstream
        stage outputs become the tables the SQL sees."""
        names = input_names or []

        def run(*dfs: DataFrame) -> DataFrame:
            if len(dfs) != len(names):
                raise ValueError(
                    f"stage {stage!r}: {len(dfs)} inputs but "
                    f"{len(names)} input_names")
            for n, df in zip(names, dfs):
                df.createOrReplaceTempView(n)
            return self.sql(query, stage=stage)

        return run
