"""Query registry backing __spark_entry__.queries()/oracle_sql().

Two dicts, filled in as operators land (SURVEY.md §7 step 7):
- QUERIES[name](spark, sf_dir) -> DataFrame
- ORACLE_SQL[name] -> DuckDB SQL over the pre-registered views
  (region nation customer supplier part orders lineitem events
  documents embeddings). Absent key => rows-only check.

Column-name discipline: every computed column aliased identically on
both sides (driver hashes values after sorting columns by name).
Numeric discipline: aggregates CAST to BIGINT / rounded DOUBLE on both
sides so value-hashes are float-order independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn
    return deco


# Import side-effect modules that populate the registry.
from dygiepp_spark.plans import queries_kg  # noqa: E402,F401

try:
    from dygiepp_spark.plans import queries_sql  # noqa: E402,F401
except ImportError:
    pass
try:
    from dygiepp_spark.plans import queries_corpus  # noqa: E402,F401
except ImportError:
    pass
