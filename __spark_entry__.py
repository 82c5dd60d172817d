"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship: compiled schema-validation pass over the
                  sf0.001 tables, returning the union of violation rows.
queries()      -> every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame callables.
oracle_sql()   -> DuckDB-runnable ANSI SQL equivalents (clips_* /
                  audio ops are rows-only: SNR decode is not SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the compiled validation engine over sf0.001 —
    three schemas' violation streams union'd (marshmallow
    load/validate semantics at dataset scale)."""
    from marshmallow_spark.queries import (
        q03_range_violations,
        q04_oneof_violations,
        q06_events_violations,
    )

    sf_dir = "/root/testdata/sf0.001"
    v1 = q03_range_violations(spark, sf_dir).select(
        F.col("row_key").cast("string").alias("row_key"), "field", "message"
    )
    v2 = q04_oneof_violations(spark, sf_dir).select(
        F.col("o_orderkey").cast("string").alias("row_key"), "field", "message"
    )
    v3 = q06_events_violations(spark, sf_dir).select(
        F.col("event_id").cast("string").alias("row_key"), "field", "message"
    )
    return v1.unionByName(v2).unionByName(v3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from marshmallow_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from marshmallow_spark.queries import ORACLES

    return dict(ORACLES)
