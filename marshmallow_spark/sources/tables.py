"""Table source abstraction: Iceberg when available, parquet fallback.

SURVEY.md §7.3(6): the sandbox has no Iceberg runtime; ``load_table``
keeps the snapshot-id plumbing interface-compatible so the same engine
code runs against ``spark.read.format("iceberg")`` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(
    spark: SparkSession,
    name_or_path: str,
    *,
    sf_dir: str | None = None,
    snapshot_id: str | None = None,
) -> DataFrame:
    """Load a table by name (from ``sf_dir``) or by explicit path.

    On an Iceberg catalog this would be
    ``spark.read.option("snapshot-id", ...).format("iceberg").load(name)``;
    the parquet fallback ignores ``snapshot_id`` (parquet is immutable
    in the sandbox) but keeps the parameter so callers are portable.
    """
    if os.path.sep in name_or_path or name_or_path.endswith(".parquet"):
        path = name_or_path
    else:
        sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        path = os.path.join(sf_dir, f"{name_or_path}.parquet")
    reader = spark.read
    try:
        if snapshot_id is not None and "iceberg" in path:
            reader = reader.option("snapshot-id", snapshot_id)
    except Exception:
        pass
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir=sf_dir) for t in TPCH_TABLES}
