"""Table source abstraction: Iceberg when available, parquet fallback.

SURVEY.md §7.3(6): the sandbox has no Iceberg runtime; ``load_table``
keeps the snapshot-id plumbing interface-compatible so the same engine
code runs against ``spark.read.format("iceberg")`` on a real cluster.

On a cluster, configure an Iceberg catalog the usual way::

    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hive

and pass table identifiers like ``lake.db.clips``; ``snapshot_id``
then pins the read for resumable validation runs (the checkpoint
manifests record it — plans/checkpoint.py). Without a catalog (this
sandbox), names resolve either to a snapshot-manifest table directory
(sources/snapshots.py — Iceberg-semantics time travel over parquet,
where ``snapshot_id`` REALLY pins) or to ``<sf_dir>/<name>.parquet``
(immutable fixtures, nothing to pin).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _iceberg_catalogs(spark: SparkSession) -> set[str]:
    """Catalog names with a configured implementation class."""
    out = set()
    try:
        for k, _ in spark.sparkContext.getConf().getAll():
            parts = k.split(".")
            # spark.sql.catalog.<name> = <impl class>
            if len(parts) == 4 and parts[:3] == ["spark", "sql", "catalog"]:
                out.add(parts[3])
    except Exception:
        pass
    return out


def is_iceberg_identifier(spark: SparkSession, name: str) -> bool:
    """True when ``name`` is a catalog-qualified table of a configured
    Iceberg catalog (``<catalog>.<db>.<table>``)."""
    head = name.split(".", 1)[0]
    return "." in name and head in _iceberg_catalogs(spark)


def load_table(
    spark: SparkSession,
    name_or_path: str,
    *,
    sf_dir: str | None = None,
    snapshot_id: str | None = None,
) -> DataFrame:
    """Load a table by catalog identifier, name (under ``sf_dir``), or
    explicit parquet path.

    Iceberg path: ``spark.read.option("snapshot-id", ...).table(ident)``
    — snapshot pinning is what makes checkpointed runs exactly
    resumable after upstream appends. Parquet fallback ignores
    ``snapshot_id`` (fixtures are immutable) but keeps the parameter so
    callers are portable.
    """
    if is_iceberg_identifier(spark, name_or_path):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(name_or_path)
    if os.path.sep in name_or_path or name_or_path.endswith(".parquet"):
        path = name_or_path
    else:
        sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        path = os.path.join(sf_dir, f"{name_or_path}.parquet")
    from marshmallow_spark.sources.snapshots import SnapshotTable, is_snapshot_table

    if is_snapshot_table(path):
        # sources/snapshots.py: snapshot pinning is REAL here — the read
        # resolves the manifest's exact file list, so later appends
        # cannot leak into a pinned (resumed) validation run.
        sid = int(snapshot_id) if snapshot_id is not None else None
        return SnapshotTable(path).read(spark, sid)
    return spark.read.parquet(path)


#: file-extension -> Spark reader format for ``read_source``
_EXT_FORMATS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def read_source(
    spark: SparkSession,
    path: str,
    *,
    format: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatched file reader (parquet / ORC / CSV / JSON),
    inferring the format from the extension when not given. CSV gets
    ``header=true`` by default; pass an explicit DDL/StructType
    ``schema`` to skip inference (always do this at scale — schema
    inference is an extra full pass over CSV/JSON sources)."""
    if format is None:
        _, ext = os.path.splitext(path.rstrip("/"))
        format = _EXT_FORMATS.get(ext.lower(), "parquet")
    reader = spark.read
    if format == "csv" and "header" not in options:
        options["header"] = "true"
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(format).options(**options).load(path)


def read_jsonl_validated(spark: SparkSession, path: str, schema):
    """Validated JSON-lines ingestion: each line runs through the
    schema's full loads pipeline (per-row missing-vs-NULL, malformed
    rows -> 'Invalid input type.'). Returns the ValidationResult.

    Reading as raw text (one string column) rather than spark.read.json
    keeps the reference's per-row error semantics: a malformed line is
    a violation row, not a silently-corrupt record."""
    lines = spark.read.text(path).withColumnRenamed("value", "_line")
    return schema.loads_df(lines, "_line")


def current_snapshot_id(spark: SparkSession, name: str) -> str | None:
    """Snapshot id to stamp into checkpoint manifests; None on the
    plain-parquet fallback (immutable fixtures need no pin)."""
    if not is_iceberg_identifier(spark, name):
        from marshmallow_spark.sources.snapshots import SnapshotTable, is_snapshot_table

        if os.path.isdir(name) and is_snapshot_table(name):
            return str(SnapshotTable(name).current_snapshot_id())
        return None
    try:
        row = spark.sql(
            f"SELECT snapshot_id FROM {name}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).head()
        return str(row.snapshot_id) if row else None
    except Exception:
        return None


def write_table(
    df: DataFrame,
    name_or_path: str,
    *,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Write to an Iceberg table (catalog identifier), a snapshot-manifest
    table directory (committing a new snapshot), or a parquet path."""
    spark = df.sparkSession
    if is_iceberg_identifier(spark, name_or_path):
        writer = df.writeTo(name_or_path)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    from marshmallow_spark.sources.snapshots import SnapshotTable, is_snapshot_table

    if is_snapshot_table(name_or_path):
        table = SnapshotTable(name_or_path)
        if mode == "overwrite":
            table.overwrite(df)
        else:
            table.append(df)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(name_or_path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int,
    *,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist hash-bucketed on ``key`` (+ per-bucket sort) so repeated
    big-big joins and aggregations on that key are CO-LOCATED: Spark's
    planner reads the bucket layout from the catalog and elides the
    exchange on both sides (a SortMergeJoin with zero shuffles —
    asserted by tests/test_operators.py::test_bucketed_join_no_shuffle).

    At 10^12 rows this is the difference between shuffling the fact
    table once per join and never shuffling it at all: uniqueness,
    referential and resume manifests all key on hash(clip_id), so one
    bucketed materialization serves every downstream stage. Bucket
    count should match the intended shuffle partitioning (A8 manifests
    align to pmod(hash(key), n) with the same n)."""
    w = df.write.mode(mode).bucketBy(num_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir=sf_dir) for t in TPCH_TABLES}
