"""Per-column statistics in ONE aggregation pass (A1/A2 in SURVEY.md §2.7).

Generalizes the reference's required/allow_none counting
(/root/reference/src/marshmallow/fields.py:311-318) and Range bounds
(/root/reference/src/marshmallow/validate.py:283) to dataset scale.

Scale notes: a single ``df.agg`` with many expressions compiles to one
partial+final hash aggregate — one scan, one tiny shuffle regardless of
how many columns are profiled. ``approx_count_distinct`` is
HyperLogLog++ (constant memory per column), the right cardinality
estimator at 10^12 rows where exact countDistinct would shuffle every
distinct value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One-row DataFrame: per column ``<col>_count / _nulls / _null_rate
    / _min / _max / _mean (numeric) / _approx_distinct``."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    columns = columns or list(fields)
    exprs = [F.count(F.lit(1)).alias("row_count")]
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        exprs.append(F.count(col).alias(f"{c}_count"))
        exprs.append(F.sum(col.isNull().cast("long")).alias(f"{c}_nulls"))
        exprs.append(
            (F.sum(col.isNull().cast("long")) / F.count(F.lit(1))).alias(f"{c}_null_rate")
        )
        if isinstance(dt, _NUMERIC):
            exprs.append(F.min(col).alias(f"{c}_min"))
            exprs.append(F.max(col).alias(f"{c}_max"))
            exprs.append(F.avg(col).alias(f"{c}_mean"))
        if approx_distinct:
            exprs.append(
                F.approx_count_distinct(col, rsd).alias(f"{c}_approx_distinct")
            )
    return df.agg(*exprs)


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Tall profile: one row per column (column, row_count, value_count,
    null_count, min_value, max_value, mean_value). SQL-oracle-friendly.

    ONE scan + one partial/final agg: the wide aggregate is computed
    once, then unpivoted on the (single-row) result via explode —
    never N scans for N columns.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    columns = columns or list(fields)
    exprs = [F.count(F.lit(1)).alias("row_count")]
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        is_num = isinstance(dt, _NUMERIC)
        exprs.append(F.count(col).alias(f"{c}__vc"))
        exprs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nc"))
        exprs.append(
            (F.min(col).cast("double") if is_num else F.min(F.lit(None).cast("double"))).alias(f"{c}__mn")
        )
        exprs.append(
            (F.max(col).cast("double") if is_num else F.max(F.lit(None).cast("double"))).alias(f"{c}__mx")
        )
        exprs.append(
            (F.avg(col.cast("double")) if is_num else F.avg(F.lit(None).cast("double"))).alias(f"{c}__av")
        )
    wide = df.agg(*exprs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("row_count").alias("row_count"),
            F.col(f"{c}__vc").alias("value_count"),
            F.col(f"{c}__nc").alias("null_count"),
            F.col(f"{c}__mn").alias("min_value"),
            F.col(f"{c}__mx").alias("max_value"),
            F.col(f"{c}__av").alias("mean_value"),
        )
        for c in columns
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    z: float = 3.0,
    round_digits: int | None = 6,
) -> DataFrame:
    """Per-group z-score outlier rows: (group, id, value, zscore) for
    every row with |value - group_mean| > z * group_stddev — the
    dataset-scale rendering of a per-group Range check whose bounds
    come from the data itself (A-series data-quality family).

    100 TB shape: ONE partial-aggregated shuffle computes the per-group
    (mean, stddev) — output is group-cardinality-sized, so it rides
    back to every row through a BROADCAST join (no second shuffle of
    the data side), and the outlier filter + z computation run in the
    scan's projection. stddev is the sample standard deviation
    (``stddev_samp``, Spark's and DuckDB's shared default), and
    single-member / zero-variance groups emit nothing (NULL or 0
    stddev never satisfies the strict inequality).
    """
    stats = df.groupBy(group_col).agg(
        F.avg(F.col(value_col).cast("double")).alias("_mms_mean"),
        F.stddev(F.col(value_col).cast("double")).alias("_mms_sd"),
    )
    joined = df.select(group_col, id_col, value_col).join(
        F.broadcast(stats), group_col
    )
    zs = (F.col(value_col).cast("double") - F.col("_mms_mean")) / F.col(
        "_mms_sd"
    )
    if round_digits is not None:
        zs = F.round(zs, round_digits)
    return (
        joined.where(
            F.abs(F.col(value_col).cast("double") - F.col("_mms_mean"))
            > F.lit(z) * F.col("_mms_sd")
        )
        .select(group_col, id_col, value_col, zs.alias("zscore"))
    )


def key_skew_profile(
    df: "DataFrame", key: str, *, top_n: int = 10
) -> "DataFrame":
    """Pre-shuffle skew diagnostics for a prospective join/groupBy key:
    the ``top_n`` heaviest key values with their row counts, each
    key's share of all rows, and its ratio to the mean per-key count —
    the numbers that decide whether a key needs salting or an AQE
    skew-join before a 100 TB shuffle is launched.

    One partial-aggregated count shuffle (key-cardinality-sized); the
    global totals ride along as window-free scalar aggregates computed
    from the SAME aggregate (a 2-row cross of broadcast scalars), and
    the top-n sort runs over the aggregate, never the corpus. NULL
    keys count as a key of their own — a NULL-heavy join key is the
    most common real-world skew."""
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("key_count")
    )
    totals = counts.agg(
        F.sum("key_count").alias("_total_rows"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    top = counts.orderBy(F.desc("key_count"), F.asc_nulls_last("key_value")).limit(
        top_n
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.col("key_value").cast("string").alias("key_value"),
            "key_count",
            F.round(F.col("key_count") / F.col("_total_rows"), 9).alias(
                "row_share"
            ),
            F.round(
                F.col("key_count") * F.col("_n_keys") / F.col("_total_rows"), 6
            ).alias("x_mean"),
        )
        .orderBy(F.desc("key_count"), F.asc_nulls_last("key_value"))
    )


def profile_drift(
    before: "DataFrame", after: "DataFrame", cols: list[str]
) -> "DataFrame":
    """Completeness / range drift between two snapshots of the same
    table: per column, null rates on both sides with their delta, and
    both sides' min/max. The early-warning check run on every new
    snapshot BEFORE content-level drift (PSI/KS) is worth computing —
    a collector regression shows up as a null-rate jump or a range
    collapse first.

    Each side is ONE pass (column_profile's tall one-pass aggregate);
    the join is on the column NAME — profile-sized, broadcast, never a
    row-level shuffle."""
    pb = column_profile(before, cols).select(
        "column",
        F.col("row_count").alias("_rb"),
        F.col("null_count").alias("_nb"),
        F.col("min_value").alias("min_before"),
        F.col("max_value").alias("max_before"),
    )
    pa = column_profile(after, cols).select(
        "column",
        F.col("row_count").alias("_ra"),
        F.col("null_count").alias("_na"),
        F.col("min_value").alias("min_after"),
        F.col("max_value").alias("max_after"),
    )
    nr_b = F.round(F.col("_nb") / F.col("_rb"), 9)
    nr_a = F.round(F.col("_na") / F.col("_ra"), 9)
    return (
        pb.join(F.broadcast(pa), "column")
        .select(
            "column",
            nr_b.alias("null_rate_before"),
            nr_a.alias("null_rate_after"),
            F.round(nr_a - nr_b, 9).alias("null_rate_delta"),
            "min_before",
            "min_after",
            "max_before",
            "max_after",
        )
    )


def percentile_bounds(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    p_low: float = 0.05,
    p_high: float = 0.95,
) -> DataFrame:
    """(group, p_low_value, p_high_value, n): EXACT per-group
    inverse-CDF percentiles (smallest value whose cumulative
    distribution reaches p) — the robust data-derived Range bounds for
    winsorization / outlier gating where z-scores break (skewed or
    heavy-tailed columns).

    Engine-portable by construction: cume_dist has one definition
    ((# rows <= current) / n), so both Spark and any SQL oracle select
    the identical row — no interpolation-flavor mismatch (the
    approx_percentile/quantile families disagree across engines).

    100 TB shape: ONE hash exchange (the per-group sort window); the
    rollup reuses HashPartitioning(group) so no second exchange. Exact
    percentiles need the per-group sort; for group cardinalities where
    that's too hot, pre-aggregate to (group, value, count) first —
    cume_dist over value-weighted counts is the same statistic."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    cd = F.cume_dist().over(w)
    return (
        df.select(group_col, value_col)
        .withColumn("_cd", cd)
        .groupBy(group_col)
        .agg(
            F.min(
                F.when(F.col("_cd") >= F.lit(p_low), F.col(value_col))
            ).alias("p_low_value"),
            F.min(
                F.when(F.col("_cd") >= F.lit(p_high), F.col(value_col))
            ).alias("p_high_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )
