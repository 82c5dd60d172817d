"""Gap-based sessionization for event streams.

A training-data / analytics pipeline over user events needs rows
grouped into sessions: consecutive events of the same entity with no
gap larger than a threshold. The classic distributed formulation is

  1. one hash-shuffle on the entity key, sort within partition by
     (ts, tiebreak);
  2. ``lag(ts)`` marks session starts (gap > threshold or first row);
  3. a running sum of the start flags numbers the sessions.

Everything after the single window shuffle is narrow, and a subsequent
per-(entity, session) aggregation reuses the SAME hash partitioning —
HashPartitioning(entity) satisfies ClusteredDistribution(entity,
session), so Catalyst inserts NO second exchange (plan-audited in
tests/test_plan_audit.py). At 10^12 rows the job is one shuffle of the
projected columns; per-entity data never needs to fit in memory beyond
the sort spill.

Never a per-row Python loop and never a ``collect()``: sessions are
computed entirely with JVM window expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    *,
    gap: str = "30 minutes",
    tiebreak_cols: tuple[str, ...] = (),
    session_col: str = "session_index",
) -> DataFrame:
    """Append a per-entity session index (1-based, in time order).

    ``gap`` is a SQL interval literal (e.g. ``'30 minutes'``); a new
    session starts when the previous event of the same entity is MORE
    than ``gap`` older, or when there is no previous event. The
    boundary is INCLUSIVE (an event exactly ``gap`` after the previous
    one stays in the session): Structured Streaming's
    ``session_window`` merges per-event windows that touch at the
    endpoint (verified empirically, pinned by the stream==batch test),
    so the streaming mirror (streaming.session_stats_stream) agrees
    with this batch operator bit-for-bit. ``tiebreak_cols`` make
    ordering total when timestamps can collide (assignment stays
    deterministic across runs and parallelism).
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(running).cast("long"))


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    *,
    gap: str = "30 minutes",
    tiebreak_cols: tuple[str, ...] = (),
    agg_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """One row per (entity, session): start/end timestamps, event
    count, session duration in seconds, plus caller-supplied extra
    aggregates. Runs in ONE shuffle total — the groupBy reuses the
    window's hash partitioning on the entity key."""
    sess = sessionize(
        df, entity_col, ts_col, gap=gap, tiebreak_cols=tiebreak_cols
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if agg_exprs:
        aggs.extend(expr.alias(name) for name, expr in agg_exprs.items())
    out = sess.groupBy(entity_col, "session_index").agg(*aggs)
    # exact integer microseconds (not a float subtraction): portable
    # bit-for-bit across engines, and works on TIMESTAMP and
    # TIMESTAMP_NTZ alike (unix_micros rejects NTZ)
    dur = F.timestamp_diff("MICROSECOND", F.col("session_start"), F.col("session_end"))
    return out.withColumn("duration_us", dur.cast("long"))


def rolling_event_features(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    window_seconds: int,
    id_col: str | None = None,
) -> DataFrame:
    """Per-event trailing-window features: for every event, the count
    and sum of the entity's events in the inclusive time range
    [ts - window_seconds, ts] — the classic point-in-time-correct
    feature-engineering primitive (no leakage: a row's feature never
    sees events after it).

    The frame is a RANGE window over microseconds-since-epoch —
    microsecond precision end to end (casting to whole seconds would
    silently move boundary events in or out of the frame vs a
    full-precision engine). TIMESTAMP_NTZ columns (what parquet
    timestamps load as) take the naive-epoch diff — linear in the
    stored value, immune to session-timezone DST folds that a cast to
    zoned TIMESTAMP would introduce.

    100 TB shape: ONE hash exchange on the entity key; the range frame
    is computed in a single sort within partitions (Spark's sliding
    frame advances two pointers, never re-scans), and any downstream
    per-entity rollup reuses the same partitioning. Sum is rounded to
    6dp (frame membership is exact; only summation order differs
    across engines)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        us = F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
        )
    else:
        us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(entity_col)
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    keep = [id_col] if id_col else []
    return df.select(
        *keep,
        entity_col,
        ts_col,
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.round(F.sum(value_col).over(w), 6).alias("sum_window"),
    )


def funnel_steps(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """(entity, steps_completed): the TRUE sequential funnel
    — step i counts only if it happens at-or-after the first
    qualifying occurrence of step i-1 (min-ts-per-step composition
    overcounts: a purchase BEFORE signup is not a conversion).

    Formulation: one running-min window per step over the same
    (entity, ts) spec — step 0's running first-occurrence feeds step
    1's qualifying condition row-locally, and so on; the per-entity
    rollup takes the overall min of each step's qualifying time.
    Equal-timestamp peers are in-frame on both engines (the default
    RANGE frame includes peers), so A and B at the same instant chain.

    100 TB shape: ONE hash exchange on the entity key; the chained
    windows and the final rollup all reuse HashPartitioning(entity)
    and the single per-partition sort."""
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col))
    frame = df.select(entity_col, ts_col, type_col)
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if i > 0:
            prev = F.col(f"_r{i - 1}")
            cond = cond & prev.isNotNull() & (F.col(ts_col) >= prev)
        frame = frame.withColumn(
            f"_r{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
    agg = frame.groupBy(entity_col).agg(
        *[F.min(f"_r{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    completed = F.lit(0)
    for i in range(len(steps)):
        completed = F.when(
            F.col(f"_t{i}").isNotNull(), F.lit(i + 1)
        ).otherwise(completed)
    return agg.select(
        entity_col, completed.cast("int").alias("steps_completed")
    )
