"""Distributed as-of (most-recent-prior) join without a join operator.

Spark has no ASOF JOIN; the naive encodings are a range join (which
Catalyst executes as a broadcast-nested-loop or cartesian filter —
quadratic per key) or a per-key ``collect`` loop. The scale-safe
formulation is the UNION-AND-SWEEP trick used by every serious
event-time system:

  1. tag right rows 0 and left rows 1, union them on a shared layout;
  2. one hash-shuffle on the key, sort within partition by
     (ts, tag, tiebreak) — a right row at the same timestamp sorts
     BEFORE the left row, making the match inclusive (right_ts <=
     left_ts);
  3. ``last(payload, ignorenulls=True)`` over the running window
     carries the newest right payload forward;
  4. keep tag 1 rows: each left row now holds its as-of match.

One exchange, zero join nodes (plan-audited), linear in rows, and the
per-key history never needs to fit in memory. ``tolerance`` bounds
match staleness (older matches are nulled), mirroring
pandas.merge_asof semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    tolerance: str | None = None,
    tiebreak_cols: tuple[str, ...] = (),
    ts_out: str = "matched_ts",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_cols`` of
    the newest ``right`` row of the same key with right_ts <= left_ts
    (NULLs when no prior right row, or none within ``tolerance``).

    ``right_cols`` must not collide with left column names; the match
    timestamp is exposed as ``ts_out``.
    """
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")

    payload = F.struct(
        F.col(right_ts).alias(ts_out), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_TAG),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
    )
    l = left.select(  # noqa: E741
        F.col(on),
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns if c != on],
    )
    unioned = r.unionByName(l)

    # the payload struct is the final order key: right rows sharing a
    # timestamp resolve deterministically (structs compare field-wise),
    # independent of partition layout; left rows carry NULL payloads
    # and never tie with each other in a way that affects their own
    # last() result.
    order = [
        F.col("__asof_ts"),
        F.col(_TAG),
        *[F.col(c) for c in tiebreak_cols],
        F.col(_PAYLOAD),
    ]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
    if tolerance is not None:
        fresh = matched[ts_out] >= F.col("__asof_ts") - F.expr(f"INTERVAL {tolerance}")
        matched = F.when(fresh, matched)

    out_cols = [F.col(on), *[F.col(c) for c in left.columns if c != on]]
    out_cols.append(F.col(_PAYLOAD)[ts_out].alias(ts_out))
    out_cols.extend(F.col(_PAYLOAD)[c].alias(c) for c in right_cols)
    return (
        unioned.withColumn(_PAYLOAD, matched)
        .where(F.col(_TAG) == 1)
        .select(*out_cols)
    )
