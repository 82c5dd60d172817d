"""Record-linkage / entity-resolution operators.

Blocked fuzzy matching over a deduplicated value dictionary: the
classic entity-resolution shape (Fellegi-Sunter blocking + edit
distance verify) expressed as DataFrame plans — the corpus collapses
to its value dictionary first, candidates come from an equi-join on a
cheap blocking key, and the expensive string metric runs only inside
blocks. Never all-pairs across the corpus.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _first_token(c: Column) -> Column:
    return F.split(c, " ").getItem(0)


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    *,
    max_dist: int = 4,
    block: Callable[[Column], Column] = _first_token,
) -> DataFrame:
    """(name_a, name_b, dist, n_a, n_b): pairs of DISTINCT values of
    ``name_col`` whose Levenshtein distance is <= ``max_dist``,
    restricted to pairs sharing a blocking key (default: the first
    whitespace token), with per-name record support counts. Pair
    orientation is name_a < name_b (each unordered pair once).

    100 TB shape: the corpus partial-aggregates ONCE to the
    (name, count) dictionary — dictionary-sized, not corpus-sized —
    so duplicate records never multiply the pair space (the all-pairs-
    within-duplicates blowup of naive fuzzy self-joins). The blocked
    self-join then runs on the dictionary: one exchange on the block
    key feeds both aliased sides (ReusedExchange), and Levenshtein —
    O(len^2) per comparison — evaluates only inside blocks. A skewed
    block (empty/boilerplate names) is exactly the q57 key-skew-profile
    use case: profile, then cap or salt upstream."""
    names = (
        df.groupBy(F.col(name_col).alias("_name"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_blk", block(F.col("_name")))
        .repartition("_blk")
    )
    left = names.alias("_fm_l")
    right = names.alias("_fm_r")
    lc = lambda name: F.col(f"_fm_l.{name}")  # noqa: E731
    rc = lambda name: F.col(f"_fm_r.{name}")  # noqa: E731
    return (
        left.join(right, lc("_blk") == rc("_blk"))
        .where(lc("_name") < rc("_name"))
        .where(F.levenshtein(lc("_name"), rc("_name")) <= max_dist)
        .select(
            lc("_name").alias("name_a"),
            rc("_name").alias("name_b"),
            F.levenshtein(lc("_name"), rc("_name")).alias("dist"),
            lc("_n").alias("n_a"),
            rc("_n").alias("n_b"),
        )
    )
