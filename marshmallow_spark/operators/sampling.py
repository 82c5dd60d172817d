"""Deterministic sampling / dataset splitting for training pipelines.

A training-data pipeline needs reproducible row -> {train, val, test}
assignment and reproducible subsampling that is stable across runs,
cluster sizes, and partition layouts. Both are pure projections on a
content hash of the KEY (never rand(): nondeterministic under retries,
and resampled on every recomputation of a lost partition):

  bucket = int(substr(md5(key), 1, 8), 16) % 10_000

md5 (not xxhash64) so the assignment is portable across engines — the
DuckDB oracle reproduces it bit-for-bit (q37). One projection, zero
shuffles, pushdown-friendly; at 10^12 rows the split IS the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: resolution of the split space: fractions quantize to 0.01%
BUCKETS = 10_000


def hash_bucket(key: Column | str) -> Column:
    """Stable per-key bucket in [0, BUCKETS): first 8 md5 hex digits of
    the key, mod BUCKETS. conv() is the JVM-side hex->long."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(c.cast("string")), 1, 8)
    return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(BUCKETS)).cast("int")


def assign_split(
    df: DataFrame, key: str, fractions: dict[str, float], *, out_col: str = "split"
) -> DataFrame:
    """Add a deterministic split label column. ``fractions`` maps label
    -> fraction; they must sum to <= 1.0 (any remainder is labeled
    NULL, letting callers hold out unassigned data)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(key)
    expr = None
    lo = 0
    for label, frac in fractions.items():
        hi = lo + int(round(frac * BUCKETS))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo = hi
    return df.withColumn(out_col, expr)


def stratified_topk(
    df: DataFrame, group_col: str, key: str, k: int, *, rank_col: str | None = None
) -> DataFrame:
    """Deterministic stratified sample: exactly min(k, |stratum|) rows
    per ``group_col`` value, chosen by md5-hash rank of the key (the
    same rows survive on every run, at any parallelism, and in any
    other engine — the portable equivalent of per-stratum reservoir
    sampling for balancing domain mixes).

    One hash-shuffle on the stratum key + a per-stratum sort. When k is
    tiny and strata are corpus-sized, pre-filter with
    ``deterministic_sample(df, key, rate)`` at a rate that keeps >> k
    expected rows per stratum, then apply this — the window then sorts
    a sample, not the corpus (two-phase top-k). ``rank_col`` optionally
    exposes the 1-based rank."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k {k} < 1")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    rn = F.row_number().over(w)
    if rank_col is not None:
        return df.withColumn(rank_col, rn).where(F.col(rank_col) <= k)
    return df.withColumn("__rn", rn).where(F.col("__rn") <= k).drop("__rn")


def weighted_sample(
    df: DataFrame,
    key: str,
    group_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group deterministic downsampling — the domain-mix
    rebalancing step of a training pipeline ("keep 10% of crawl, 100%
    of books"): each row survives iff its key's md5 bucket falls under
    its OWN group's rate. Groups absent from ``rates`` get
    ``default_rate``.

    The rate lookup is a literal CASE chain (domain counts are small),
    so the whole operator is one pushdown-friendly filter on the scan —
    zero shuffles, stable under retries and any parallelism, and the
    kept set only shrinks monotonically as a rate is lowered (the same
    hash order backs every rate)."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate {r} for group {g!r} outside [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate {default_rate} outside [0, 1]")
    expr = None
    for g, r in rates.items():
        thr = F.lit(int(round(r * BUCKETS)))
        cond = F.col(group_col) == F.lit(g)
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        expr.otherwise(F.lit(int(round(default_rate * BUCKETS))))
        if expr is not None
        else F.lit(int(round(default_rate * BUCKETS)))
    )
    return df.where(hash_bucket(key) < thr_col)


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: str,
    *,
    budget: int,
    num_shards: int = 64,
    shard_out: str = "shard",
    bin_out: str = "bin",
) -> DataFrame:
    """Sequence packing for training: assign each document to a
    token-budget bin — (shard, bin) identifies the ~``budget``-token
    pack the doc joins. Docs are ordered deterministically (md5 of the
    key) inside hash shards; a running token cumsum assigns bins
    contiguously: bin = floor(tokens_before_this_doc / budget).

    Greedy-contiguous semantics: a bin may overshoot ``budget`` by less
    than its last doc's tokens (exact bin packing is NP-hard and
    inherently sequential; contiguous cumsum binning is the standard
    distributed approximation — downstream the tokenizer truncates or
    rolls the tail). Docs longer than ``budget`` own their bin(s).

    Scale shape: ONE hash exchange on the shard key, a per-shard sort,
    and the cumsum window — shards bound both the sort and the skew;
    assignment is stable across runs, parallelism, and engines (same
    md5 order everywhere). ``num_shards`` should scale with the corpus
    (each shard sorts corpus/num_shards rows).
    """
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget {budget} < 1")
    shard = F.pmod(hash_bucket(key), F.lit(num_shards)).cast("int")
    w = (
        Window.partitionBy(shard_out)
        .orderBy(F.md5(F.col(key).cast("string")), F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    before = cum - F.col(token_col).cast("long")
    return df.withColumn(shard_out, shard).withColumn(
        bin_out, F.floor(before / F.lit(budget)).cast("long")
    )


def deterministic_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep a stable ``rate`` fraction of rows by key hash — the same
    keys survive on every run and at any parallelism (unlike
    DataFrame.sample, which draws per-partition randomness)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return df.where(hash_bucket(key) < int(round(rate * BUCKETS)))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    fractions: dict[str, float],
    train_label: str = "train",
    holdout_label: str = "holdout",
    num_bands: int = 4,
    rows_per_band: int = 4,
    k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """(id, split, moved): deterministic hash split whose holdout is
    scrubbed of train-set near-duplicates — the eval-set hygiene step
    a hash split alone misses (a near-copy of a training doc in the
    holdout silently inflates eval scores).

    Composition of the shipped operators: :func:`assign_split` labels
    every row by md5 bucket (retry/parallelism-stable), the banded
    MinHash increment-vs-corpus join finds holdout docs with a train
    near-dup at Jaccard >= ``min_jaccard``
    (:func:`~.dedup.incremental_dedup_pairs` — candidates only, never
    all-pairs), and each leaky holdout doc MOVES to the train side
    (``moved`` marks them). Moving (not dropping) keeps the corpus
    intact and cannot create new leaks: pairs within the holdout were
    never cross-split. Recall is the banded 1-(1-J^r)^b — docs below
    the LSH floor can still leak, exactly as in any production
    MinHash-gated split; raise bands to tighten.

    100 TB shape: everything inherits the component plans (one md5
    projection for the split, per-side signature projections + one
    banded equi-join + candidate-only verify); the leaky-id list is
    near-dup-count sized and broadcasts back onto the base split."""
    from .dedup import incremental_dedup_pairs

    base = assign_split(df, id_col, fractions)
    tr = base.where(F.col("split") == train_label)
    ho = base.where(F.col("split") == holdout_label)
    pairs = incremental_dedup_pairs(
        ho,
        tr,
        id_col,
        text_col,
        num_bands=num_bands,
        rows_per_band=rows_per_band,
        k=k,
        min_jaccard=min_jaccard,
    )
    leaky = (
        pairs.select(F.col("new_id").alias(id_col))
        .distinct()
        .withColumn("_leak", F.lit(True))
    )
    is_leaky_holdout = F.coalesce(F.col("_leak"), F.lit(False)) & (
        F.col("split") == holdout_label
    )
    return base.join(F.broadcast(leaky), id_col, "left").select(
        id_col,
        F.when(is_leaky_holdout, F.lit(train_label))
        .otherwise(F.col("split"))
        .alias("split"),
        is_leaky_holdout.alias("moved"),
    )
