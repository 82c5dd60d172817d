#!/usr/bin/env python
"""Round-6 second-half profiling: stage isolation for the remaining
heavy entries (q31, q64, clips_feature_drift) with noop sinks."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CLIPS = os.environ.get("SPARK_GRAFT_CLIP_CACHE", "/tmp/msk_bench_clips") + "_1200000.parquet"


def main():
    from marshmallow_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("prof_r06b", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def timed(label, fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"  {label}: {best:.3f}s", flush=True)

    from marshmallow_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # ---- q31 stages -----------------------------------------------------
    print("q31 stages:", flush=True)
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=16, k=3)
    spark.sparkContext.setJobDescription("q31: signatures")
    timed("signatures(16)", lambda: noop(sigs))

    cand = dedup.lsh_banded_pairs(
        sigs, "doc_id", num_bands=4, rows_per_band=4,
        salt_threshold=64, num_salts=8)
    spark.sparkContext.setJobDescription("q31: candidates")
    timed("candidates", lambda: noop(cand))

    candp = cand.persist()
    n_cand = candp.count()
    print(f"  n_cand={n_cand}", flush=True)

    ver = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, candidates=candp, min_jaccard=0.5)
    spark.sparkContext.setJobDescription("q31: verify")
    timed("verify(cand persisted)", lambda: noop(ver))

    verp = ver.persist()
    n_ver = verp.count()
    print(f"  n_verified={n_ver}", flush=True)

    spark.sparkContext.setJobDescription("q31: star CC")
    timed("star_cc(verified persisted)",
          lambda: noop(dedup.connected_components_star(verp, "a", "b")), n=2)

    # size-ratio prune potential on the verify stage
    arr = dedup._packed_shingle_arr("text", 3)
    spread = dedup._spread(docs.select("doc_id", "text"))
    ga = spread.select(F.col("doc_id").alias("a"), F.size(arr).alias("sza"))
    gb = spread.select(F.col("doc_id").alias("b"), F.size(arr).alias("szb"))
    j = (candp.join(ga, "a").join(gb, "b")
         .select((F.least("sza", "szb") >= F.greatest("sza", "szb") * F.lit(0.5)).alias("ok")))
    row = j.agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("ok").cast("long")).alias("k")).first()
    print(f"  size-prefilter: {row['n']} pairs, {row['k']} survive "
          f"({100.0 * row['k'] / max(row['n'], 1):.1f}%)", flush=True)
    candp.unpersist(); verp.unpersist()

    # ---- feature drift halves ------------------------------------------
    print("clips_feature_drift stages:", flush=True)
    from marshmallow_spark.functions.audio_quality import (
        audio_quality_metrics, audio_feature_drift)
    from marshmallow_spark.functions.audio_transform import (
        normalize_gain, gain_normalized_quality_metrics)

    clips = spark.read.parquet(CLIPS)
    spark.sparkContext.setJobDescription("drift: ref metrics pass")
    timed("m0 audio_quality_metrics", lambda: noop(audio_quality_metrics(clips)))
    spark.sparkContext.setJobDescription("drift: fused gain metrics pass")
    timed("m1 gain_normalized_quality_metrics",
          lambda: noop(gain_normalized_quality_metrics(clips, target_dbfs=-12.0)))
    spark.sparkContext.setJobDescription("drift: full report")
    timed("full audio_feature_drift",
          lambda: audio_feature_drift(clips, normalize_gain(clips, target_dbfs=-12.0)).collect())

    spark.stop()


if __name__ == "__main__":
    main()
