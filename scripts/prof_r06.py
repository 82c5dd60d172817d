#!/usr/bin/env python
"""Round-6 profiling helpers: per-stage timing of the heavy bench
queries, noop-sink isolation (guide §1.4), explain capture.

Usage: run under `python -i` (or exec in an interactive session) and
call the prof_* functions; or `python scripts/prof_r06.py explain` to
dump before-plans for the round-6 deliverable.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session():
    from marshmallow_spark.session import get_spark

    return get_spark(
        "prof_r06", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s", flush=True)
    return out


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def dump_explains(names, outdir, suffix):
    from marshmallow_spark.queries import QUERIES

    spark = get_session()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print("wrote", path, flush=True)


if __name__ == "__main__":
    if sys.argv[1:] and sys.argv[1] == "explain":
        dump_explains(sys.argv[3:], "plans/r06", sys.argv[2])
