#!/usr/bin/env python
"""Two-cluster-size scaling evidence for the north_rule.

The rule demands throughput scaling efficiency >= 0.8 moving from N to
4N executors. There is no real cluster in this sandbox, so per the
driver's instruction we evidence it by running the IDENTICAL full
validation workload (bench.py's flagship: structural schema pass,
uniqueness, referential anti-join, audio SNR invariant, per-partition
verdicts) at two parallelism levels — local[8] and local[32] — over the
same parquet input, and reporting clips/sec at both plus

    efficiency = (clips_per_sec_32 / clips_per_sec_8) / (32 / 8)

Each level runs in its own subprocess (one JVM per level; fresh
executors, same heap). Results are written to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = (8, 32)
# Scaling runs need a compute-dominated working set: at 120k clips the
# whole suite finishes in single-digit seconds and fixed per-job costs
# (stage scheduling, Arrow worker spin-up) swamp the measurement. 600k
# clips (~1.5 GB audio) keeps every level busy for tens of seconds.
N_CLIPS = int(os.environ.get("SPARK_GRAFT_SCALING_CLIPS", "600000"))


def pregenerate() -> None:
    """Materialize the shared clips parquet once at full parallelism so
    neither timed level pays generation cost."""
    env = dict(os.environ)
    env["SPARK_GRAFT_CLIPS"] = str(N_CLIPS)
    code = (
        "import os,sys; sys.path.insert(0, os.environ['BENCH_HERE']);"
        "import bench; from marshmallow_spark.session import get_spark;"
        "s=get_spark('pregen', master='local[32]', shuffle_partitions=32);"
        f"bench.ensure_clips_parquet(s, {N_CLIPS}); s.stop()"
    )
    env["BENCH_HERE"] = HERE
    subprocess.run([sys.executable, "-c", code], env=env, check=True, timeout=1800)


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    env["SPARK_GRAFT_CLIPS"] = str(N_CLIPS)
    env["SPARK_GRAFT_SKIP_RELATIONAL"] = "1"  # scaling measures the flagship only
    env.setdefault("SPARK_GRAFT_BENCH_REPEATS", "3")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res["total_wall_s"] = round(time.time() - t0, 1)
    return res


def main() -> None:
    pregenerate()
    results = {c: run_level(c) for c in LEVELS}
    n8, n32 = LEVELS
    q8 = results[n8]["clips"] / results[n8]["queries"]["clips_full_suite"]
    q32 = results[n32]["clips"] / results[n32]["queries"]["clips_full_suite"]
    eff = (q32 / q8) / (n32 / n8)

    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    md = os.path.join(HERE, "BENCH", "BASELINE.md")
    rows = []
    for c in LEVELS:
        r = results[c]
        rows.append(
            f"| local[{c}] | {r['clips']} | "
            f"{r['queries']['clips_full_suite']:.2f} | "
            f"{r['clips'] / r['queries']['clips_full_suite']:.1f} |"
        )
    with open(md, "w") as f:
        f.write(
            "# Scaling evidence — N -> 4N parallelism (north_rule)\n\n"
            "No real cluster is available in this sandbox; per the driver's\n"
            "instruction the two-cluster-size criterion is evidenced by running\n"
            "the identical full validation workload (structural schema pass +\n"
            "uniqueness + referential + audio SNR invariant + per-partition\n"
            "verdicts, `bench.py` flagship) at two parallelism levels on the\n"
            "same parquet input (fixed 64-file layout), one JVM per level,\n"
            "warm-up pass then min of 3 timed repeats.\n\n"
            f"Input: deterministic synthetic clips table, "
            f"{results[n8]['clips']} rows (sf={results[n8]['sf']}).\n\n"
            "| Parallelism | clips | wall (s, min of 3) | clips/sec |\n"
            "|---|---|---|---|\n" + "\n".join(rows) + "\n\n"
            f"**Scaling efficiency (8 -> 32 cores, i.e. N -> 4N):** "
            f"(q32/q8)/(32/8) = ({q32:.1f}/{q8:.1f})/4 = **{eff:.3f}**"
            f" (criterion: >= 0.8 — {'PASS' if eff >= 0.8 else 'FAIL'})\n\n"
            "Per-query wall times at each level (seconds):\n\n"
            "```json\n"
            + json.dumps({f"local[{c}]": results[c]["queries"] for c in LEVELS}, indent=2)
            + "\n```\n"
        )
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "unit": "ratio",
                "clips_per_sec": {f"local[{c}]": round(results[c]["clips"] / results[c]["queries"]["clips_full_suite"], 1) for c in LEVELS},
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
