"""The spark-submit job entrypoint: end-to-end run, resume, packaging."""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=600):
    out = subprocess.run(
        [sys.executable, "-m", "marshmallow_spark", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_job_runs_and_resumes(tmp_path):
    run_dir = str(tmp_path / "run")
    common = [
        "--synth", "3000", "--output", run_dir,
        "--num-buckets", "8", "--buckets-per-batch", "2",
        "--master", "local[4]",
    ]
    # first invocation: only one batch (2 of 8 buckets)
    s1 = run_cli([*common, "--max-batches", "1"])
    assert s1["buckets_this_run"] == 2 and s1["buckets_completed"] == 2

    # second invocation resumes: completes the remaining 6, reprocesses none
    s2 = run_cli(common)
    assert s2["buckets_resumed_from"] == 2
    assert s2["buckets_this_run"] == 6
    assert s2["buckets_completed"] == 8
    assert s2["rows"] == 3000
    assert s2["violations"] > 0  # synth plants deterministic violations


def test_make_pyfiles(tmp_path):
    dest = str(tmp_path / "pkg.zip")
    out = run_cli(["--make-pyfiles", dest], timeout=60)
    assert out["pyfiles"] == dest
    names = zipfile.ZipFile(dest).namelist()
    assert "marshmallow_spark/__init__.py" in names
    assert "marshmallow_spark/functions/audio.py" in names
    assert not any("__pycache__" in n for n in names)


def test_read_source_formats(spark, tmp_path):
    from marshmallow_spark.sources.tables import read_source

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    for fmt, ext in [("parquet", "parquet"), ("orc", "orc"),
                     ("csv", "csv"), ("json", "json")]:
        p = str(tmp_path / f"t.{ext}")
        df.write.format(fmt).option("header", "true").save(p)
        back = read_source(spark, p, schema="id long, s string")
        assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}, fmt


def test_read_jsonl_validated(spark, tmp_path):
    from marshmallow_spark import Schema, fields
    from marshmallow_spark.sources.tables import read_jsonl_validated

    class S(Schema):
        a = fields.Integer(required=True)

    p = tmp_path / "rows.jsonl"
    p.write_text('{"a": 1}\n{"a": "zz"}\nnot json\n{}\n')
    res = read_jsonl_validated(spark, str(p), S())
    msgs = sorted(r["message"] for r in res.violations.collect())
    assert msgs == [
        "Invalid input type.",
        "Missing data for required field.",
        "Not a valid integer.",
    ]
    assert res.valid.count() == 1


def test_write_table_roundtrip(spark, tmp_path):
    """Parquet fallback of the Iceberg-or-parquet sink: partitioned
    write + read back is lossless."""
    from marshmallow_spark.sources.tables import load_table, write_table

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "a", "z")], "id long, p string, s string"
    )
    out = str(tmp_path / "wt.parquet")
    write_table(df, out, mode="overwrite", partition_by=["p"])
    back = load_table(spark, out)
    assert sorted((r.id, r.p, r.s) for r in back.collect()) == [
        (1, "a", "x"),
        (2, "b", "y"),
        (3, "a", "z"),
    ]


@pytest.mark.slow
def test_incremental_job_over_snapshot_table(spark, tmp_path):
    """The nightly-append deployment mode: --incremental validates only
    the rows appended since the last validated snapshot."""
    from marshmallow_spark.sources.snapshots import SnapshotTable
    from marshmallow_spark.sources.synth import synth_clips

    path = str(tmp_path / "tbl")
    run_dir = str(tmp_path / "run")
    table = SnapshotTable.create(path, synth_clips(spark, 2000))
    common = ["--input", path, "--output", run_dir, "--incremental",
              "--no-audio", "--master", "local[4]"]

    s1 = run_cli(common)
    assert s1["up_to_date"] is False
    assert s1["from_snapshot"] is None and s1["to_snapshot"] == 1
    assert s1["rows_scanned"] == 2000 and s1["violations"] > 0

    # nothing appended: the job is a metadata-only no-op
    s2 = run_cli(common)
    assert s2 == {"up_to_date": True, "last_validated": 1, "output": run_dir}

    appended = synth_clips(spark, 3000).where("clip_id >= 'clip-000000002000'")
    table.append(appended)
    s3 = run_cli(common)
    assert s3["from_snapshot"] == 1 and s3["to_snapshot"] == 2
    assert s3["rows_scanned"] == appended.count()  # the increment, not 3000+
