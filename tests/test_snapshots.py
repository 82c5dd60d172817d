"""Snapshot-manifest tables: time travel, isolation, commit protocol,
incremental validation (sources/snapshots.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from marshmallow_spark.plans.pipeline import ClipValidationSuite
from marshmallow_spark.sources.snapshots import (
    CommitConflict,
    SnapshotNotFound,
    SnapshotTable,
    SnapshotValidationLog,
    is_snapshot_table,
)
from marshmallow_spark.sources.synth import codecs_dim, synth_clips
from marshmallow_spark.sources.tables import (
    current_snapshot_id,
    load_table,
    write_table,
)


def _clip_slice(spark, lo, hi, **kw):
    """Deterministic clip slice [lo, hi) — disjoint-by-clip_id appends."""
    return synth_clips(spark, hi, **kw).where(F.col("clip_id") >= f"clip-{lo:012d}")


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "clips_table")
    SnapshotTable.create(path, synth_clips(spark, 200, with_violations=False))
    return SnapshotTable(path)


def test_create_read_roundtrip(spark, table):
    assert is_snapshot_table(table._p.root)
    assert table.current_snapshot_id() == 1
    df = table.read(spark)
    assert df.count() == 200
    # schema survives the manifest round-trip (binary + ints + strings)
    assert dict(df.dtypes)["bytes"] == "binary"


def test_snapshot_isolation_pinned_reader_unaffected_by_append(spark, table):
    s1 = table.current_snapshot_id()
    pinned = table.read(spark, s1)
    table.append(synth_clips(spark, 80, with_violations=False))
    assert table.current_snapshot_id() == s1 + 1
    # the pinned frame still scans only snapshot-1 files
    assert pinned.count() == 200
    assert table.read(spark, s1).count() == 200
    assert table.read(spark).count() == 280


def test_time_travel_and_history_lineage(spark, table):
    table.append(synth_clips(spark, 10, with_violations=False))
    table.append(synth_clips(spark, 20, with_violations=False))
    hist = table.history()
    assert [s["snapshot_id"] for s in hist] == [1, 2, 3]
    assert [s["parent_id"] for s in hist] == [None, 1, 2]
    assert [s["operation"] for s in hist] == ["create", "append", "append"]
    assert table.read(spark, 2).count() == 210
    # summary metrics recorded per commit
    assert hist[2]["summary"]["added_rows"] == 20
    assert hist[2]["summary"]["total_files"] > hist[2]["summary"]["added_files"]


def test_added_between_is_exactly_the_appended_rows(spark, table):
    base = table.read(spark, 1)
    table.append(
        synth_clips(spark, 500, with_violations=False).where(
            F.crc32(F.col("clip_id")) % 3 == 0
        )
    )
    inc = table.added_between(spark, 1)
    full = table.read(spark)
    # increment == full exceptAll base (content equality, both directions)
    assert inc.exceptAll(full.exceptAll(base)).count() == 0
    assert full.exceptAll(base).exceptAll(inc).count() == 0


def test_added_between_rejects_non_ancestor_and_overwrite(spark, table):
    table.append(synth_clips(spark, 5, with_violations=False))
    with pytest.raises(SnapshotNotFound):
        table.added_between(spark, 99)
    table.overwrite(synth_clips(spark, 50, with_violations=False))
    with pytest.raises(CommitConflict):
        table.added_between(spark, 1)
    # but a full read of the post-overwrite table is the new content only
    assert table.read(spark).count() == 50


def test_overwrite_keeps_time_travel(spark, table):
    table.overwrite(synth_clips(spark, 30, with_violations=False))
    assert table.read(spark).count() == 30
    assert table.read(spark, 1).count() == 200  # old files still readable


def test_rollback_moves_pointer_without_deleting(spark, table):
    table.append(synth_clips(spark, 40, with_violations=False))
    table.rollback(1)
    assert table.current_snapshot_id() == 1
    assert table.read(spark).count() == 200
    # the later snapshot remains reachable by explicit id
    assert table.read(spark, 2).count() == 240


def test_concurrent_commit_loses_cleanly(spark, table):
    """A writer whose view of the table went stale mid-commit (another
    writer moved the pointer) must get CommitConflict, never a silent
    history fork."""
    from marshmallow_spark.sources.snapshots import _commit

    stale_parent = table.current_snapshot_id()  # 1
    table.append(synth_clips(spark, 10, with_violations=False))  # winner -> 2

    with pytest.raises(CommitConflict):
        _commit(
            table._p,
            synth_clips(spark, 3, with_violations=False),
            parent=stale_parent,
            operation="append",
        )

    # the documented retry path: re-read and append on the winner's tip;
    # the loser's claimed-but-unpointed snapshot is an invisible orphan
    new_id = table.append(synth_clips(spark, 5, with_violations=False))
    assert table.read(spark).count() == 215
    hist_ids = [s["snapshot_id"] for s in table.history()]
    assert hist_ids == [1, 2, new_id]


def test_crash_before_pointer_swap_is_invisible(spark, table):
    """An orphaned snapshot file (commit crashed after the O_EXCL claim,
    before the pointer swap) is unreachable and does not block later
    commits."""
    p = table._p
    orphan = {
        "snapshot_id": 2,
        "parent_id": 1,
        "operation": "append",
        "committed_at": 0.0,
        "files": [],
        "added_files": [],
        "summary": {"added_files": 0, "added_rows": 0, "total_files": 0},
        "schema": table.snapshot(1)["schema"],
    }
    with open(p.snap(2), "w") as f:
        json.dump(orphan, f)
    # reads still resolve via the pointer: snapshot 1
    assert table.current_snapshot_id() == 1
    assert table.read(spark).count() == 200
    # next commit claims sequence 3, parented on 1 — history skips the orphan
    table.append(synth_clips(spark, 10, with_violations=False))
    assert [s["snapshot_id"] for s in table.history()] == [1, 3]


def test_load_table_and_write_table_integration(spark, table):
    path = table._p.root
    s1 = table.current_snapshot_id()
    write_table(synth_clips(spark, 25, with_violations=False), path, mode="append")
    assert current_snapshot_id(spark, path) == str(s1 + 1)
    assert load_table(spark, path).count() == 225
    assert load_table(spark, path, snapshot_id=str(s1)).count() == 200


def test_incremental_validation_equals_full_minus_previous(spark, tmp_path):
    """The increment's violations are exactly the violations of the
    appended rows — planted deterministically by synth_clips."""
    path = str(tmp_path / "t")
    run = str(tmp_path / "run")
    # split by hash of clip_id, NOT by index: planted duplicates SHARE a
    # clip_id, so dup pairs always land in the same increment and the
    # per-increment uniqueness check sees every planted pair
    corpus = synth_clips(spark, 500, with_violations=True)
    base = corpus.where(F.crc32(F.col("clip_id")) % 2 == 0)
    nxt = corpus.where(F.crc32(F.col("clip_id")) % 2 == 1)
    table = SnapshotTable.create(path, base)
    suite = ClipValidationSuite(codecs_dim(spark), check_audio=False)
    log = SnapshotValidationLog(table, run)

    m1 = log.validate_increment(spark, suite)
    assert m1["from_snapshot"] is None and m1["to_snapshot"] == 1
    assert m1["rows_scanned"] == base.count()

    # up to date: no work
    assert log.validate_increment(spark, suite) is None

    # append the other half; the increment scans ONLY those rows
    table.append(nxt)
    m2 = log.validate_increment(spark, suite)
    assert m2["from_snapshot"] == 1 and m2["to_snapshot"] == 2
    assert m2["rows_scanned"] == nxt.count()

    # incremental violations == suite on the appended slice alone
    expect = suite.violations(nxt).count()
    assert m2["violations"] == expect

    # accumulated violation table == suite over the full current table
    total = suite.violations(table.read(spark)).count()
    got = log.all_violations(spark)
    assert got.count() == total == m1["violations"] + m2["violations"]
    assert {int(r.snapshot) for r in got.select("snapshot").distinct().collect()} == {1, 2}
    assert [m["to_snapshot"] for m in log.manifests()] == [1, 2]


def test_incremental_validation_retry_is_idempotent(spark, tmp_path):
    """Crash after the violations write but before the manifest/pointer:
    the re-run overwrites the same snapshot partition — never
    double-counted (the landed-sink hardening contract)."""
    path = str(tmp_path / "t")
    run = str(tmp_path / "run")
    table = SnapshotTable.create(path, synth_clips(spark, 300, with_violations=True))
    suite = ClipValidationSuite(codecs_dim(spark), check_audio=False)
    log = SnapshotValidationLog(table, run)
    m1 = log.validate_increment(spark, suite)

    # simulate the crash: violations landed, pointer/manifest lost
    os.remove(os.path.join(run, "last-validated.text"))
    os.remove(os.path.join(run, "validated", "snap_00000001.json"))
    m1b = log.validate_increment(spark, suite)
    assert m1b == m1
    assert log.all_violations(spark).count() == m1["violations"]


def test_incremental_validation_overwrite_falls_back_to_full(spark, tmp_path):
    path = str(tmp_path / "t")
    run = str(tmp_path / "run")
    table = SnapshotTable.create(path, synth_clips(spark, 100, with_violations=True))
    suite = ClipValidationSuite(codecs_dim(spark), check_audio=False)
    log = SnapshotValidationLog(table, run)
    log.validate_increment(spark, suite)

    replacement = synth_clips(spark, 150, with_violations=True)
    table.overwrite(replacement)
    m = log.validate_increment(spark, suite)
    # the delta was undefined -> full re-validation of the new content
    assert m["from_snapshot"] is None and m["rows_scanned"] == 150
    assert m["violations"] == suite.violations(replacement).count()


def test_checkpointed_run_pins_snapshot_across_appends(spark, tmp_path):
    """The resume story end-to-end: a killed CheckpointedRun resumes
    against the SAME snapshot even after the table moved on."""
    from marshmallow_spark.plans.checkpoint import CheckpointedRun

    path = str(tmp_path / "t")
    table = SnapshotTable.create(path, synth_clips(spark, 400, with_violations=True))
    sid = current_snapshot_id(spark, path)
    suite = ClipValidationSuite(codecs_dim(spark), check_audio=False)
    run = CheckpointedRun(
        suite, str(tmp_path / "run"), num_buckets=8, snapshot_id=sid
    )
    pinned = load_table(spark, path, snapshot_id=sid)
    first = run.run(pinned, buckets_per_batch=2, max_batches=1)
    assert len(first) == 2

    # upstream appends between the kill and the resume
    table.append(_clip_slice(spark, 400, 700, with_violations=True))

    # resume re-loads BY THE RECORDED SNAPSHOT ID — identical input
    resumed_input = load_table(spark, path, snapshot_id=run.snapshot_id)
    rest = run.run(resumed_input, buckets_per_batch=8)
    manifests = run.manifests()
    assert len(manifests) == 8
    assert sum(m["rows"] for m in manifests) == 400  # not 1100
    assert all(m["snapshot_id"] == sid for m in manifests)


def test_snapshot_ingest_sink_stream_to_snapshots(spark, tmp_path):
    """Streaming ingest commits one snapshot per micro-batch; a
    SnapshotValidationLog trails the stream scanning only the committed
    increments — and its accumulated violations equal the batch suite
    over the landed table."""
    import tempfile

    from marshmallow_spark.sources.synth import CLIP_SCHEMA
    from marshmallow_spark.streaming import snapshot_ingest_sink

    inp = str(tmp_path / "in")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    corpus = synth_clips(spark, 900, with_violations=True)
    corpus.repartition(3).write.mode("overwrite").parquet(inp)

    tdir = str(tmp_path / "tbl")
    table = SnapshotTable.create(
        tdir, spark.createDataFrame([], spark.read.parquet(inp).schema)
    )
    sdf = (
        spark.readStream.schema(CLIP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = snapshot_ingest_sink(
        sdf, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    hist = table.history()
    stream_snaps = [s for s in hist if "stream_batch_id" in s["summary"]]
    assert len(stream_snaps) == 3
    assert sum(s["summary"]["added_rows"] for s in stream_snaps) == 900
    assert table.read(spark).count() == 900

    # trailing incremental validation over what the stream landed
    suite = ClipValidationSuite(codecs_dim(spark), check_audio=False)
    log = SnapshotValidationLog(table, str(tmp_path / "run"))
    m = log.validate_increment(spark, suite)
    assert m["rows_scanned"] == 900
    assert m["violations"] == suite.violations(spark.read.parquet(inp)).count()


def test_snapshot_ingest_replay_is_exactly_once(spark, tmp_path):
    """Replaying a committed micro-batch id (crash after pointer swap,
    before the stream checkpoint advanced) must not commit twice."""
    from marshmallow_spark.streaming import snapshot_append_batch_processor

    tdir = str(tmp_path / "tbl")
    batch = synth_clips(spark, 120, with_violations=False)
    table = SnapshotTable.create(tdir, spark.createDataFrame([], batch.schema))
    proc = snapshot_append_batch_processor(table)

    proc(batch, 0)
    assert table.read(spark).count() == 120
    proc(batch, 0)  # replay: exactly-once no-op
    assert table.read(spark).count() == 120
    assert len(table.history()) == 2  # create + ONE stream commit

    proc(batch, 1)  # a genuinely new batch still commits
    assert table.read(spark).count() == 240


def test_expire_snapshots_reclaims_only_unreferenced_files(spark, table):
    """Expiry deletes superseded manifests + files referenced only by
    them; retained snapshots (and time travel among them) survive."""
    table.append(synth_clips(spark, 50, with_violations=False))   # 2
    table.overwrite(synth_clips(spark, 60, with_violations=False))  # 3
    table.append(synth_clips(spark, 10, with_violations=False))   # 4

    report = table.expire_snapshots(keep_last=2)
    assert report["removed_snapshots"] == [1, 2]
    assert report["removed_files"] > 0

    # retained window fully functional
    assert table.read(spark).count() == 70
    assert table.read(spark, 3).count() == 60
    assert [s["snapshot_id"] for s in table.history()] == [3, 4]
    # expired ids are gone for good
    with pytest.raises(SnapshotNotFound):
        table.read(spark, 1)
    # every file the retained snapshots reference still exists
    for s in (table.snapshot(3), table.snapshot(4)):
        for f in s["files"]:
            assert os.path.exists(os.path.join(table._p.root, f))


def test_expire_snapshots_removes_commit_race_orphans(spark, table):
    """Orphaned manifests (lost commit races / crashes) are reclaimed
    too — they are never reachable, so keep_last cannot protect them."""
    from marshmallow_spark.sources.snapshots import CommitConflict, _commit

    table.append(synth_clips(spark, 10, with_violations=False))  # 2
    with pytest.raises(CommitConflict):
        _commit(table._p, synth_clips(spark, 5, with_violations=False),
                parent=1, operation="append")  # orphan snap-3
    report = table.expire_snapshots(keep_last=2)
    assert 3 in report["removed_snapshots"]
    assert table.read(spark).count() == 210


def test_manifest_pruned_scan(spark, tmp_path):
    """Per-file key stats let a key_range scan plan only overlapping
    files — and the result is exact either way."""
    path = str(tmp_path / "t")
    # three disjoint clip_id ranges, one commit each -> prunable layout
    t = SnapshotTable.create(
        path, synth_clips(spark, 300, with_violations=False).coalesce(2),
        stats_col="clip_id",
    )
    t.append(_clip_slice(spark, 300, 600, with_violations=False).coalesce(2))
    t.append(_clip_slice(spark, 600, 900, with_violations=False).coalesce(2))

    snap = t.snapshot(t.current_snapshot_id())
    assert snap["stats_col"] == "clip_id"
    assert set(snap["file_stats"]) == set(snap["files"])

    rng = ("clip-000000000350", "clip-000000000550")
    pruned = t.pruned_files(snap, rng)
    assert len(pruned) < len(snap["files"])  # files actually skipped
    # only middle-commit files survive the prune
    mid = set(t.snapshot(2)["added_files"])
    assert set(pruned) <= mid

    got = t.scan(spark, key_range=rng)
    want = t.read(spark).where(F.col("clip_id").between(*rng))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_scan_without_stats_requires_opt_in(spark, table):
    with pytest.raises(ValueError):
        table.scan(spark, key_range=("a", "b"))
    # but a plain scan (no key_range) is just read()
    assert table.scan(spark).count() == 200


def test_increment_scan_reads_only_appended_files(spark, table):
    """Executed-plan-level evidence for the O(append) claim: the
    increment frame's input files are EXACTLY the files the appends
    committed — the accumulated table is not in the scan."""
    table.append(synth_clips(spark, 30, with_violations=False))
    table.append(synth_clips(spark, 40, with_violations=False))
    inc = table.added_between(spark, 1)
    got = {os.path.relpath(f.replace("file:", ""), table._p.root)
           for f in inc.inputFiles()}
    want = set(table.snapshot(2)["added_files"]) | set(table.snapshot(3)["added_files"])
    assert got == want
    base_files = set(table.snapshot(1)["files"])
    assert not (got & base_files)


def test_compaction_rewrites_files_preserves_content_and_increments(spark, tmp_path):
    """Compaction shrinks the file count without changing content, and
    incremental reads crossing a compaction still return exactly the
    genuinely-appended rows."""
    path = str(tmp_path / "t")
    t = SnapshotTable.create(
        path, synth_clips(spark, 200, with_violations=False).repartition(6)
    )
    t.append(_clip_slice(spark, 200, 300, with_violations=False).repartition(5))  # 2
    before = t.snapshot(t.current_snapshot_id())
    assert len(before["files"]) >= 11

    cid = t.compact(spark, target_files=2)  # 3
    snap = t.snapshot(cid)
    assert snap["operation"] == "compact"
    assert len(snap["files"]) <= 2
    assert snap["summary"]["added_rows"] == 0
    assert snap["summary"]["compacted_rows"] == 300

    # content identical across the rewrite
    a = t.read(spark, 2)
    b = t.read(spark, cid)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # increment crossing the compaction: appended rows only, no replay
    t.append(_clip_slice(spark, 300, 350, with_violations=False))  # 4
    inc = t.added_between(spark, 1)  # spans append(2) + compact(3) + append(4)
    assert inc.count() == 150
    assert inc.where(F.col("clip_id") < "clip-000000000200").count() == 0

    # a trailing validation log sees zero new work from the compact
    suite = ClipValidationSuite(codecs_dim(spark), check_audio=False)
    log = SnapshotValidationLog(t, str(tmp_path / "run"))
    log.validate_increment(spark, suite)
    t.compact(spark, target_files=1)  # 5
    m = log.validate_increment(spark, suite)
    assert m["rows_scanned"] == 0

    # expire reclaims the superseded small files, content intact
    report = t.expire_snapshots(keep_last=1)
    assert report["removed_files"] > 0
    assert t.read(spark).count() == 350


def test_schema_evolution_old_files_read_as_nulls(spark, table):
    """Appending a superset schema evolves the table: the current
    snapshot reads old files with the new column as NULL; time travel
    keeps each snapshot's own schema."""
    evolved = synth_clips(spark, 50, with_violations=False).withColumn(
        "speaker_id", F.concat(F.lit("spk-"), F.crc32("clip_id") % 10)
    )
    table.append(evolved)
    cur = table.read(spark)
    assert "speaker_id" in cur.columns
    assert cur.where(F.col("speaker_id").isNull()).count() == 200  # old rows
    assert cur.where(F.col("speaker_id").isNotNull()).count() == 50
    # pinned old snapshot: old schema, no phantom column
    assert "speaker_id" not in table.read(spark, 1).columns


def test_validation_log_works_with_plain_schema_suites(spark, tmp_path):
    """The log's suite contract is just violations(df) — a plain Schema
    over a non-clips table composes the same way (generic digest)."""
    from marshmallow_spark import Schema, fields, validate

    class DocSchema(Schema):
        doc_id = fields.Integer(required=True)
        score = fields.Float(allow_none=True, validate=validate.Range(min=0.0, max=1.0))

    class SchemaSuite:
        def violations(self, df):
            return DocSchema().validate_df(df).violations

    df1 = spark.createDataFrame(
        [(1, 0.5), (2, 1.5), (3, None)], "doc_id int, score double"
    )
    df2 = spark.createDataFrame([(4, -0.2), (5, 0.9)], "doc_id int, score double")
    table = SnapshotTable.create(str(tmp_path / "t"), df1)
    log = SnapshotValidationLog(table, str(tmp_path / "run"))

    m1 = log.validate_increment(spark, SchemaSuite())
    assert m1["violations"] == 1  # score 1.5 out of range
    table.append(df2)
    m2 = log.validate_increment(spark, SchemaSuite())
    assert m2["rows_scanned"] == 2 and m2["violations"] == 1  # -0.2
    assert m2["digest"] != 0


def test_delete_by_key_rewrites_only_files_that_may_match(spark, tmp_path):
    """Copy-on-write delete with file-level pruning: files whose key
    range cannot contain a deleted key are carried over VERBATIM."""
    path = str(tmp_path / "t")
    t = SnapshotTable.create(
        path, synth_clips(spark, 200, with_violations=False).coalesce(1),
        stats_col="clip_id",
    )
    t.append(_clip_slice(spark, 200, 400, with_violations=False).coalesce(1))
    t.append(_clip_slice(spark, 400, 600, with_violations=False).coalesce(1))
    before = t.snapshot(t.current_snapshot_id())

    # both keys live in the middle commit
    keys = ["clip-000000000250", "clip-000000000399"]
    did = t.delete_by_key(spark, keys)
    snap = t.snapshot(did)

    assert snap["operation"] == "delete"
    assert snap["summary"]["added_rows"] == 0
    assert snap["summary"]["carried_files"] == 2  # commits 1+3 untouched
    assert snap["summary"]["rewritten_files"] == 1  # only the middle commit
    # untouched files are the SAME path entries (no rewrite happened)
    mid = set(t.snapshot(2)["added_files"])
    carried = set(snap["files"]) & set(before["files"])
    assert carried == set(before["files"]) - mid

    cur = t.read(spark)
    assert cur.count() == 598
    assert cur.where(F.col("clip_id").isin(keys)).count() == 0
    # time travel still sees the rows pre-delete
    assert t.read(spark, 3).where(F.col("clip_id").isin(keys)).count() == 2

    # carried stats still prune scans after the delete
    pruned = t.pruned_files(snap, ("clip-000000000000", "clip-000000000100"))
    assert len(pruned) < len(snap["files"])

    # incremental readers see nothing from the delete
    assert t.added_between(spark, 3, did).count() == 0


def test_delete_by_key_requires_stats(spark, table):
    with pytest.raises(ValueError):
        table.delete_by_key(spark, ["clip-000000000001"])


def test_remove_orphan_files_reclaims_crashed_commit_residue(spark, table):
    """A commit that crashed before claiming its manifest leaves a
    dangling data dir no manifest references; remove_orphan_files
    reclaims it and touches nothing referenced."""
    import shutil

    # simulate: a data commit dir written, no manifest for it
    data_root = os.path.join(table._p.root, "data")
    live_dir = os.listdir(data_root)[0]
    shutil.copytree(
        os.path.join(data_root, live_dir),
        os.path.join(data_root, "commit-deadbeef0000"),
    )
    report = table.remove_orphan_files()
    assert report["removed_files"] > 0
    assert not os.path.exists(os.path.join(data_root, "commit-deadbeef0000"))
    # the live table is untouched
    assert table.read(spark).count() == 200
    # idempotent: nothing left to reclaim
    assert table.remove_orphan_files() == {"removed_files": 0}


@pytest.mark.slow
def test_snapshot_ops_model_based_randomized(spark, tmp_path):
    """Seeded random op sequences vs a pure-Python model: after every
    op, current content and a sampled time-travel read must match the
    model exactly. Covers interactions no single-op test does
    (delete-after-compact, rollback-then-append forks, expire windows)."""
    import random

    rng = random.Random(20260819)
    counter = [0]

    def fresh_vals(n):
        counter[0] += n
        return list(range(counter[0] - n, counter[0]))

    def df_of(vals):
        return spark.createDataFrame([(v,) for v in vals], "k int")

    base = fresh_vals(20)
    table = SnapshotTable.create(str(tmp_path / "t"), df_of(base), stats_col="k")
    content = {1: sorted(base)}  # snapshot id -> expected rows

    def current_content():
        return content[table.current_snapshot_id()]

    for step in range(36):
        op = rng.choice(
            ["append", "append", "append", "overwrite", "compact",
             "delete", "rollback", "expire"]
        )
        if op == "append":
            vals = fresh_vals(rng.randint(1, 15))
            prev = current_content()
            sid = table.append(df_of(vals))
            content[sid] = sorted(prev + vals)
        elif op == "overwrite":
            vals = fresh_vals(rng.randint(1, 10))
            sid = table.overwrite(df_of(vals))
            content[sid] = sorted(vals)
        elif op == "compact":
            prev = current_content()
            sid = table.compact(spark, target_files=rng.randint(1, 2))
            content[sid] = prev
        elif op == "delete":
            cur = current_content()
            if not cur:
                continue
            keys = rng.sample(cur, min(len(cur), rng.randint(1, 5)))
            sid = table.delete_by_key(spark, keys)
            content[sid] = sorted(set(cur) - set(keys))
        elif op == "rollback":
            reachable = [s["snapshot_id"] for s in table.history()]
            table.rollback(rng.choice(reachable))
        elif op == "expire":
            keep = rng.randint(1, 3)
            retained = {s["snapshot_id"] for s in table.history()[-keep:]}
            table.expire_snapshots(keep_last=keep)
            content = {sid: v for sid, v in content.items() if sid in retained}

        got = sorted(r.k for r in table.read(spark).collect())
        assert got == current_content(), f"step {step} op {op}"
        # sampled time travel against the model
        probe = rng.choice([s["snapshot_id"] for s in table.history()])
        got_tt = sorted(r.k for r in table.read(spark, probe).collect())
        assert got_tt == content[probe], f"step {step} time-travel {probe}"
