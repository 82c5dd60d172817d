"""Snapshot-manifest tables: Iceberg-semantics time travel over parquet.

The north-star deployment reads Iceberg tables, and the engine's resume
story ("pin the snapshot id in the checkpoint manifest, re-run against
exactly that data") only means something if snapshot pinning actually
pins. The sandbox has no Iceberg runtime, so ``sources/tables.py`` kept
the ``snapshot_id`` parameter interface-only. This module makes it REAL
on plain parquet by implementing the part of the Iceberg spec the
validation engine depends on — an immutable-file + manifest + atomic
metadata-pointer table format:

- every commit writes NEW immutable parquet files under ``data/`` and a
  JSON snapshot manifest under ``metadata/`` listing the table's exact
  file set at that version (plus lineage: parent id, operation,
  added-file metrics);
- the current version is a single atomically-replaced pointer file
  (``metadata/version-hint.text`` — the same mechanism as Iceberg's
  HadoopCatalog);
- readers resolve a snapshot id to its manifest's file list and scan
  ONLY those files — a reader pinned at snapshot N is untouched by any
  later append (real snapshot isolation, not recorded-but-ignored);
- commits are optimistic: the snapshot file is claimed with
  ``O_CREAT|O_EXCL``, so two racing writers cannot both win a sequence
  number; the loser gets ``CommitConflict`` and retries against the new
  current snapshot (Iceberg's optimistic-concurrency protocol);
- a crash between snapshot-file write and pointer swap leaves an
  orphaned manifest that no ancestry references — readers never see it,
  and the next committer simply claims the following sequence number.

Scale note: manifests list files, not rows, so metadata stays
O(files-per-snapshot) — the driver-side JSON is kilobytes even when the
data is 10^12 rows, and the read path hands Spark an explicit file list
(partition pruning over snapshots happens before the scan is planned).
Incremental reads (``added_between``) are the 100 TB win: validating an
append touches only the appended files, never the accumulated table.

Reference parity: none — the reference (marshmallow) has no storage
layer; this implements the brief's Iceberg-resume requirement
(BASELINE.json north_rule: "resumable from checkpoint with
per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed since this handle read the table state.

    Retry protocol: handles read table state from disk on every call,
    so simply recompute anything derived from the old snapshot and
    re-commit — the retry lands on the winner's tip."""


class SnapshotNotFound(KeyError):
    pass


class _Paths:
    def __init__(self, root: str):
        self.root = root
        self.data = os.path.join(root, "data")
        self.metadata = os.path.join(root, "metadata")
        self.hint = os.path.join(self.metadata, "version-hint.text")

    def snap(self, snapshot_id: int) -> str:
        return os.path.join(self.metadata, f"snap-{snapshot_id:08d}.json")


def is_snapshot_table(path: str) -> bool:
    """True when ``path`` is a snapshot-manifest table root."""
    return os.path.isfile(os.path.join(path, "metadata", "version-hint.text"))


class SnapshotTable:
    """An append/overwrite parquet table with Iceberg-style snapshots.

    ``create(path, df)`` makes snapshot 1; ``append(df)`` / ``overwrite(df)``
    commit new snapshots; ``read(spark, snapshot_id=N)`` time-travels;
    ``added_between(spark, a, b)`` reads only the rows appended in
    ``(a, b]``. All ids are small ints (1-based commit sequence).
    """

    def __init__(self, path: str):
        self._p = _Paths(path)
        if not is_snapshot_table(path):
            raise FileNotFoundError(
                f"{path} is not a snapshot table (no metadata/version-hint.text); "
                "create one with SnapshotTable.create(path, df)"
            )

    # -- construction -------------------------------------------------------
    @classmethod
    def create(
        cls, path: str, df: DataFrame, *, stats_col: str | None = None
    ) -> "SnapshotTable":
        """Create the table with ``df`` as snapshot 1. ``stats_col``
        opts in per-file min/max stats on that column (footer-read at
        commit time), enabling manifest-pruned ``scan(key_range=)``
        reads; later appends inherit the setting."""
        p = _Paths(path)
        if is_snapshot_table(path):
            raise FileExistsError(f"snapshot table already exists at {path}")
        os.makedirs(p.data, exist_ok=True)
        os.makedirs(p.metadata, exist_ok=True)
        _commit(p, df, parent=None, operation="create", stats_col=stats_col)
        return cls(path)

    # -- metadata -----------------------------------------------------------
    def current_snapshot_id(self) -> int:
        with open(self._p.hint) as f:
            return int(f.read().strip())

    def snapshot(self, snapshot_id: int) -> dict:
        try:
            with open(self._p.snap(int(snapshot_id))) as f:
                return json.load(f)
        except FileNotFoundError:
            raise SnapshotNotFound(f"no snapshot {snapshot_id} in {self._p.root}")

    def history(self) -> list[dict]:
        """Lineage of the CURRENT version, oldest first (orphaned
        snapshots from lost commit races are excluded — exactly the
        set a reader can ever observe). A missing parent manifest is
        the expiry horizon: history stops there."""
        out = []
        sid: int | None = self.current_snapshot_id()
        while sid is not None:
            try:
                snap = self.snapshot(sid)
            except SnapshotNotFound:
                break  # expired ancestor — lineage horizon
            out.append(snap)
            sid = snap["parent_id"]
        return list(reversed(out))

    # -- reads --------------------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Scan exactly the pinned snapshot's file set. ``None`` means
        the current version at call time."""
        snap = self.snapshot(
            self.current_snapshot_id() if snapshot_id is None else snapshot_id
        )
        return self._read_files(spark, snap, snap["files"])

    def added_between(
        self, spark: SparkSession, from_id: int | None, to_id: int | None = None
    ) -> DataFrame:
        """Rows appended AFTER ``from_id`` up to and including ``to_id``
        (current when None) — the incremental-validation scan. Touches
        only the appended files; the accumulated table is never read.

        ``from_id=None`` means "from the beginning" (a full read of
        ``to_id``'s file set). Raises if the range crosses an
        ``overwrite``/``create`` boundary
        (the table was replaced, so "appended since" has no meaning —
        callers must re-validate from scratch) or if ``from_id`` is not
        an ancestor of ``to_id``.
        """
        to_id = self.current_snapshot_id() if to_id is None else int(to_id)
        if from_id is None:
            return self.read(spark, to_id)
        chain: list[dict] = []
        sid: int | None = to_id
        while sid is not None and sid != from_id:
            snap = self.snapshot(sid)
            chain.append(snap)
            sid = snap["parent_id"]
        if from_id is not None and sid != from_id:
            raise SnapshotNotFound(
                f"snapshot {from_id} is not an ancestor of {to_id}"
            )
        files: list[str] = []
        for snap in chain:
            if snap["operation"] in ("overwrite", "create"):
                raise CommitConflict(
                    f"snapshot {snap['snapshot_id']} is an {snap['operation']!r} — "
                    f"rows 'appended since {from_id}' is undefined across a table "
                    "replacement; re-validate from scratch"
                )
            files.extend(snap["added_files"])
        to_snap = self.snapshot(to_id)
        return self._read_files(spark, to_snap, files)

    def _read_files(self, spark: SparkSession, snap: dict, files: list[str]) -> DataFrame:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(snap["schema"]))
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(self._p.root, f) for f in files]
        )

    def scan(
        self,
        spark: SparkSession,
        *,
        snapshot_id: int | None = None,
        key_range: tuple | None = None,
    ) -> DataFrame:
        """Manifest-pruned read: when the table records per-file
        min/max stats for a key column (``stats_col=`` at create/append
        time), a ``key_range=(lo, hi)`` scan plans ONLY the files whose
        stat range overlaps — Iceberg's manifest-level file skipping.
        At millions of files this prunes before Spark ever lists or
        footers a file; parquet row-group pruning then applies within
        the survivors. Files without stats are kept (conservative).
        The residual predicate is still applied, so results are exact
        regardless of file layout."""
        snap = self.snapshot(
            self.current_snapshot_id() if snapshot_id is None else snapshot_id
        )
        if key_range is None:
            return self._read_files(spark, snap, snap["files"])
        lo, hi = key_range
        files = self.pruned_files(snap, key_range)
        from pyspark.sql import functions as F

        col = snap.get("stats_col")
        if col is None:
            raise ValueError(
                "key_range scan needs per-file stats: create/append the table "
                "with stats_col=<key column>"
            )
        return self._read_files(spark, snap, files).where(
            F.col(col).between(F.lit(lo), F.lit(hi))
        )

    def pruned_files(self, snap: dict, key_range: tuple) -> list[str]:
        """The file subset a ``key_range`` scan must read (exposed so
        tests can assert the pruning itself, not just result equality)."""
        lo, hi = key_range
        stats = snap.get("file_stats", {})
        out = []
        for f in snap["files"]:
            st = stats.get(f)
            if st is not None and st["rows"] == 0:
                continue  # empty file: always prunable
            if st is None or st["min"] is None or st["max"] is None:
                out.append(f)  # no stats -> cannot prune safely
            elif not (st["max"] < lo or st["min"] > hi):
                out.append(f)
        return out

    # -- writes -------------------------------------------------------------
    def append(self, df: DataFrame, *, extra_summary: dict | None = None) -> int:
        """Commit ``df`` as new files on top of the current version.
        Returns the new snapshot id; raises ``CommitConflict`` when a
        concurrent writer won the sequence number. ``extra_summary``
        entries land in the snapshot's summary dict — e.g. a streaming
        writer's batch id, which makes micro-batch replays detectable
        (the Iceberg streaming-writer idempotence pattern)."""
        return _commit(
            self._p,
            df,
            parent=self.current_snapshot_id(),
            operation="append",
            extra_summary=extra_summary,
        )

    def overwrite(self, df: DataFrame) -> int:
        """Commit ``df`` as the table's ENTIRE new content (logical
        replace; old files stay on disk for time travel until expired)."""
        return _commit(
            self._p, df, parent=self.current_snapshot_id(), operation="overwrite"
        )

    def compact(self, spark: SparkSession, *, target_files: int) -> int:
        """Rewrite the CURRENT content into ``target_files`` files and
        commit it as a ``compact`` snapshot — the maintenance op that
        keeps a streaming-ingested table (one commit per micro-batch =
        many small files) scannable. Content-identical by construction;
        adds NO rows, so incremental reads treat it as pass-through:
        ``added_between`` ranges crossing a compaction still return
        exactly the genuinely-appended rows (from their original files,
        which stay on disk until expired — expire only up to your last
        validated snapshot when a validation log trails the table).
        The superseded small files become reclaimable by
        ``expire_snapshots`` once no retained snapshot references them."""
        current = self.read(spark)
        return _commit(
            self._p,
            current.coalesce(max(1, int(target_files))),
            parent=self.current_snapshot_id(),
            operation="compact",
        )

    def delete_by_key(self, spark: SparkSession, keys) -> int:
        """Row-level delete by key value (takedown / curation: remove
        named clips from the corpus), Iceberg copy-on-write style with
        FILE-LEVEL pruning: files whose ``stats_col`` min/max range
        cannot contain any requested key are carried into the new
        snapshot UNTOUCHED (not rewritten, not even read); only files
        that might contain a key are rewritten without the matching
        rows. Deleting a handful of ids from a 10^12-row table then
        costs a scan of a few files, not the table. Requires
        ``stats_col`` (the key column) on the table.

        Commits a ``delete`` snapshot: like ``compact`` it ADDS no rows,
        so incremental readers skip it (violations already recorded for
        deleted rows linger in past validation-log partitions — history,
        not current state). Time travel still sees the rows before the
        delete until those snapshots expire."""
        from pyspark.sql import functions as F

        snap = self.snapshot(self.current_snapshot_id())
        col = snap.get("stats_col")
        if col is None:
            raise ValueError(
                "delete_by_key needs per-file stats: create the table with "
                "stats_col=<key column>"
            )
        keys = sorted(set(keys))
        stats = snap.get("file_stats", {})

        def may_contain(f: str) -> bool:
            st = stats.get(f)
            if st is None:
                return True  # no stats -> must assume a match
            if st["rows"] == 0:
                return False
            if st["min"] is None or st["max"] is None:
                return True
            return any(st["min"] <= k <= st["max"] for k in keys)

        touched = [f for f in snap["files"] if may_contain(f)]
        untouched = [f for f in snap["files"] if f not in set(touched)]
        survivors = self._read_files(spark, snap, touched).where(
            ~F.col(col).isin(keys)
        )
        return _commit(
            self._p,
            survivors,
            parent=snap["snapshot_id"],
            operation="delete",
            carry_files=untouched,
            extra_summary={
                "deleted_keys": len(keys),
                "rewritten_files": len(touched),
                "carried_files": len(untouched),
            },
        )

    def rollback(self, snapshot_id: int) -> None:
        """Point the current version back at an ancestor (data files
        untouched — later snapshots become time-travel-only)."""
        self.snapshot(snapshot_id)  # existence check
        _swap_hint(self._p, int(snapshot_id))

    # -- maintenance ----------------------------------------------------------
    def expire_snapshots(self, *, keep_last: int = 1) -> dict:
        """Storage reclamation: retain only the newest ``keep_last``
        reachable snapshots; delete every other manifest (including
        orphans from lost commit races) and every data file referenced
        ONLY by the removed ones. Time travel to an expired id raises
        ``SnapshotNotFound`` afterwards; the retained tail keeps its
        ``parent_id`` (history treats the missing parent as horizon).

        At 10^12 rows this is the job that keeps an append-heavy table
        from retaining every superseded file forever (Iceberg's
        ``expireSnapshots``); metadata work is driver-side JSON, file
        deletion is one pass over the removed set."""
        keep = self.history()[-max(1, keep_last):]
        keep_ids = {s["snapshot_id"] for s in keep}
        keep_files: set[str] = set()
        for s in keep:
            keep_files.update(s["files"])

        removed_ids, candidates = [], set()
        for name in os.listdir(self._p.metadata):
            if not (name.startswith("snap-") and name.endswith(".json")):
                continue
            sid = int(name[len("snap-") : -len(".json")])
            if sid in keep_ids:
                continue
            with open(os.path.join(self._p.metadata, name)) as f:
                snap = json.load(f)
            candidates.update(snap["files"])
            os.remove(os.path.join(self._p.metadata, name))
            removed_ids.append(sid)

        removed_files = 0
        for rel in sorted(candidates - keep_files):
            full = os.path.join(self._p.root, rel)
            if os.path.exists(full):
                os.remove(full)
                removed_files += 1
        # drop emptied commit dirs (cosmetic; readers never list dirs)
        for d in os.listdir(self._p.data):
            full = os.path.join(self._p.data, d)
            if os.path.isdir(full) and not os.listdir(full):
                os.rmdir(full)
        return {"removed_snapshots": sorted(removed_ids), "removed_files": removed_files}

    def remove_orphan_files(self) -> dict:
        """Delete data files referenced by NO manifest — the residue of
        commits that crashed before claiming a snapshot file (their
        uuid commit dir is invisible to every reader and to
        ``expire_snapshots``, which only follows manifests). Safe at
        any time: a file becomes referenced only by a manifest that
        already exists when this scans. Iceberg's same-named action."""
        referenced: set[str] = set()
        for name in os.listdir(self._p.metadata):
            if name.startswith("snap-") and name.endswith(".json"):
                with open(os.path.join(self._p.metadata, name)) as f:
                    snap = json.load(f)
                referenced.update(snap["files"])
                referenced.update(snap["added_files"])
        removed = 0
        for d in sorted(os.listdir(self._p.data)):
            ddir = os.path.join(self._p.data, d)
            if not os.path.isdir(ddir):
                continue
            for fn in os.listdir(ddir):
                rel = os.path.join("data", d, fn)
                if fn.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(ddir, fn))
                    removed += 1
            leftover = [f for f in os.listdir(ddir) if f.endswith(".parquet")]
            if not leftover and not any(
                os.path.join("data", d, f) in referenced for f in os.listdir(ddir)
            ):
                for fn in os.listdir(ddir):  # _SUCCESS etc.
                    os.remove(os.path.join(ddir, fn))
                os.rmdir(ddir)
        return {"removed_files": removed}


def _commit(
    p: _Paths,
    df: DataFrame,
    *,
    parent: int | None,
    operation: str,
    extra_summary: dict | None = None,
    stats_col: str | None = None,
    carry_files: list[str] | None = None,
) -> int:
    # 1. write the new immutable files under a collision-free commit dir
    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    abs_dir = os.path.join(p.data, commit_dir)
    df.write.mode("error").parquet(abs_dir)
    added = sorted(
        os.path.join("data", commit_dir, name)
        for name in os.listdir(abs_dir)
        if name.endswith(".parquet")
    )
    spark = df.sparkSession
    # parquet count(*) is footer-only — cheap metrics even on big commits
    added_rows = spark.read.parquet(abs_dir).count() if added else 0

    # 2. compose the new file set (+ carried-over file stats) from the
    #    parent manifest
    parent_snap = None
    if parent is not None:
        with open(p.snap(parent)) as f:
            parent_snap = json.load(f)
    if stats_col is None and parent_snap is not None:
        stats_col = parent_snap.get("stats_col")
    file_stats: dict[str, dict] = {}
    if operation == "append" and parent_snap is not None:
        files = parent_snap["files"] + added
        file_stats.update(parent_snap.get("file_stats") or {})
    elif carry_files is not None and parent_snap is not None:
        # copy-on-write delete: untouched files carry over verbatim
        # (with their stats); only the rewrite lands as new files
        files = list(carry_files) + added
        parent_stats = parent_snap.get("file_stats") or {}
        file_stats.update({f: parent_stats[f] for f in carry_files if f in parent_stats})
    else:
        files = list(added)
    if stats_col is not None and stats_col in df.columns:
        for rel in added:
            file_stats[rel] = _parquet_key_stats(os.path.join(p.root, rel), stats_col)

    # 3. claim the next sequence number atomically (O_EXCL = the commit
    #    point of the race; Iceberg's optimistic concurrency)
    existing = [
        int(n[len("snap-") : -len(".json")])
        for n in os.listdir(p.metadata)
        if n.startswith("snap-") and n.endswith(".json")
    ]
    sid = max(existing, default=0) + 1
    snap = {
        "snapshot_id": sid,
        "parent_id": parent,
        "operation": operation,
        "committed_at": time.time(),
        "files": files,
        # compact/delete rewrite existing rows into new files: they ADD
        # no rows, so incremental readers must see nothing from them
        "added_files": [] if operation in ("compact", "delete") else added,
        "summary": {
            "added_files": len(added),
            "added_rows": 0 if operation in ("compact", "delete") else int(added_rows),
            **({"compacted_rows": int(added_rows)} if operation == "compact" else {}),
            "total_files": len(files),
            **(extra_summary or {}),
        },
        # Spark's JSON schema form — lossless for nested/binary types
        "schema": df.schema.json(),
        "stats_col": stats_col,
        "file_stats": file_stats,
    }
    try:
        fd = os.open(p.snap(sid), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CommitConflict(
            f"snapshot {sid} was claimed by a concurrent writer; refresh and retry"
        )
    with os.fdopen(fd, "w") as f:
        json.dump(snap, f)

    # 4. swap the pointer (atomic replace); a crash before this line
    #    leaves snap-<sid> orphaned and the table readable at `parent`
    if parent is not None and _read_hint(p) != parent:
        # someone moved the pointer between our claim and now (e.g. a
        # rollback): our snapshot would fork history silently — refuse.
        raise CommitConflict("table version moved during commit; retry")
    _swap_hint(p, sid)
    return sid


def _parquet_key_stats(path: str, col: str) -> dict:
    """Per-file (rows, min, max) for ``col`` from parquet FOOTER
    statistics only — no data pages are read. Driver-side over just the
    files of one commit; on a real cluster this would ride the write
    tasks (Iceberg collects it in the writer)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = None
    if md.num_row_groups:
        rg0 = md.row_group(0)
        for i in range(rg0.num_columns):
            if rg0.column(i).path_in_schema == col:
                idx = i
                break
    mn = mx = None
    if idx is not None:
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                mn = mx = None
                break
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
    return {"rows": md.num_rows, "min": mn, "max": mx}


def _read_hint(p: _Paths) -> int:
    with open(p.hint) as f:
        return int(f.read().strip())


def _swap_hint(p: _Paths, sid: int) -> None:
    tmp = p.hint + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(str(sid))
    os.replace(tmp, p.hint)


# -- incremental validation --------------------------------------------------


class SnapshotValidationLog:
    """Validate a snapshot table INCREMENTALLY: each call scans only the
    rows appended since the last validated snapshot.

    At 10^12 rows the full-table re-validation after every upstream
    append is the cost that kills nightly data-quality jobs; the correct
    unit of work is the snapshot delta. This composes the snapshot
    layer's ``added_between`` with any violations-producing suite
    (``ClipValidationSuite`` or a plain ``Schema``) and keeps its own
    lineage log:

    - ``<run_dir>/violations/snapshot=<id>/`` — violation rows found in
      the increment that ENDED at snapshot ``id`` (parquet, partitioned
      so the accumulated violation table prunes by snapshot);
    - ``<run_dir>/validated/snap_<id>.json`` — per-increment manifest
      (from/to snapshot ids, rows scanned, violations, digest);
    - ``<run_dir>/last-validated.text`` — atomic pointer, same protocol
      as the table's own version hint.

    Exactly-once: the violations write lands BEFORE the manifest, and
    the manifest before the pointer swap; a crash anywhere re-runs the
    same increment with ``mode=overwrite`` into the same
    ``snapshot=<id>`` partition — idempotent, never double-counted
    (the landed-sink hardening pattern, streaming/validate_stream.py).
    """

    def __init__(self, table: SnapshotTable, run_dir: str):
        self.table = table
        self.run_dir = run_dir
        os.makedirs(os.path.join(run_dir, "validated"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "violations"), exist_ok=True)
        self._pointer = os.path.join(run_dir, "last-validated.text")

    def last_validated(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def validate_increment(self, spark: SparkSession, suite) -> dict | None:
        """Validate rows appended since the last validated snapshot up
        to the table's CURRENT snapshot. Returns the increment manifest,
        or None when already up to date. ``suite`` is anything with a
        ``violations(df) -> DataFrame`` method."""
        from pyspark.sql import functions as F

        frm = self.last_validated()
        to = self.table.current_snapshot_id()
        if frm == to:
            return None
        try:
            inc = self.table.added_between(spark, frm, to)
        except (CommitConflict, SnapshotNotFound):
            # the delta is undefined: the table was overwritten, rolled
            # back past us, or our last-validated snapshot was expired —
            # fall back to a full re-validation of `to`.
            inc = self.table.read(spark, to)
            frm = None
        violations = suite.violations(inc)
        vdir = os.path.join(self.run_dir, "violations", f"snapshot={to}")
        violations.write.mode("overwrite").parquet(vdir)
        landed = spark.read.parquet(vdir)
        # order-insensitive content digest over whatever violation
        # schema the suite emits (clips suites: clip_id/field/message;
        # plain Schema results: row_key/field/message)
        digest_cols = [F.col(c).cast("string") for c in landed.columns]
        stats = landed.agg(
            F.count(F.lit(1)).alias("violations"),
            F.coalesce(
                F.sum(F.crc32(F.concat_ws("\x1f", *digest_cols))),
                F.lit(0),
            ).alias("digest"),
        ).head()
        manifest = {
            "from_snapshot": frm,
            "to_snapshot": to,
            "rows_scanned": inc.count(),
            "violations": int(stats["violations"]),
            "digest": int(stats["digest"]),
        }
        with open(os.path.join(self.run_dir, "validated", f"snap_{to:08d}.json"), "w") as f:
            json.dump(manifest, f)
        tmp = self._pointer + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(to))
        os.replace(tmp, self._pointer)
        return manifest

    def all_violations(self, spark: SparkSession) -> DataFrame:
        """Every violation found so far, with its ``snapshot`` partition
        column (prunes on snapshot-range predicates)."""
        return spark.read.option("basePath", os.path.join(self.run_dir, "violations")).parquet(
            os.path.join(self.run_dir, "violations")
        )

    def manifests(self) -> list[dict]:
        vdir = os.path.join(self.run_dir, "validated")
        out = []
        for name in sorted(os.listdir(vdir)):
            if name.startswith("snap_") and name.endswith(".json"):
                with open(os.path.join(vdir, name)) as f:
                    out.append(json.load(f))
        return out
