"""Stage checkpoints + resume.

The reference's resumability comes from the persistent Task table: finished
work is skipped via ``is_completed`` (tasks.py:356-364) and invalidated by a
per-function ``version`` bump (models.py:732-736).  Our analog: every stage
boundary writes a parquet snapshot under a run directory with a manifest
recording the stage version; a resumed run anti-joins new input hashes
against the last snapshot's processed hashes and only analyzes the delta.

(On a production cluster these snapshots are Iceberg table commits —
``df.writeTo(tbl).append()`` — giving atomic snapshots and incremental
reads; the Iceberg runtime jar is absent in this sandbox, so a plain
parquet directory + manifest JSON stands in.  The interface is the same.
``SnapshotStore`` below goes further and reproduces Iceberg's actual
metadata discipline — versioned per-snapshot file lists with append
commits, time travel, files-diff incremental scans, rollback and
expire_snapshots — for the digest output table.)

Checkpointing also truncates lineage for the iterative unpack loop — an
unbounded logical plan across rounds would otherwise grow per iteration.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

#: bump to invalidate previously-checkpointed stage results (the analog of
#: @snoop_task(version=...) — e.g. filesystem.handle_file v5)
STAGE_VERSIONS = {
    "digests": 1,
}


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.manifest.json")

    def write(self, df: DataFrame, stage: str, version: int | None = None) -> DataFrame:
        """Write + read back (lineage truncation). Returns the re-read DF.

        The write lands in ``<stage>.tmp`` and is swapped in afterwards, so
        a plan that still *reads* the previous snapshot of the same stage
        (e.g. a resume run unioning the old digests) never has its input
        files deleted mid-job — the poor man's Iceberg snapshot commit.
        """
        import shutil

        path = self._path(stage)
        tmp = path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        old = path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        with open(self._manifest(stage), "w") as f:
            json.dump(
                {"stage": stage, "version": version or STAGE_VERSIONS.get(stage, 1)},
                f,
            )
        return df.sparkSession.read.parquet(path)

    def read(self, spark: SparkSession, stage: str) -> DataFrame | None:
        path = self._path(stage)
        if not os.path.exists(path):
            return None
        return spark.read.parquet(path)

    def valid(self, stage: str, version: int | None = None) -> bool:
        m = self._manifest(stage)
        if not (os.path.exists(m) and os.path.exists(self._path(stage))):
            return False
        with open(m) as f:
            manifest = json.load(f)
        want = version or STAGE_VERSIONS.get(stage, 1)
        return manifest.get("version") == want


class SnapshotStore:
    """Iceberg-shaped snapshot table over a parquet directory tree.

    On a production cluster these are real Iceberg tables
    (``df.writeTo(tbl).append()`` / ``snapshot-id`` time travel /
    ``expire_snapshots``); the runtime jar is absent in this sandbox, so
    this class reproduces the metadata discipline Iceberg actually uses —
    per-snapshot DATA-FILE LISTS in a metadata document, commits that only
    add files, reads that resolve a version to its file list:

    - ``commit(df, table, mode)``  — 'append' snapshots reference every
      previous data dir plus the new one; 'overwrite' starts a fresh list.
      The metadata swap is atomic (tmp + rename), and existing data dirs
      are never rewritten, so concurrent readers of older snapshots are
      undisturbed (Iceberg's snapshot-isolation guarantee).
    - ``read(spark, table, version=None)``  — current or time-travel.
    - ``incremental(spark, table, since)``  — rows in files added after
      snapshot ``since`` (Iceberg incremental scan); the resume hook for
      downstream consumers that processed up to a version.
    - ``rollback(table, version)``  — metadata-only pointer move.
    - ``expire(table, keep_last)``  — drops history entries and deletes
      data dirs unreferenced by the retained snapshots.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _meta_path(self, table: str) -> str:
        return os.path.join(self.root, table, "metadata.json")

    def _meta(self, table: str) -> dict:
        p = self._meta_path(table)
        if not os.path.exists(p):
            return {"current": 0, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _write_meta(self, table: str, meta: dict) -> None:
        p = self._meta_path(table)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, p)

    def _snap(self, meta: dict, version: int) -> dict:
        for s in meta["snapshots"]:
            if s["version"] == version:
                return s
        raise KeyError(f"snapshot v{version} not in history")

    def commit(self, df: DataFrame, table: str, mode: str = "append") -> int:
        """Write a new snapshot; returns its version number.

        Schema evolution follows Iceberg's safe subset: an append may ADD
        columns (older data files simply lack them; reads resolve by name
        and backfill NULL — Iceberg's add-column semantics), but dropping
        or retyping an existing column raises, because a parquet-union
        read cannot express those safely the way Iceberg's column-id
        metadata can.  An 'overwrite' starts a fresh file list, so any
        schema is accepted.  Each snapshot records its schema so
        ``schema(table, version)`` documents the evolution."""
        if mode not in ("append", "overwrite"):
            raise ValueError(mode)
        meta = self._meta(table)
        new_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        if mode == "append" and meta["current"]:
            cur_snap = self._snap(meta, meta["current"])
            old_schema = cur_snap.get("schema")
            if old_schema is not None:
                missing = [c for c in old_schema if c not in new_schema]
                retyped = [
                    c
                    for c, t in old_schema.items()
                    if c in new_schema and new_schema[c] != t
                ]
                if missing or retyped:
                    raise ValueError(
                        "append schema evolution only adds columns: "
                        f"missing={missing} retyped={retyped} "
                        "(use mode='overwrite' to rewrite the table)"
                    )
        # allocate past ALL history, never reusing ids — after a rollback
        # the rolled-past versions still exist and stay readable
        version = max(
            [s["version"] for s in meta["snapshots"]], default=0
        ) + 1
        dirname = f"snap-{version:05d}"
        os.makedirs(os.path.join(self.root, table), exist_ok=True)
        snap_path = os.path.join(self.root, table, dirname)
        # crash recovery: a commit that died between the data write and the
        # metadata swap leaves an orphan snap dir; version=max(history)+1
        # regenerates the same dirname, so errorifexists would then fail
        # every future commit.  The dir is garbage by construction (no
        # snapshot in history references it — referenced dirs can never
        # collide because their versions stay in history), so remove it.
        if os.path.exists(snap_path):
            referenced = any(
                dirname in s["files"] for s in meta["snapshots"]
            )
            if referenced:  # pragma: no cover — invariant violation
                raise RuntimeError(
                    f"snapshot dir {dirname} exists AND is referenced; "
                    "metadata corrupt"
                )
            shutil.rmtree(snap_path)
        df.write.mode("errorifexists").parquet(snap_path)
        if mode == "append" and meta["current"]:
            files = list(self._snap(meta, meta["current"])["files"])
        else:
            files = []
        files.append(dirname)
        meta["snapshots"].append(
            {
                "version": version,
                "files": files,
                "mode": mode,
                "schema": new_schema,
            }
        )
        meta["current"] = version
        self._write_meta(table, meta)
        return version

    def schema(self, table: str, version: int | None = None) -> dict:
        """Column → type of a snapshot (current by default) — the
        explicit evolution record Iceberg keeps per schema-id."""
        meta = self._meta(table)
        v = meta["current"] if version is None else version
        return dict(self._snap(meta, v).get("schema") or {})

    def _resolve(self, table: str, version: int | None) -> list[str]:
        meta = self._meta(table)
        v = meta["current"] if version is None else version
        if v == 0:
            raise KeyError(f"table {table!r} has no snapshots")
        return [
            os.path.join(self.root, table, d)
            for d in self._snap(meta, v)["files"]
        ]

    def read(
        self, spark: SparkSession, table: str, version: int | None = None
    ) -> DataFrame:
        # mergeSchema resolves add-column evolution by name: files written
        # before a column existed yield NULL for it (Iceberg read semantics)
        return spark.read.option("mergeSchema", "true").parquet(
            *self._resolve(table, version)
        )

    def incremental(
        self, spark: SparkSession, table: str, since: int
    ) -> DataFrame:
        """Rows added after snapshot ``since`` (files-diff scan — no
        anti-join over data, metadata only)."""
        cur = self._resolve(table, None)
        base = set(self._resolve(table, since)) if since > 0 else set()
        added = [p for p in cur if p not in base]
        if not added:
            return spark.read.parquet(*cur).limit(0)
        return spark.read.parquet(*added)

    def compact(
        self,
        spark: SparkSession,
        table: str,
        target_file_bytes: int = 128 * 2**20,
    ) -> int | None:
        """Iceberg ``rewrite_data_files`` analog — the small-files
        problem is what append-only incremental commits naturally
        produce at 10^12-document scale (every resume delta is its own
        data dir; readers pay an open() per tiny file).  Read the
        current snapshot once, coalesce to ``ceil(bytes/target)``
        output files (coalesce, not repartition: no shuffle — this is
        an IO rewrite, not a redistribution), and commit the rewrite as
        a fresh overwrite snapshot.  Row content is identical; older
        snapshots keep their own file lists, so time travel and
        concurrent readers of previous versions are undisturbed, and
        ``expire`` eventually reclaims the superseded dirs.  Returns
        the new version, or None when the current snapshot is already
        a single data dir (nothing to do)."""
        dirs = self._resolve(table, None)
        if len(dirs) <= 1:
            return None
        total = 0
        for d in dirs:
            for name in os.listdir(d):
                if name.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(d, name))
        n_files = max(1, -(-total // target_file_bytes))
        df = spark.read.parquet(*dirs).coalesce(n_files)
        return self.commit(df, table, mode="overwrite")

    def merge(
        self,
        spark: SparkSession,
        df: DataFrame,
        table: str,
        key_cols: list[str],
    ) -> int:
        """Iceberg ``MERGE INTO`` (copy-on-write upsert): rows of the
        current snapshot whose key matches an incoming row are replaced,
        unmatched incoming rows are inserted.  Implemented as the CoW
        plan Iceberg itself produces — survivors = current LEFT ANTI
        incoming on the key, result = survivors UNION incoming, written
        as a fresh overwrite snapshot (older versions stay readable,
        snapshot isolation intact).  One shuffle on the key for the
        anti-join; the union is shuffle-free.  At 10^12-row scale this
        rewrites the table like Iceberg CoW does — for update-heavy
        streams a merge-on-read layout (delete files resolved at scan)
        is the next step, traded off exactly as Iceberg documents it.
        First commit on an empty table degenerates to the plain write.
        Returns the new version."""
        meta = self._meta(table)
        if meta["current"] == 0:
            return self.commit(df, table, mode="overwrite")
        current = self.read(spark, table)
        if set(current.columns) != set(df.columns):
            raise ValueError(
                f"merge schema mismatch: {sorted(current.columns)} vs "
                f"{sorted(df.columns)}"
            )
        survivors = current.join(
            df.select(*key_cols).distinct(), on=key_cols, how="left_anti"
        )
        merged = survivors.unionByName(df)
        return self.commit(merged, table, mode="overwrite")

    def history(self, table: str) -> list[dict]:
        return list(self._meta(table)["snapshots"])

    def current_version(self, table: str) -> int:
        return self._meta(table)["current"]

    def rollback(self, table: str, version: int) -> None:
        meta = self._meta(table)
        self._snap(meta, version)  # must exist
        meta["current"] = version
        self._write_meta(table, meta)

    def expire(self, table: str, keep_last: int) -> list[str]:
        """Retain the last ``keep_last`` snapshots (and the current one if
        rolled back further); delete data dirs no retained snapshot
        references.  Returns deleted dir names."""
        import shutil

        meta = self._meta(table)
        snaps = meta["snapshots"]
        if len(snaps) <= keep_last:
            return []
        keep = snaps[-keep_last:]
        keep_versions = {s["version"] for s in keep}
        keep_versions.add(meta["current"])
        retained = [s for s in snaps if s["version"] in keep_versions]
        referenced = {d for s in retained for d in s["files"]}
        deleted = []
        for s in snaps:
            if s["version"] in keep_versions:
                continue
            for d in s["files"]:
                if d not in referenced:
                    full = os.path.join(self.root, table, d)
                    if os.path.exists(full):
                        shutil.rmtree(full)
                    referenced.add(d)  # delete once
                    deleted.append(d)
        meta["snapshots"] = retained
        self._write_meta(table, meta)
        return deleted


def resume_delta(
    new_input: DataFrame,
    processed: DataFrame | None,
    key: str = "blob_key",
    processed_key: str = "sha256",
) -> DataFrame:
    """Anti-join memoization (the is_completed analog): keep only input rows
    whose content hash has no finished digest yet.  The pipeline keys work
    rows by the JVM-computed ``blob_key`` (sha2-256); digests carry the
    same value in their ``sha256`` field."""
    if processed is None:
        return new_input
    from pyspark.sql import functions as F

    proc = processed.select(F.col(processed_key).alias(key)).distinct()
    return new_input.join(proc, key, "left_anti")
