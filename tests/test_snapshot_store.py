"""SnapshotStore: Iceberg-shaped commits, time travel, incremental scans,
rollback, snapshot expiry (plans/checkpoint.py)."""

import os

import pytest

from hoover_snoop2_spark.plans.checkpoint import SnapshotStore


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "snaps"))


def test_append_commits_and_time_travel(spark, store):
    v1 = store.commit(spark.range(0, 3), "t")
    v2 = store.commit(spark.range(3, 5), "t")
    assert (v1, v2) == (1, 2)
    assert _ids(store.read(spark, "t")) == [0, 1, 2, 3, 4]
    assert _ids(store.read(spark, "t", version=1)) == [0, 1, 2]


def test_incremental_scan_is_files_diff(spark, store):
    store.commit(spark.range(0, 3), "t")
    store.commit(spark.range(3, 5), "t")
    store.commit(spark.range(5, 6), "t")
    assert _ids(store.incremental(spark, "t", since=1)) == [3, 4, 5]
    assert _ids(store.incremental(spark, "t", since=2)) == [5]
    assert store.incremental(spark, "t", since=3).count() == 0
    assert _ids(store.incremental(spark, "t", since=0)) == [0, 1, 2, 3, 4, 5]


def test_overwrite_starts_fresh_file_list(spark, store):
    store.commit(spark.range(0, 3), "t")
    store.commit(spark.range(10, 12), "t", mode="overwrite")
    assert _ids(store.read(spark, "t")) == [10, 11]
    # the old snapshot stays readable (snapshot isolation)
    assert _ids(store.read(spark, "t", version=1)) == [0, 1, 2]


def test_rollback_is_metadata_only(spark, store):
    store.commit(spark.range(0, 3), "t")
    store.commit(spark.range(3, 5), "t")
    store.rollback("t", 1)
    assert store.current_version("t") == 1
    assert _ids(store.read(spark, "t")) == [0, 1, 2]
    # a new commit appends on top of the rolled-back snapshot
    store.commit(spark.range(7, 8), "t")
    assert _ids(store.read(spark, "t")) == [0, 1, 2, 7]


def test_expire_deletes_unreferenced_dirs_only(spark, store, tmp_path):
    store.commit(spark.range(0, 2), "t")            # v1: snap-1
    store.commit(spark.range(2, 4), "t")            # v2: snap-1,2
    store.commit(spark.range(9, 10), "t", mode="overwrite")  # v3: snap-3
    store.commit(spark.range(10, 11), "t")          # v4: snap-3,4
    deleted = store.expire("t", keep_last=2)
    # v1/v2 dropped; snap-1 and snap-2 unreferenced by v3/v4
    assert sorted(deleted) == ["snap-00001", "snap-00002"]
    assert [s["version"] for s in store.history("t")] == [3, 4]
    assert _ids(store.read(spark, "t")) == [9, 10]
    with pytest.raises(KeyError):
        store.read(spark, "t", version=1)


def test_expire_keeps_shared_files(spark, store):
    store.commit(spark.range(0, 2), "t")   # v1: snap-1
    store.commit(spark.range(2, 3), "t")   # v2: snap-1,2
    store.commit(spark.range(3, 4), "t")   # v3: snap-1,2,3
    deleted = store.expire("t", keep_last=1)
    # snap-1/2 still referenced by the retained v3 — nothing deleted
    assert deleted == []
    assert _ids(store.read(spark, "t")) == [0, 1, 2, 3]


def test_empty_table_raises(spark, store):
    with pytest.raises(KeyError):
        store.read(spark, "missing")


def test_digest_resume_via_snapshots(spark, store, tmp_path):
    """Pipeline-shaped flow: each extraction run commits its digests;
    a downstream indexer consumes only the incremental rows."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction
    from hoover_snoop2_spark.corpus import generate_pages

    pages_path, _ = generate_pages(30, str(tmp_path))
    pages = spark.read.parquet(pages_path)
    d1, _ = run_extraction(spark, pages.limit(10),
                           checkpoint_dir=str(tmp_path / "c1"))
    store.commit(d1.select("url", "text"), "digests")
    d2, _ = run_extraction(spark, pages,
                           checkpoint_dir=str(tmp_path / "c2"))
    new_urls = {r["url"] for r in d2.select("url").subtract(
        d1.select("url")).collect()}
    store.commit(d2.select("url", "text").join(
        store.read(spark, "digests").select("url"), "url", "left_anti"),
        "digests")
    inc = store.incremental(spark, "digests", since=1)
    assert {r["url"] for r in inc.select("url").collect()} == new_urls


def test_reader_isolated_from_later_commits(spark, store):
    """The docstring's snapshot-isolation claim, proven: a DataFrame
    planned against v1 still collects v1's rows after later commits and
    even after expire() (v1's files remain referenced by the append
    chain, so nothing it reads is deleted)."""
    store.commit(spark.range(0, 3), "t")
    lazy_v1 = store.read(spark, "t", version=1)   # planned, not collected
    store.commit(spark.range(3, 6), "t")
    store.commit(spark.range(6, 7), "t")
    assert _ids(lazy_v1) == [0, 1, 2]
    store.expire("t", keep_last=1)
    assert _ids(lazy_v1) == [0, 1, 2]


def test_orphan_snap_dir_from_crashed_commit_is_recovered(spark, store, tmp_path):
    """A crash between the data write and the metadata swap leaves an
    unreferenced snap-NNNNN dir; the next commit regenerates the same
    dirname and must clean the orphan instead of failing forever."""
    store.commit(spark.range(0, 3), "t")
    # simulate the crashed commit: snap-00002 written, metadata never swapped
    orphan = os.path.join(store.root, "t", "snap-00002")
    spark.range(100, 103).write.parquet(orphan)
    v2 = store.commit(spark.range(3, 5), "t")
    assert v2 == 2
    assert _ids(store.read(spark, "t")) == [0, 1, 2, 3, 4]  # no 100..102


def test_compact_rewrites_small_files(spark, tmp_path):
    """rewrite_data_files analog: N append deltas → one data dir, rows
    identical, time travel to pre-compaction versions intact, the
    files-diff incremental scan sees the rewrite as its own snapshot."""
    from hoover_snoop2_spark.plans.checkpoint import SnapshotStore

    store = SnapshotStore(str(tmp_path / "snap"))
    versions = []
    for i in range(4):
        df = spark.range(i * 10, (i + 1) * 10).withColumnRenamed("id", "v")
        versions.append(store.commit(df, "t", mode="append"))
    before = sorted(r.v for r in store.read(spark, "t").collect())
    assert len(store._resolve("t", None)) == 4

    new_v = store.compact(spark, "t")
    assert new_v == versions[-1] + 1
    assert len(store._resolve("t", None)) == 1
    after = sorted(r.v for r in store.read(spark, "t").collect())
    assert after == before == list(range(40))

    # time travel to a pre-compaction version is untouched
    old = sorted(r.v for r in store.read(spark, "t", versions[1]).collect())
    assert old == list(range(20))
    # the rewrite is its own snapshot for incremental consumers: the
    # files-diff from the last pre-compaction version is the new dir
    inc = store.incremental(spark, "t", versions[-1])
    assert sorted(r.v for r in inc.collect()) == list(range(40))
    # nothing to do on a second pass
    assert store.compact(spark, "t") is None
    # expire reclaims the superseded small dirs
    deleted = store.expire("t", keep_last=1)
    assert len(deleted) == 4
    assert sorted(r.v for r in store.read(spark, "t").collect()) == before


def test_merge_upsert_copy_on_write(spark, store):
    """MERGE INTO semantics: matched keys replaced, unmatched inserted,
    older snapshots untouched (snapshot isolation), empty-table merge
    degenerates to a plain write."""
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, val string"
    )
    v1 = store.merge(spark, base, "t", ["k"])     # empty table: plain write
    upd = spark.createDataFrame(
        [(3, "NEW3"), (7, "NEW7"), (100, "v100")], "k long, val string"
    )
    v2 = store.merge(spark, upd, "t", ["k"])
    got = {r.k: r.val for r in store.read(spark, "t").collect()}
    assert len(got) == 11
    assert got[3] == "NEW3" and got[7] == "NEW7" and got[100] == "v100"
    assert got[0] == "v0"                          # untouched survivor
    # time travel: v1 still shows the pre-merge values
    old = {r.k: r.val for r in store.read(spark, "t", v1).collect()}
    assert old[3] == "v3" and 100 not in old
    assert v2 > v1
    # schema drift is rejected, not silently unioned
    bad = spark.createDataFrame([(1, 2.0)], "k long, other double")
    import pytest

    with pytest.raises(ValueError):
        store.merge(spark, bad, "t", ["k"])


def test_schema_evolution_add_column_null_backfill(spark, store):
    from pyspark.sql import functions as F

    store.commit(spark.range(0, 3), "t")
    v2 = store.commit(
        spark.range(3, 5).withColumn("lang", F.lit("en")), "t"
    )
    cur = store.read(spark, "t")
    assert set(cur.columns) == {"id", "lang"}
    rows = {r["id"]: r["lang"] for r in cur.collect()}
    # pre-evolution files backfill NULL (Iceberg add-column semantics)
    assert rows[0] is None and rows[4] == "en"
    # time travel to v1 shows the old schema only
    assert store.read(spark, "t", version=1).columns == ["id"]
    assert store.schema("t") == {"id": "bigint", "lang": "string"}
    assert store.schema("t", version=1) == {"id": "bigint"}
    assert v2 == 2


def test_schema_evolution_rejects_drop_and_retype(spark, store):
    from pyspark.sql import functions as F

    store.commit(spark.range(0, 3).withColumn("lang", F.lit("en")), "t")
    with pytest.raises(ValueError, match="missing=\\['lang'\\]"):
        store.commit(spark.range(3, 5), "t")
    with pytest.raises(ValueError, match="retyped=\\['lang'\\]"):
        store.commit(
            spark.range(3, 5).withColumn("lang", F.lit(7)), "t"
        )
    # overwrite accepts any schema (fresh file list)
    store.commit(spark.range(9, 10), "t", mode="overwrite")
    assert store.schema("t") == {"id": "bigint"}
