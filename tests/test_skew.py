"""Skew guard: heavy blobs spread thin before the analyze UDF stage
(plans/skew.py spread_heavy; the reference splits oversized work at 20k
rows / 150 pages, defaultsettings.py:383-391, pdf-tools/run.sh:5-11)."""

import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.plans.skew import HEAVY_SPREAD_BYTES, spread_heavy


def test_spread_heavy_distributes_heavy_rows(spark):
    """8 heavy blobs written into ONE input partition must come out of
    spread_heavy spread over several partitions; light rows keep their
    input partitioning (no shuffle)."""
    heavy_payload = b"x" * (HEAVY_SPREAD_BYTES + 1)
    rows = [(f"http://heavy/{i}", heavy_payload) for i in range(8)]
    rows += [(f"http://light/{i}", b"tiny") for i in range(100)]
    df = spark.createDataFrame(rows, "url string, html binary").coalesce(1)

    out = spread_heavy(df)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .withColumn("heavy", F.length("html") > HEAVY_SPREAD_BYTES)
        .groupBy("heavy")
        .agg(F.countDistinct("pid").alias("n_parts"), F.count("*").alias("n"))
        .collect()
    )
    by_class = {r["heavy"]: r for r in parts}
    assert by_class[True]["n"] == 8
    assert by_class[False]["n"] == 100
    # 8 url-hashed heavy rows over >=16 partitions: expect good spread
    assert by_class[True]["n_parts"] >= 4
    # light rows stayed in their single input partition (pass-through)
    assert by_class[False]["n_parts"] == 1


def test_pipeline_with_heavy_blobs_unchanged_output(spark, tmp_path):
    """End-to-end: a skewed corpus (2 multi-MB html blobs among small
    ones) extracts identically with the skew guard wired in."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    big_text = "heavy body word " * 600_000  # ~9.6 MB (> HEAVY_SPREAD_BYTES)
    rows = [
        ("http://big/a", f"<html><body>{big_text}</body></html>".encode()),
        ("http://big/b", f"<html><body>{big_text}X</body></html>".encode()),
    ] + [
        (f"http://small/{i}", f"<html><body>doc {i}</body></html>".encode())
        for i in range(50)
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    p = str(tmp_path / "pages")
    pages.write.parquet(p)
    digests, _ = run_extraction(spark, spark.read.parquet(p))
    got = {r["url"]: r["text"] for r in digests.select("url", "text").collect()}
    assert len(got) == 52
    assert got["http://big/a"].strip() == big_text.strip()
    assert got["http://small/7"] == "doc 7"


def test_salted_join_matches_plain_join(spark):
    """Hot-key-salted join must be result-identical to the plain join,
    for inner and left joins, including hot keys missing from the dim."""
    from hoover_snoop2_spark.plans.skew import salted_join

    fact = spark.createDataFrame(
        [(i, 7 if i % 4 else i % 11, i * 3) for i in range(400)],
        "rid long, k long, v long",
    )
    dim = spark.createDataFrame(
        [(k, k * 10) for k in range(0, 11, 2)] + [(7, 70)],
        "k long, w long",
    )

    for how in ("inner", "left"):
        got = (
            salted_join(fact, dim, "k", "rid", hot_keys=[7, 99], how=how)
            .orderBy("rid")
            .collect()
        )
        want = fact.join(dim, "k", how).orderBy("rid").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), how


def test_salted_join_spreads_hot_key_and_salts_plan(spark):
    """The join condition must include the salt column, and hot-key fact
    rows must carry more than one distinct salt value."""
    from hoover_snoop2_spark.plans.skew import salted_join

    fact = spark.createDataFrame(
        [(i, 7, 1) for i in range(200)], "rid long, k long, v long"
    )
    dim = spark.createDataFrame([(7, 70)], "k long, w long")
    out = salted_join(fact, dim, "k", "rid", hot_keys=[7], buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_sjsalt" in plan
    assert out.count() == 200

    from hoover_snoop2_spark.plans import skew as _skew
    from pyspark.sql import functions as F2

    salted_fact = fact.withColumn(
        "_sjsalt",
        F2.pmod(F2.xxhash64(F2.col("rid")), F2.lit(8)).cast("int"),
    )
    n_salts = salted_fact.select("_sjsalt").distinct().count()
    assert n_salts > 4  # 200 hot rows spread over 8 buckets


def test_hybrid_skew_join_matches_plain_join_and_splits_plan(spark):
    """Result identical to a plain inner join; the physical plan must
    contain BOTH a broadcast hash join (hot branch) and a sort-merge
    join (cold branch)."""
    from pyspark.sql import functions as F2

    from hoover_snoop2_spark.plans.skew import hybrid_skew_join

    # key 1 hot (300 rows), keys 2..21 cold (5 rows each); dim covers
    # 1..21 plus an unmatched 99
    fact = spark.createDataFrame(
        [(i, 1) for i in range(300)]
        + [(1000 + 20 * j + k, 2 + k) for j in range(5) for k in range(20)],
        "rid long, k long",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in list(range(1, 22)) + [99]], "dk long, name string"
    )
    out = hybrid_skew_join(fact, dim, "k", "dk", hot_threshold=100)
    plain = fact.join(dim, fact["k"] == dim["dk"])
    assert (
        sorted(map(tuple, out.select("rid", "k", "name").collect()))
        == sorted(map(tuple, plain.select("rid", "k", "name").collect()))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan

    # hot slice really is just the hot key
    counts = fact.groupBy("k").count()
    assert [
        r["k"] for r in counts.filter(F2.col("count") >= 100).collect()
    ] == [1]
