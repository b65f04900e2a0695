"""Corpus-shaping operators (operators/sampling.py)."""

from pyspark.sql import functions as F

from hoover_snoop2_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
    rank_key,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string")


def test_cap_keeps_undercap_groups_whole(spark):
    rows = [(i, "big") for i in range(20)] + [(100 + i, "tiny") for i in range(3)]
    out = cap_per_group(_df(spark, rows), "host", cap=5, id_col="doc_id")
    got = {r["host"]: 0 for r in out.collect()}
    counts = {r["host"]: r["n"] for r in
              out.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 5, "tiny": 3}


def test_cap_is_deterministic_and_engine_stable(spark):
    rows = [(i, f"h{i % 3}") for i in range(30)]
    a = sorted(r["doc_id"] for r in
               cap_per_group(_df(spark, rows), "host", 4, "doc_id").collect())
    b = sorted(r["doc_id"] for r in
               cap_per_group(_df(spark, rows), "host", 4, "doc_id").collect())
    assert a == b
    # python replica of the multiplicative-hash selection
    import collections
    by_host = collections.defaultdict(list)
    for i, h in rows:
        by_host[h].append(i)
    expect = sorted(
        i
        for members in by_host.values()
        for i in sorted(members, key=lambda x: ((x % 2**32) * 2654435761 % 2**32, x))[:4]
    )
    assert a == expect


def test_cap_exact_boundary_no_rank(spark):
    rows = [(i, "h") for i in range(5)]
    out = cap_per_group(_df(spark, rows), "host", cap=5, id_col="doc_id")
    assert out.count() == 5


def test_deterministic_sample_membership_and_purity(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = deterministic_sample(df, "doc_id", 0.25)
    got = sorted(r["doc_id"] for r in out.collect())
    expect = [i for i in range(1000)
              if (i % 2**32) * 2654435761 % 2**32 < int(0.25 * 2**32)]
    assert got == expect
    assert 150 < len(got) < 350  # roughly the asked fraction
    # pure filter: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rank_key_is_permutation_prefix_free(spark):
    # no collisions across a contiguous id range (multiplicative hash is
    # a bijection mod 2^32)
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    n = df.select(rank_key("doc_id").alias("k")).distinct().count()
    assert n == 5000


def test_rank_key_negative_ids_stay_in_range(spark):
    df = spark.createDataFrame([(-5,), (-1,), (0,), (7,)], "doc_id long")
    vals = [r["k"] for r in df.select(rank_key("doc_id").alias("k")).collect()]
    assert all(0 <= v < 2**32 for v in vals)


def test_rank_key_split_multiply_matches_naive(spark):
    # includes ids near 2^32 where a naive (a % 2^32) * K overflows a long
    ids = [0, 1, 7, 65535, 65536, 123456789, 2**31 - 1, 2**32 - 1,
           2**32, 2**40 + 17]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["k"]
           for r in df.select("doc_id", rank_key("doc_id").alias("k")).collect()}
    for i in ids:
        assert got[i] == (i % 2**32) * 2654435761 % 2**32, i
