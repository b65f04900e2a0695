"""Both dedup strategies (broadcast election vs co-located shuffle) must
produce identical digests, including under resume and recursion guards."""

import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.corpus import generate_pages
from hoover_snoop2_spark.plans.pipeline import run_extraction


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("strat_corpus")
    return generate_pages(200, str(d))


def _run(spark, pages_path, strategy, **kw):
    return run_extraction(
        spark, spark.read.parquet(pages_path), dedup_strategy=strategy, **kw
    )[0]


def test_strategies_agree(spark, small_corpus):
    pages_path, golden_path = small_corpus
    a = _run(spark, pages_path, "broadcast").select("url", "sha3_256", "text")
    b = _run(spark, pages_path, "shuffle").select("url", "sha3_256", "text")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    golden = spark.read.parquet(golden_path)
    j = golden.alias("g").join(b.alias("d"), "url", "left")
    assert j.filter(
        F.coalesce(F.col("d.text"), F.lit("")) != F.coalesce(F.col("g.text"), F.lit(""))
    ).count() == 0


def test_shuffle_strategy_resume(spark, small_corpus):
    pages_path, _ = small_corpus
    first = _run(spark, pages_path, "shuffle")
    again = run_extraction(
        spark, spark.read.parquet(pages_path),
        dedup_strategy="shuffle", previous_digests=first,
    )[0]
    # memoization must hold in shuffle mode too: no duplicated urls
    assert again.count() == first.count()
    assert again.groupBy("url").count().filter(F.col("count") > 1).count() == 0


def test_auto_strategy_selects_by_unique_count(spark, small_corpus, capsys,
                                               monkeypatch):
    """'auto' picks broadcast when uniques fit and shuffle past the cap —
    and both auto paths produce the same digests as the explicit ones."""
    import hoover_snoop2_spark.plans.pipeline as pl

    pages_path, _ = small_corpus
    monkeypatch.setattr(pl, "_TIMING", True)

    # small corpus → broadcast branch
    auto_small = _run(spark, pages_path, "auto")
    out = capsys.readouterr().out
    assert "→ broadcast" in out

    # cap of 1 → every round overflows → shuffle branch
    auto_shuffle = run_extraction(
        spark, spark.read.parquet(pages_path),
        dedup_strategy="auto", broadcast_max_uniques=1,
    )[0]
    out = capsys.readouterr().out
    assert "→ shuffle" in out

    a = auto_small.select("url", "sha3_256", "text")
    b = auto_shuffle.select("url", "sha3_256", "text")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
