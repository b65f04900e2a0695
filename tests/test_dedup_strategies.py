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


def test_same_url_two_payloads_no_cross_contamination(spark, tmp_path):
    """A re-crawled url carrying two different payloads in one round must
    emit one digest per payload, each with ITS OWN content — a url-only
    winner join would analyze both blobs under one blob_key and clone the
    wrong content's subtree (round-2 advice, pipeline.py:197)."""
    import hashlib

    rows = [
        ("http://re.crawl/x", b"<html><body>first crawl body</body></html>"),
        ("http://re.crawl/x", b"<html><body>second crawl body</body></html>"),
        ("http://other/y", b"<html><body>unrelated page</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    p = str(tmp_path / "pages")
    pages.write.parquet(p)
    for strategy in ("broadcast", "shuffle"):
        digests = _run(spark, p, strategy)
        got = {
            (r["url"], r["sha256"], r["text"])
            for r in digests.select("url", "sha256", "text").collect()
        }
        expected = set()
        for url, html in rows:
            text_frag = html.decode().split("<body>")[1].split("</body>")[0]
            expected.add((url, hashlib.sha256(html).hexdigest(), text_frag))
        if strategy == "shuffle":
            # shuffle mode elects ONE representative row per blob; both
            # payloads are distinct blobs, so both digests must exist
            assert {e[1] for e in expected} <= {g[1] for g in got}
        # every emitted digest's text must match its OWN payload's text
        by_hash = {hashlib.sha256(h).hexdigest():
                   h.decode().split("<body>")[1].split("</body>")[0]
                   for _, h in rows}
        for url, sha, text in got:
            assert text == by_hash[sha], (strategy, url, sha)
        # broadcast mode: all three payloads analyzed, no fabricated rows
        assert {g[1] for g in got} == set(by_hash)


def _full_rows(df):
    cols = sorted(df.columns)
    return {tuple(str(r[c]) for c in cols) for r in df.collect()}


def test_none_strategy_agrees(spark, small_corpus):
    """strategy='none' (analyze every row, no election/clone joins) must
    produce the identical digest set to the elected paths on a corpus
    WITH duplicates — the kernel is pure per (url, bytes), so re-analyzing
    a duplicate equals cloning its representative (r6 fast path)."""
    pages_path, golden_path = small_corpus
    a = _run(spark, pages_path, "broadcast")
    b = _run(spark, pages_path, "none")
    assert _full_rows(a) == _full_rows(b)
    golden = spark.read.parquet(golden_path)
    j = golden.alias("g").join(b.alias("d"), "url", "left")
    assert j.filter(
        F.coalesce(F.col("d.text"), F.lit(""))
        != F.coalesce(F.col("g.text"), F.lit(""))
    ).count() == 0


def test_none_strategy_deferred_children(spark, small_corpus, tmp_path):
    """Forced 'none' with a tiny inline cap drives the round>=1 loop (the
    recursion-filter branch that reuses the in-scan JVM hash) — deferred
    children must come out identical to the broadcast election's."""
    pages_path, _ = small_corpus
    a = run_extraction(
        spark, spark.read.parquet(pages_path), dedup_strategy="broadcast",
        checkpoint_dir=str(tmp_path / "ck_b"), inline_max_children=1,
    )[0]
    b = run_extraction(
        spark, spark.read.parquet(pages_path), dedup_strategy="none",
        checkpoint_dir=str(tmp_path / "ck_n"), inline_max_children=1,
    )[0]
    assert _full_rows(a) == _full_rows(b)
    # the cap actually deferred work: children exist at depth >= 1
    assert b.filter(F.col("depth") >= 1).count() > 0


def test_none_strategy_resume(spark, small_corpus):
    """Forced 'none' with previous_digests memoizes via the in-scan hash
    anti-join: same urls, no duplicates."""
    pages_path, _ = small_corpus
    first = _run(spark, pages_path, "none")
    again = run_extraction(
        spark, spark.read.parquet(pages_path),
        dedup_strategy="none", previous_digests=first,
    )[0]
    assert again.count() == first.count()
    assert again.groupBy("url").count().filter(F.col("count") > 1).count() == 0


def test_none_strategy_two_payloads(spark, tmp_path):
    """A re-crawled url carrying two payloads: 'none' analyzes each row on
    its own, so each digest carries its own payload's content."""
    import hashlib

    rows = [
        ("http://re.crawl/x", b"<html><body>first crawl body</body></html>"),
        ("http://re.crawl/x", b"<html><body>second crawl body</body></html>"),
        ("http://other/y", b"<html><body>unrelated page</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    p = str(tmp_path / "pages2")
    pages.write.parquet(p)
    digests = _run(spark, p, "none")
    got = {
        (r["url"], r["sha256"], r["text"])
        for r in digests.select("url", "sha256", "text").collect()
    }
    by_hash = {hashlib.sha256(h).hexdigest():
               h.decode().split("<body>")[1].split("</body>")[0]
               for _, h in rows}
    assert {g[1] for g in got} == set(by_hash)
    for _url, sha, text in got:
        assert text == by_hash[sha]


def test_auto_picks_none_when_dups_rare(spark, tmp_path, capsys, monkeypatch):
    """'auto' skips the election when the measured dup fraction is at or
    below DUP_SKIP_FRAC — and the fast path's digests equal the forced
    election's."""
    import hoover_snoop2_spark.plans.pipeline as pl

    monkeypatch.setattr(pl, "_TIMING", True)
    rows = [(f"http://uniq.example/{i}",
             f"<html><body>unique body {i}</body></html>".encode())
            for i in range(50)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    p = str(tmp_path / "uniq_pages")
    pages.write.parquet(p)

    auto = _run(spark, p, "auto")
    out = capsys.readouterr().out
    assert "→ none" in out
    forced = _run(spark, p, "broadcast")
    assert _full_rows(auto) == _full_rows(forced)


def test_empty_input_all_strategies(spark):
    """Zero-row input must complete under every strategy (the observe
    metrics that drive 'auto' must resolve on an empty write, not stall)."""
    empty = spark.createDataFrame([], "url string, html binary")
    for strat in ("auto", "none", "broadcast", "shuffle"):
        dg = run_extraction(spark, empty, dedup_strategy=strat)[0]
        assert dg.count() == 0, strat


def test_null_html_no_fabricated_clones(spark, tmp_path):
    """A NULL-html row's blob key is NULL under the elected strategies
    (F.sha2(NULL) is NULL) and must STAY null through the kernel: deriving
    sha256(b'') for it would collide root_sha with genuinely-empty blobs
    and make the dup-clone join fabricate extra digest rows (review
    finding, r6 session 2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "url": ["http://a/null", "http://b/empty1", "http://c/empty2"],
        "html": pa.array([None, b"", b""], type=pa.binary()),
    })
    p = str(tmp_path / "null_pages")
    pq.write_table(t, p + ".parquet")
    import os
    os.makedirs(p, exist_ok=True)
    os.replace(p + ".parquet", os.path.join(p, "part-0.parquet"))
    for strategy in ("broadcast", "shuffle", "none"):
        digests = _run(spark, p, strategy)
        rows = digests.select("url").collect()
        urls = sorted(r["url"] for r in rows)
        # one digest per unique (url, payload); never a fabricated clone
        assert len(urls) == len(set(urls)) == 3, (strategy, urls)
