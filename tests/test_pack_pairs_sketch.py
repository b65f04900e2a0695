"""Semantic pins for q125-q128: bitext pairing completeness, sequence-
packing tiling invariants (the two-phase prefix sum must tile windows
with no gaps or overlaps), publication-date precedence, and the HLL
sketch error bound that is q128's correctness contract (approximate ⇒
rows-only at the driver)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_bitext_pairs_complete_and_selective(spark):
    from hoover_snoop2_spark.queries import q125_bitext_pairs

    rows = q125_bitext_pairs(spark, SF_DIR).collect()
    assert rows, "synthesis must produce pairs"
    for r in rows:
        # same slug group: doc_en = 3*slug (+0 mod 3), partner within it
        assert r["doc_en"] % 3 == 0
        assert r["doc_b"] // 3 == r["slug"] == r["doc_en"] // 3
        assert r["lang_b"] in ("fr", "de")
        assert r["host"] == r["slug"] % 23
    # slugs whose English page fell in the doc_id % 11 hole pair nothing
    en_docs = {r["doc_en"] for r in rows}
    assert all(d % 11 != 0 for d in en_docs)


def test_sequence_packing_tiles_exactly(spark):
    """Windows tile the token stream: spans within a window are disjoint,
    sorted, and sum to 2048 for every full window; per-doc spans sum to
    the doc's token count (nothing lost by the bucket decomposition)."""
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.queries import q127_sequence_packing

    rows = q127_sequence_packing(spark, SF_DIR).collect()
    assert rows
    by_win: dict[int, list] = {}
    by_doc: dict[int, int] = {}
    for r in rows:
        assert r["tok_start"] < r["tok_end"]
        by_win.setdefault(r["window_id"], []).append(
            (r["tok_start"], r["tok_end"])
        )
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    last_w = max(by_win)
    for w, spans in by_win.items():
        spans.sort()
        lo, hi = w * 2048, (w + 1) * 2048
        assert spans[0][0] == lo
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2, "gap or overlap inside a window"
        if w != last_w:
            assert spans[-1][1] == hi, "non-final window must be full"
    # per-doc conservation against an independent count
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.col("text"), r"\s+"), lambda w: w != ""
                )
            ).alias("n"),
        ).collect()
        if r["n"] > 0
    }
    assert by_doc == toks


def test_publication_date_precedence(spark):
    """kind 0 pages carry BOTH meta and <time> — meta must win."""
    from hoover_snoop2_spark.queries import q126_publication_date

    rows = {r["doc_id"]: r for r in
            q126_publication_date(spark, SF_DIR).collect()}
    k0 = rows[0]
    assert k0["date_source"] == "meta" and k0["pub_date"].startswith("2023-")
    k1 = rows[1]
    assert k1["date_source"] == "time" and k1["pub_date"].startswith("2024-")
    k2 = rows[2]
    assert k2["date_source"] == "url" and k2["pub_date"].endswith("-01")
    k3 = rows[3]
    assert k3 is not None and k3["pub_date"] == "undated"


def test_hll_sketch_error_bound(spark):
    """HLL++ at the default 5% rsd: every host's approximate distinct-URL
    count within 3*rsd of the exact count (the sketch's contract)."""
    from hoover_snoop2_spark.queries import q128_host_cardinality_sketch

    rows = q128_host_cardinality_sketch(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        exact = r["n_urls_exact"]
        assert exact == r["n_pages"]  # synthesized URLs are unique per doc
        err = abs(r["n_urls_approx"] - exact) / exact
        assert err <= 0.15, f"host {r['host']}: HLL error {err:.3f}"
