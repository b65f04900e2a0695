"""Semantic pins for the corpus-LM query family (q119-q121): hand-computed
bigram-LM scores, the winnowing guarantee + rightmost tie-break, and a
closed-form collocation lift.  The cross-engine value equality is covered
by the oracle gate (test_quality_queries.test_all_oracles_match); these
tests pin the MATH so an oracle-symmetric bug (same mistake on both
engines) cannot hide."""

from __future__ import annotations

import pytest


def _docs_dir(spark, tmp_path, rows):
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_bigram_lm_hand_computed(spark, tmp_path):
    """V=2 corpus: terms are (c1+V)/(c12+1); doc 0 mixes 1.25 and 1.5."""
    from hoover_snoop2_spark.queries import q119_bigram_lm

    d = _docs_dir(spark, tmp_path, [(0, "a b a b"), (1, "a b")])
    got = {r["doc_id"]: r.asDict() for r in q119_bigram_lm(spark, d).collect()}
    # c12: "a b"->3, "b a"->1; c1: a->3, b->1; V=2
    assert got[0]["n_bigrams"] == 3
    assert got[0]["inv_prob_sum_micro"] == 1250000 + 1500000 + 1250000
    assert got[0]["mean_inv_prob"] == pytest.approx(1.3333)
    assert got[1]["n_bigrams"] == 1
    assert got[1]["mean_inv_prob"] == pytest.approx(1.25)


def test_bigram_lm_short_docs_excluded(spark, tmp_path):
    from hoover_snoop2_spark.queries import q119_bigram_lm

    d = _docs_dir(spark, tmp_path, [(0, "solo"), (1, "two words")])
    assert [r["doc_id"] for r in q119_bigram_lm(spark, d).collect()] == [1]


def test_winnowing_guarantee_shared_run(spark, tmp_path):
    """Any shared run of >= w+k-1 = 6 words must share a fingerprint hash
    (the winnowing theorem), even at different offsets."""
    from hoover_snoop2_spark.queries import q120_winnowing

    shared = "alpha beta gamma delta epsilon zeta"
    d = _docs_dir(
        spark,
        tmp_path,
        [
            (0, f"{shared} one two three"),
            (1, f"nine eight seven six {shared}"),
        ],
    )
    rows = q120_winnowing(spark, d).collect()
    by_doc = {0: set(), 1: set()}
    for r in rows:
        by_doc[r["doc_id"]].add(r["fp_hash"])
    assert by_doc[0] & by_doc[1], "shared 6-word run must share a fingerprint"


def test_winnowing_rightmost_tiebreak(spark, tmp_path):
    """All-identical grams: every window's min ties, the rightmost wins —
    selected positions are exactly {4..m} for m grams, one hash."""
    from hoover_snoop2_spark.queries import q120_winnowing

    d = _docs_dir(spark, tmp_path, [(0, " ".join(["x"] * 9))])  # m = 7 grams
    rows = q120_winnowing(spark, d).collect()
    assert len({r["fp_hash"] for r in rows}) == 1
    assert sorted(r["fp_pos"] for r in rows) == [4, 5, 6, 7]


def test_winnowing_short_doc_single_window(spark, tmp_path):
    """m < w: the frame truncates at the partition end and exactly one
    window (start pos 1) is kept — at least one fingerprint survives."""
    from hoover_snoop2_spark.queries import q120_winnowing

    d = _docs_dir(spark, tmp_path, [(0, "a b c d")])  # m = 2 grams < w = 4
    rows = q120_winnowing(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["fp_pos"] in (1, 2)


def test_collocation_lift_closed_form(spark, tmp_path):
    """'x y' repeated: lift = N*c12/(c1*c2) = 9*5/(5*5) = 1.8; 'y x' has
    support 4 < 5 and is filtered."""
    from hoover_snoop2_spark.queries import q121_collocations

    d = _docs_dir(spark, tmp_path, [(0, " ".join(["x y"] * 5))])
    rows = q121_collocations(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["bg"], r["n_pair"], r["n_left"], r["n_right"]) == ("x y", 5, 5, 5)
    assert r["lift"] == pytest.approx(1.8)
