"""Dedup operators: exact, minhash LSH, simhash, embedding cosine."""

import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.operators.dedup import (
    exact_dedup,
    embedding_dups,
    minhash_lsh_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "the old house near the river bend every single morning"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                   # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),         # near dup of 0
        (3, "completely different text about spark query planning and "
            "catalyst optimizer rules for distributed joins at scale with "
            "partitioning strategies and shuffle elimination techniques"),
        (4, "short text"),
        (5, "  The   QUICK brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill and the birds sing in the "
            "garden outside the old house near the river bend every single "
            "morning"),                              # fp-equal to 0 (case/ws)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    got = {r["representative_id"]: r["dup_count"]
           for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert got[0] == 3  # 0, 1, 5 share the normalized fingerprint
    assert got[2] == 1
    assert got[3] == 1


def test_minhash_lsh_finds_near_dups(docs):
    # 8 bands x 2 rows: P(candidate) ≈ 1-(1-j^2)^8 → ~0.997 at j≈0.7
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=16, bands=8,
                               jaccard_threshold=0.5).collect()}
    assert (0, 1) in pairs            # exact dup always caught
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup (1-word change)
    assert not any(3 in p for p in pairs)      # unrelated text never pairs


def test_simhash_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_pairs(docs, "doc_id", "text").collect()}
    assert (0, 1) in pairs
    assert not any(3 in p and (0 in p or 1 in p) for p in pairs)


def test_embedding_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),       # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_dups(df, "vec_id", "embedding", threshold=0.98).collect()}
    assert pairs == {(0, 1)}


def test_minhash_cluster_safe_path(docs):
    """use_local_checkpoint=False (dynamic-allocation clusters) returns the
    same pairs — only the materialization strategy changes."""
    kw = dict(n_hashes=16, bands=8, jaccard_threshold=0.5)
    with_cp = {(r["id_a"], r["id_b"]) for r in
               minhash_lsh_pairs(docs, "doc_id", "text", **kw).collect()}
    without = {(r["id_a"], r["id_b"]) for r in
               minhash_lsh_pairs(docs, "doc_id", "text",
                                 use_local_checkpoint=False, **kw).collect()}
    assert with_cp == without


def test_embedding_dups_no_all_pairs_join(spark, docs):
    """The plan must be a bucket-equi join — no cartesian/nested-loop."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    plan_df = embedding_dups(df, "vec_id", "embedding", dim=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_checkpoint_dir_path(docs, tmp_path):
    """All three materialization strategies (default lineage-recompute,
    block-store localCheckpoint, parquet CheckpointStore) return identical
    pairs; the parquet path leaves snapshots on disk."""
    kw = dict(n_hashes=16, bands=8, jaccard_threshold=0.5)
    default = {(r["id_a"], r["id_b"]) for r in
               minhash_lsh_pairs(docs, "doc_id", "text", **kw).collect()}
    local = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, "doc_id", "text",
                               use_local_checkpoint=True, **kw).collect()}
    cp_dir = str(tmp_path / "mh_ckpt")
    parquet = {(r["id_a"], r["id_b"]) for r in
               minhash_lsh_pairs(docs, "doc_id", "text",
                                 checkpoint_dir=cp_dir, **kw).collect()}
    assert default == local == parquet
    import os
    assert os.path.exists(os.path.join(cp_dir, "minhash_banded"))


def test_simhash_degenerate_bucket_cap(spark):
    """500 identical docs share all four 16-bit block keys; without the
    cap the self-join is quadratic (~125k pairs).  The cap drops the
    degenerate family (exact duplication belongs to exact_dedup) while
    distinct near-dups still pair; the plan shows the semi-join."""
    import io
    from contextlib import redirect_stdout

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(500)]
    rows += [(1000, "completely different text about spark partitions"),
             (1001, "completely different text about spark partitions")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_pairs(df, "doc_id", "text")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    # r6: the cap is a COUNT window over the block key (one exchange
    # serves cap + self-join; no broadcast of a corpus-growing key set)
    assert "Window" in buf.getvalue()
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1000, 1001) in pairs
    assert len(pairs) <= 1 + 500  # no quadratic blow-up from the family
    assert not any(a < 500 and b < 500 for a, b in pairs)


def test_simhash_kernel_pinned_and_batch_invariant():
    """The vectorized kernel (one C hash pass over the flattened batch +
    cumsum segment reduce) must be deterministic across processes and
    independent of batch composition.  Values pinned at the pandas
    SipHash default key; a pin change means the hash function changed
    and every stored simhash must be recomputed."""
    import numpy as np
    import pandas as pd

    from hoover_snoop2_spark.operators.dedup import simhash64_udf

    kern = simhash64_udf.func
    s = kern(pd.Series(
        ["the quick brown fox", "the quick brown fox", "", None, "single"]
    ))
    assert list(s) == [
        -8618537268020226968, -8618537268020226968, 0, 0,
        -2852138774547924146,
    ]
    # batch-composition invariance: same doc alone or with neighbors
    alone = kern(pd.Series(["the quick brown fox"]))[0]
    assert alone == -8618537268020226968
    # identical docs, tokens upper-cased → same hash (lowering)
    assert kern(pd.Series(["THE QUICK Brown fox"]))[0] == alone
    # all-empty batch
    assert list(kern(pd.Series(["", None]))) == [0, 0]


def test_paragraph_window_stats_first_occurrence(spark):
    from hoover_snoop2_spark.operators.dedup import paragraph_window_stats

    # 3-word windows: doc 0 = [A B C][D E F]; doc 1 repeats [A B C] twice
    # and adds a fresh window; doc 2 is entirely doc 0's first window
    rows = [
        (0, "A B C D E F"),
        (1, "A B C A B C X Y Z"),
        (2, "A B C"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.n_paras, r.n_kept)
        for r in paragraph_window_stats(
            df, "doc_id", "text", window_words=3
        ).collect()
    }
    # doc 0 keeps both (first occurrences); doc 1 keeps only [X Y Z];
    # doc 2 keeps nothing
    assert got == {0: (2, 2), 1: (3, 1), 2: (1, 0)}


def test_paragraph_window_stats_partial_tail(spark):
    from hoover_snoop2_spark.operators.dedup import paragraph_window_stats

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "d")], "doc_id long, text string"
    )
    got = {
        r.id: (r.n_paras, r.n_kept)
        for r in paragraph_window_stats(
            df, "doc_id", "text", window_words=3
        ).collect()
    }
    # doc 0: [a b c] + partial [d]; doc 1's whole text equals that tail
    assert got == {0: (2, 2), 1: (1, 0)}


def test_duplicate_spans_islands(spark):
    """Known geometry: a shared 8-word snippet inside two documents
    produces one maximal island each (3 overlapping 6-gram matches
    merge); a second shared snippet adjacent to the first merges into
    it; unique text yields no spans."""
    from hoover_snoop2_spark.operators.dedup import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = spark.createDataFrame(
        [
            # shared snippet at words 3-10 (1-based)
            (1, "u1 u2 " + shared + " v1 v2 v3"),
            # same snippet at words 1-8
            (2, shared + " w1 w2 w3 w4 w5"),
            # all-unique text: no duplicated grams
            (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
        ],
        "doc_id int, text string",
    )
    out = duplicate_spans(docs, "doc_id", "text", k=6, min_docs=2)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    # doc 1: matched 6-gram starts at 3, 4, 5 → island [3, 11), 3 grams
    assert (rows[1]["span_start"], rows[1]["span_end"],
            rows[1]["span_len"], rows[1]["n_grams"]) == (3, 11, 8, 3)
    assert (rows[2]["span_start"], rows[2]["span_end"],
            rows[2]["span_len"], rows[2]["n_grams"]) == (1, 9, 8, 3)


def test_duplicate_spans_adjacent_merge(spark):
    """Two match runs whose intervals touch (end == next start) merge
    into one island; a gap of one word keeps them separate."""
    from hoover_snoop2_spark.operators.dedup import duplicate_spans

    s1 = "a1 a2 a3 a4 a5 a6"          # 6 words: one gram
    s2 = "b1 b2 b3 b4 b5 b6"
    docs = spark.createDataFrame(
        [
            # s1 at 1-6, s2 at 7-12: intervals [1,7) and [7,13) touch
            (1, s1 + " " + s2),
            # s1 at 1-6, gap word, s2 at 8-13: [1,7) and [8,14) split
            (2, s1 + " gap " + s2),
            # partner doc holding both snippets (far apart, own islands)
            (3, s1 + " z1 z2 z3 z4 z5 z6 z7 " + s2),
        ],
        "doc_id int, text string",
    )
    out = duplicate_spans(docs, "doc_id", "text", k=6, min_docs=2)
    spans = {}
    for r in out.collect():
        spans.setdefault(r["id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for v in spans.values():
        v.sort()
    assert spans[1] == [(1, 13)]
    assert spans[2] == [(1, 7), (8, 14)]
    assert spans[3] == [(1, 7), (14, 20)]
