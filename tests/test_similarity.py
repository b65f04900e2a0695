"""Similarity search: brute-force exactness vs numpy; LSH ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.operators.similarity import ann_lsh_topk, brute_force_topk
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(200, 16)).astype("float32")
    rows = [(i, vecs[i].tolist()) for i in range(200)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def test_brute_force_matches_numpy(vectors):
    df, vecs = vectors
    q = df.filter(F.col("vec_id") < 3)
    got = brute_force_topk(df, q, k=5).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for qi in range(3):
        s = sims[qi].copy()
        s[qi] = -2
        order = np.argsort([(-round(float(s[j]), 4), j) for j in range(200)], axis=0)
        # deterministic expected ranking: (-rounded_sim, id)
        expect = sorted(range(200), key=lambda j: (-round(float(s[j]), 4), j))[:5]
        mine = [r["neighbor_id"] for r in got if r["query_id"] == qi]
        assert mine == expect, qi


def test_ann_lsh_recall(vectors):
    df, _ = vectors
    q = df.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(df, q, k=5).collect()}
    # iid gaussians are LSH's adversarial case (similarities are nearly
    # uniform); 3 planes = 8 buckets keeps candidate sets wide enough.
    # measured: recall 0.8 @ 3 planes, 0.62 @ 4, 0.5 @ 5 on this seed
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ann_lsh_topk(df, q, k=5, n_planes=3, dim=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, recall


def test_ivf_topk_recall(spark):
    """IVF (k-means lists + n_probe search) recall vs the exact baseline;
    train-once centroids path must give identical results."""
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(e, q, k=5).collect()}
    cents = kmeans_centroids(e, n_lists=8, iters=3)
    assert len(cents) == 8 and len(cents[0]) == 64
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_topk(e, q, k=5, n_probe=4, centroids=cents).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall
    # deterministic: same centroids → same result set
    again = {(r["query_id"], r["neighbor_id"])
             for r in ivf_topk(e, q, k=5, n_probe=4, centroids=cents).collect()}
    assert approx == again


def test_auto_planes_grows_with_input():
    from hoover_snoop2_spark.operators.similarity import auto_planes

    ks = [auto_planes(n) for n in (500, 10_000, 1_000_000, 10**9, 10**12)]
    assert ks == sorted(ks)            # monotone in corpus size
    assert ks[0] == 4                  # clamped low for tiny inputs
    assert ks[2] > ks[0]               # 1M rows → more buckets than 500
    assert ks[-1] == 16                # clamped high (add probes instead)
    # mean bucket size stays bounded where unclamped
    assert abs(1_000_000 / 2 ** auto_planes(1_000_000) - 512) < 512


def test_embedding_dups_auto_planes_bucket_count(spark):
    """n_planes=None derives bucket count from input size: bigger corpus
    → more buckets (q26/q32 semantics unchanged — verified by oracle)."""
    from hoover_snoop2_spark.operators.similarity import auto_planes

    assert auto_planes(500) < auto_planes(500_000)


def test_kmeans_sampled_training_recall(spark):
    """sample_fraction trains the quantizer on a subset; IVF recall vs
    exact stays acceptable and search still covers every vector."""
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(e, q, k=5).collect()}
    cents = kmeans_centroids(e, n_lists=8, iters=3, sample_fraction=0.5)
    assert len(cents) == 8
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_topk(e, q, k=5, n_probe=4, centroids=cents).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, recall


def test_ann_multi_table_recall_improves(spark):
    """n_tables is the recall lever: L independent plane sets must find at
    least as many exact neighbors as one table at the same plane count."""
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.operators.similarity import (
        ann_lsh_topk,
        brute_force_topk,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(e, q, k=5).collect()}

    def recall(n_tables):
        approx = {(r["query_id"], r["neighbor_id"])
                  for r in ann_lsh_topk(e, q, k=5, dim=64, n_planes=8,
                                        n_tables=n_tables).collect()}
        return len(exact & approx) / len(exact)

    r1, r3 = recall(1), recall(3)
    # sf0.01 vectors are near-random, so absolute recall at 8 planes is
    # low by construction (top-5 neighbors are ~70 deg away, not near-dups);
    # the property under test is that tables BUY recall: deterministic
    # seeded planes give 0.08 -> 0.24 here, a 3x improvement
    assert r3 > r1, (r1, r3)
    assert r3 >= r1 + 0.05, (r1, r3)
