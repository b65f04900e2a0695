"""ANN recall regression harness (round-3 verdict item 8).

The four approximate paths (LSH, IVF, PQ, IVF-PQ) are rows-only in the
driver gate forever — approximate by nature — so a pinned recall floor
against the exact brute-force baseline is their correctness contract.

Corpus: seeded 20-cluster Gaussian mixture, L2-normalized (cosine and
L2 rank identically, so the PQ paths' ADC metric is comparable).

Two contracts:
- bucketing paths (LSH multi-table, IVF multi-probe) return exact-scored
  candidates → direct recall@10 floor;
- PQ paths score with quantized distances; at 16x compression they
  cannot rank *within* a tight cluster (measured ~0.27@10 — an honest
  property of PQ, not a bug), so their production contract is candidate
  generation: the exact top-10 must appear in the ADC top-100, which the
  caller reranks exactly (the FAISS shape).  Floor pinned on that
  coverage.
"""

import numpy as np
import pytest

from hoover_snoop2_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    ivf_pq_topk,
    ivf_topk,
    pq_topk,
    pq_train,
)

DIM, N, NQ, K = 32, 2000, 20, 10


@pytest.fixture(scope="module")
def ann_corpus(spark):
    rng = np.random.RandomState(77)
    centers = rng.randn(20, DIM) * 3
    pts = np.vstack(
        [c + rng.randn(N // 20, DIM) for c in centers]
    ).astype(float)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(pts)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    qids = list(range(0, N, N // NQ))[:NQ]
    queries = vecs.filter(vecs.vec_id.isin(qids)).cache()
    exact: dict[int, set] = {}
    for r in brute_force_topk(vecs, queries, k=K).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(exact) == NQ
    return vecs, queries, exact


def _recall(exact, df):
    got: dict[int, set] = {}
    for r in df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ) / len(exact)


def test_lsh_recall_floor(ann_corpus):
    vecs, queries, exact = ann_corpus
    r = _recall(exact, ann_lsh_topk(vecs, queries, k=K, n_tables=4))
    assert r >= 0.95, r  # measured 1.0 on this seed


def test_ivf_recall_floor(ann_corpus):
    vecs, queries, exact = ann_corpus
    r = _recall(
        exact, ivf_topk(vecs, queries, k=K, n_lists=16, n_probe=6)
    )
    assert r >= 0.95, r  # measured 1.0


@pytest.fixture(scope="module")
def codebooks(ann_corpus):
    vecs, _, _ = ann_corpus
    return pq_train(vecs, m=8, k_codes=32, iters=5)


def test_pq_candidate_coverage_floor(ann_corpus, codebooks):
    vecs, queries, exact = ann_corpus
    cov = _recall(exact, pq_topk(vecs, queries, codebooks, k=100))
    assert cov >= 0.95, cov  # measured 1.0
    # the direct @10 number is honest-but-low (quantization, not a bug):
    # assert it stays above a coarse floor so a regression to ~0 is caught
    direct = _recall(exact, pq_topk(vecs, queries, codebooks, k=K))
    assert direct >= 0.15, direct  # measured 0.265


def test_ivf_pq_candidate_coverage_floor(ann_corpus, codebooks):
    vecs, queries, exact = ann_corpus
    cov = _recall(
        exact,
        ivf_pq_topk(
            vecs, queries, codebooks, k=100, n_lists=16, n_probe=6
        ),
    )
    assert cov >= 0.95, cov  # measured 1.0
