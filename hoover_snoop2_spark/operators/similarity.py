"""Similarity search over an embedding column (`array<float>`).

Two paths:

- ``brute_force_topk`` — exact cosine top-k: cross join (queries broadcast)
  + window rank.  The correctness baseline and the oracle-checkable one
  (DuckDB ``list_cosine_similarity``).
- ``ann_lsh_topk`` — sign-random-projection LSH: both sides hashed into
  2^n_planes buckets with multi-probe (hamming-1 neighbors of the query
  bucket); candidates scored exactly.  The 100-TB path: the big side is
  shuffled once on bucket id, each query probes a handful of buckets.

Dot products stay JVM-side via ``zip_with`` + ``aggregate`` higher-order
functions — no Python round trip.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# r6 optimization: known-dimension dot/norm/cosine unroll.
#
# ``aggregate(zip_with(...))`` higher-order functions are evaluated
# INTERPRETED per element (no whole-stage codegen; a lambda closure per
# array slot), which made the pairwise-cosine joins the slowest headline
# plans.  When the dimension is statically known, the same left-to-right
# IEEE fold — ``((0.0 + a[0]*b[0]) + a[1]*b[1]) + ...``, bit-identical to
# the aggregate's ``acc + x`` fold by construction — is emitted as one
# flat SQL expression that whole-stage codegen compiles.  Expressions are
# built as SQL strings (one parse) instead of 64 chained Column ops
# (64 py4j round-trips per expression).
# ---------------------------------------------------------------------------


def _dot_sql(a: str, b: str, dim: int) -> str:
    """Unrolled dot product, same fold order as aggregate(zip_with(..))."""
    terms = " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def _norm_sq_sql(a: str, dim: int) -> str:
    terms = " + ".join(f"{a}[{i}] * {a}[{i}]" for i in range(dim))
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def _dot(a: str | F.Column, b: str | F.Column,
         dim: int | None = None) -> F.Column:
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b, dim))
    return F.aggregate(
        F.zip_with(F.col(a) if isinstance(a, str) else a,
                   F.col(b) if isinstance(b, str) else b,
                   lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str, dim: int | None = None) -> F.Column:
    if dim is not None:
        return F.expr(f"SQRT({_norm_sq_sql(a, dim)})")
    return F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: str, b: str, dim: int | None = None) -> F.Column:
    """cosine(a, b) as a pure column expression (doubles).

    Pass ``dim`` when statically known for the codegen'd unrolled form —
    bit-identical to the HOF fold (same op order), ~10x faster per row."""
    if dim is not None:
        return F.expr(
            f"({_dot_sql(a, b, dim)}) / "
            f"(SQRT({_norm_sq_sql(a, dim)}) * SQRT({_norm_sq_sql(b, dim)}))"
        )
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self).

    queries is expected small → broadcast; ranking is deterministic:
    (rounded cosine desc, neighbor id asc), so results are reproducible
    across engines/float orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "nv", dim), 4))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_literals(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).round(6).tolist()


def auto_planes(n_rows: int, target_bucket: int = 512,
                lo: int = 4, hi: int = 16) -> int:
    """Size-driven plane count: pick k so the mean LSH bucket holds about
    ``target_bucket`` vectors (2^k ≈ n/target).  A fixed k is a scale
    hazard both ways — too few planes at 10⁹ rows makes the within-bucket
    join quadratic; too many at 10⁴ rows leaves buckets of one.  Clamped to
    [lo, hi]: recall of hamming-1 multi-probe degrades as k grows (a pair
    may disagree on 2+ planes), so past ``hi`` add probes or tables instead
    of planes."""
    import math

    return max(lo, min(hi, int(round(math.log2(max(1.0, n_rows / target_bucket))))))


def _dlit(x: float) -> str:
    """Exact double literal (17-sig-digit scientific form always parses
    as DOUBLE and round-trips the bits)."""
    return f"{float(x):.17E}"


def bucket_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-projection bucket id: bit i = (v . plane_i) > 0.

    Deliberately kept as the compact HOF fold (r6): an unrolled
    dim×n_planes spelling was measured SLOWER end-to-end — the bucket
    expression is duplicated across the multi-probe fan-out, and the
    resulting flat trees cost more in Catalyst planning/AQE
    re-optimization than the interpreted fold costs at execution."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(F.col(vec_col).cast("array<double>"), F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


#: unrolled score arrays above this many total terms are a planning
#: hazard: the flat trees get duplicated by array_position(array_max)
#: consumers and push Catalyst canonicalization / AQE re-optimization
#: into seconds (measured: 64-dim x 16 centroids took q28 from 9 s to
#: 38 s), while small trees (16-dim x 16 codes) are a clear win (q47
#: 31 s -> 11 s).  512 terms keeps the win and avoids the cliff.
_UNROLL_MAX_TERMS = 512


def _centroid_scores(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """array of cosine(vec, centroid_i) — pure JVM expressions.

    Unrolled (codegen-friendly, bit-identical fold) when the total term
    count is small; the compact HOF fold otherwise (see
    _UNROLL_MAX_TERMS)."""
    import math

    if len(centroids) * len(centroids[0]) <= _UNROLL_MAX_TERMS:
        vn = f"SQRT({_norm_sq_sql(vec_col, len(centroids[0]))})"
        scores = []
        for c in centroids:
            dot = " + ".join(
                f"{vec_col}[{j}] * {_dlit(x)}" for j, x in enumerate(c)
            )
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            scores.append(
                f"(CAST(0.0 AS DOUBLE) + {dot}) / ({vn} * {_dlit(cn)})"
            )
        return F.expr(f"ARRAY({', '.join(scores)})")
    v = F.col(vec_col)
    vn = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    scores = []
    for c in centroids:
        lit = F.array(*[F.lit(x) for x in c])
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        scores.append(_dot(v, lit) / (vn * F.lit(cn)))
    return F.array(*scores)


def _l2sq_scores(vec, centroids: list[list[float]]) -> F.Column:
    """array of squared-L2 distance(vec, centroid_i) — pure JVM.

    Unrolled when ``vec`` is a plain column name and the total term
    count is below _UNROLL_MAX_TERMS; Column expressions (e.g.
    subvector slices) and large codebooks keep the HOF form — identical
    values either way (same per-element (a-b)*(a-b) and fold order)."""
    if (isinstance(vec, str)
            and len(centroids) * len(centroids[0]) <= _UNROLL_MAX_TERMS):
        dists = []
        for c in centroids:
            terms = " + ".join(
                f"({vec}[{j}] - {_dlit(x)}) * ({vec}[{j}] - {_dlit(x)})"
                for j, x in enumerate(c)
            )
            dists.append(f"(CAST(0.0 AS DOUBLE) + {terms})")
        return F.expr(f"ARRAY({', '.join(dists)})")
    v = vec
    dists = []
    for c in centroids:
        lit = F.array(*[F.lit(float(x)) for x in c])
        dists.append(
            F.aggregate(
                F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*dists)


def kmeans_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    iters: int = 5,
    sample_fraction: float | None = None,
    seed: int = 42,
    metric: str = "cosine",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over a DataFrame (cosine or
    squared-L2 assignment, element-wise-mean update).  Per iteration: one broadcast of k·dim
    centroid literals out, one (cluster, position) shuffle back — the
    classic Spark iterative-ML loop; vectors never collect to the driver
    (only the k centroids do, which is the whole point of a coarse
    quantizer).

    ``sample_fraction`` trains the quantizer on a deterministic-seed
    sample: at corpus scale each iteration posexplodes n·dim rows, and a
    coarse k-list quantizer converges on a few hundred k samples — pass
    e.g. ``min(1.0, 200*n_lists/n)`` instead of sweeping 10¹² vectors per
    iteration.  Search (ivf_topk) still covers the FULL vector set; only
    training samples."""
    if sample_fraction is not None and sample_fraction < 1.0:
        vectors = vectors.sample(fraction=sample_fraction, seed=seed)
    v = vectors.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("v"))
    # deterministic init: the k lowest-id vectors
    centroids = [r["v"] for r in v.orderBy("id").limit(n_lists).collect()]
    if metric not in ("cosine", "l2"):
        raise ValueError(metric)
    for _ in range(iters):
        if metric == "cosine":
            scores = _centroid_scores("v", centroids)
            best = F.array_position(scores, F.array_max(scores))
        else:
            dists = _l2sq_scores("v", centroids)
            best = F.array_position(dists, F.array_min(dists))
        assigned = v.withColumn("cluster", best.cast("int") - 1)
        new = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()
        )
        by_cluster = {r["cluster"]: r["centroid"] for r in new}
        centroids = [
            by_cluster.get(i, centroids[i]) for i in range(n_lists)
        ]
    return [[round(x, 6) for x in c] for c in centroids]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: a k-means coarse quantizer partitions the
    corpus into ``n_lists`` inverted lists; each query probes its
    ``n_probe`` nearest lists and scores candidates exactly.

    The scale shape mirrors ann_lsh_topk: the big side is assigned +
    shuffled ONCE on cluster id (in production: written bucketed by
    cluster, making every later search a pruned scan); queries explode to
    n_probe rows and the join is cluster-equi.  Pass precomputed
    ``centroids`` to skip training (the train-once / search-many split).
    """
    if centroids is None:
        centroids = kmeans_centroids(vectors, id_col, vec_col, n_lists, iters)
    n_lists = len(centroids)
    n_probe = min(n_probe, n_lists)

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    v = v.withColumn(
        "cluster",
        F.array_position(
            _centroid_scores("nv", centroids),
            F.array_max(_centroid_scores("nv", centroids)),
        ).cast("int") - 1,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    # top n_probe clusters per query: sort (score, idx) structs descending
    scored = F.transform(
        _centroid_scores("qv", centroids),
        lambda s, i: F.struct(s.alias("score"), i.alias("idx")),
    )
    probes = q.withColumn(
        "cluster",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(scored)), 1, n_probe),
                lambda s: s["idx"].cast("int"),
            )
        ),
    )
    cand = (
        v.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "nv", len(centroids[0])), 4))
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int | None = None,
    dim: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket and
    its hamming-1 neighbor buckets (multi-probe), then exact cosine.

    At scale: ``vectors`` is hashed and shuffled ONCE on (table, bucket);
    each query expands to n_tables·(n_planes+1) probe rows — the join is
    bucket-equi, no cross product.  ``n_planes=None`` (default) derives
    the plane count from the big side's row count (auto_planes) — the
    count against ``vectors`` is parquet-metadata cheap and keeps the mean
    bucket bounded as the corpus grows instead of freezing at 64 buckets.

    ``n_tables`` is the recall lever past auto_planes' high clamp: L
    independent plane sets raise candidate recall to 1-(1-p)^L at the
    cost of hashing the big side L times (rows ×L through the one
    shuffle).  Prefer more tables over fewer planes when buckets are
    already small — fewer planes fattens every bucket, more tables only
    multiplies the (cheap) hash rows.
    """
    if dim is None:
        # infer from the QUERY side — always dimension-sized; inferring
        # from `vectors` would run a hidden action against the 100-TB side
        first = queries.select(F.size(vec_col)).first()
        dim = first[0]
    if n_planes is None:
        n_planes = auto_planes(vectors.count())
    tables = [
        _plane_literals(dim, n_planes, seed=42 + 7 * t)
        for t in range(max(1, n_tables))
    ]

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    bucket_expr(vec_col, planes).alias("bucket"),
                )
                for t, planes in enumerate(tables)
            ])
        ).alias("tb"),
    ).select("neighbor_id", "nv", "tb.tbl", "tb.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        *[
            bucket_expr(vec_col, planes).alias(f"qb_{t}")
            for t, planes in enumerate(tables)
        ],
    )
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), b.alias("bucket"))
                for t in range(len(tables))
                for b in (
                    F.col(f"qb_{t}"),
                    *[
                        F.col(f"qb_{t}").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_planes)
                    ],
                )
            ])
        ).alias("tb"),
    ).select("query_id", "qv", "tb.tbl", "tb.bucket")
    scored = (
        v.join(F.broadcast(probes), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "nv", dim), 4))
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011): split each vector into m subvectors,
# vector-quantize each subspace with its own k-code codebook, store m
# uint8-sized codes per vector (e.g. 64-dim float32 → 4 bytes), and score
# with asymmetric distance (ADC): per query, one m×k lookup table of exact
# subspace distances, then each candidate costs m table lookups.  This is
# the memory-scale path — 10^12 vectors × 4 code bytes fit where raw
# floats cannot — and composes with IVF (probe lists, then ADC-score only
# the probed candidates: IVF-PQ).
# ---------------------------------------------------------------------------


def pq_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k_codes: int = 16,
    iters: int = 4,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Per-subspace codebooks (m × k_codes × dim/m) via L2 k-means on
    each subvector slice.  The codebooks are tiny (m·k·dim/m = k·dim
    floats total) and train on a sample at corpus scale; dim must divide
    evenly by m."""
    first = vectors.select(F.col(vec_col).alias("v")).first()
    if first is None:
        raise ValueError("pq_train: empty vector table")
    dim = len(first["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    codebooks = []
    for j in range(m):
        sub = vectors.select(
            F.col(id_col).alias("id"),
            F.slice(
                F.col(vec_col).cast("array<double>"), j * sub_d + 1, sub_d
            ).alias("sv"),
        )
        codebooks.append(
            kmeans_centroids(
                sub, "id", "sv", n_lists=k_codes, iters=iters,
                sample_fraction=sample_fraction, metric="l2",
            )
        )
    return codebooks


def _pq_codes_expr(vec, codebooks: list[list[list[float]]]) -> F.Column:
    """array<int> of per-subspace nearest-code indices — pure JVM."""
    v = F.col(vec) if isinstance(vec, str) else vec
    sub_d = len(codebooks[0][0])
    codes = []
    for j, cb in enumerate(codebooks):
        sv = F.slice(v, j * sub_d + 1, sub_d)
        d = _l2sq_scores(sv, cb)
        codes.append((F.array_position(d, F.array_min(d)) - 1).cast("int"))
    return F.array(*codes)


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the compressed corpus representation.
    Persist this once (bucketed with the IVF cluster id in production);
    searches never touch the raw floats again."""
    return vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _pq_codes_expr(
            F.col(vec_col).cast("array<double>"), codebooks
        ).alias("codes"),
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dist, rank) — rank 1 is the
    NEAREST (smallest squared-L2 estimate).

    The corpus side is the codes table (pass precomputed ``codes`` for
    the encode-once/search-many split); each query carries m lookup-table
    array columns of exact subspace distances, broadcast with the query
    batch, and every candidate costs m ``element_at`` lookups — all JVM
    expressions, no Python in the scan.  A full linear ADC scan over the
    codes is the classic PQ baseline; prune with ivf_topk's cluster
    assignment first for IVF-PQ.
    """
    if codes is None:
        codes = pq_encode(vectors, codebooks, id_col, vec_col)
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    for j, cb in enumerate(codebooks):
        q = q.withColumn(f"lut_{j}", _l2sq_scores(F.slice("qv", j * sub_d + 1, sub_d), cb))
    q = q.drop("qv")

    adc = None
    for j in range(m):
        term = F.element_at(
            F.col(f"lut_{j}"), F.element_at(F.col("codes"), j + 1) + 1
        )
        adc = term if adc is None else adc + term
    cand = (
        codes.crossJoin(F.broadcast(q))
        .filter(
            F.col("neighbor_id").cast("string")
            != F.col("query_id").cast("string")
        )
        .withColumn("adc_dist", F.round(adc, 4))
        .select("query_id", "neighbor_id", "adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    centroids: list[list[float]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ (the FAISS production shape): an IVF coarse quantizer prunes
    the corpus to each query's ``n_probe`` nearest inverted lists, and PQ
    asymmetric distance scores only those candidates — a pruned ADC scan
    instead of pq_topk's full linear one.

    Corpus-side state is (id, cluster, codes): assigned + encoded ONCE
    (pass precomputed ``codes`` carrying a ``cluster`` column for the
    index-build/search split; in production this table is written
    bucketed by cluster).  Queries broadcast with their m LUT arrays and
    probe clusters; the join is cluster-equi — no cross join survives.
    """
    if centroids is None:
        centroids = kmeans_centroids(
            vectors, id_col, vec_col, n_lists, iters, metric="l2"
        )
    n_lists = len(centroids)
    n_probe = min(n_probe, n_lists)
    m = len(codebooks)
    sub_d = len(codebooks[0][0])

    if codes is None:
        v = vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("nv"),
        )
        d = _l2sq_scores("nv", centroids)
        codes = v.select(
            "neighbor_id",
            (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("cluster"),
            _pq_codes_expr(F.col("nv"), codebooks).alias("codes"),
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    qd = _l2sq_scores("qv", centroids)
    probe_structs = F.transform(
        qd, lambda dist, i: F.struct(dist.alias("dist"), i.alias("idx"))
    )
    q = q.withColumn(
        "cluster",
        F.explode(
            F.transform(
                F.slice(F.array_sort(probe_structs), 1, n_probe),
                lambda s: s["idx"].cast("int"),
            )
        ),
    )
    for j, cb in enumerate(codebooks):
        q = q.withColumn(
            f"lut_{j}", _l2sq_scores(F.slice("qv", j * sub_d + 1, sub_d), cb)
        )
    q = q.drop("qv")

    adc = None
    for j in range(m):
        term = F.element_at(
            F.col(f"lut_{j}"), F.element_at(F.col("codes"), j + 1) + 1
        )
        adc = term if adc is None else adc + term
    cand = (
        codes.join(F.broadcast(q), "cluster")
        .filter(
            F.col("neighbor_id").cast("string")
            != F.col("query_id").cast("string")
        )
        .withColumn("adc_dist", F.round(adc, 4))
        .select("query_id", "neighbor_id", "adc_dist")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )
