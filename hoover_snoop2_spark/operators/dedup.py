"""Deduplication operators for web-scale corpora.

The reference de-duplicates *exactly* by content hash (Blob PK = sha3_256,
models.py:102-113); at training-data scale we additionally need near-dup
families.  Five operators, all returning DataFrames (no driver loops):

- exact_dedup          — hash-groupBy (JVM-only, oracle-checkable)
- minhash_lsh_pairs    — shingle → minhash signature → banded LSH →
                         candidate pairs → exact Jaccard verify
- simhash              — 64-bit simhash per doc + near-dup pairs by
                         Hamming distance (bit tricks, vectorized UDF)
- ngram_jaccard_pairs  — exact n-gram Jaccard over LSH candidates
- embedding_dups       — cosine-similarity near-dups over embeddings

Scale notes: minhash/LSH stays entirely JVM-side (higher-order functions +
xxhash64), so the shuffle per band is the only heavy op; band keys are
integer hashes — small rows.  The candidate self-join is an equi-join on
band_key which AQE handles for skewed buckets (identical boilerplate pages
→ giant buckets → AQE skew split).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
# 31-bit Mersenne prime: (p-1)^2 < 2^63, so a*h + b never overflows a long
# even under Spark's ANSI arithmetic
_MERSENNE = (1 << 31) - 1


def _perm_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, _MERSENNE - 1)) | 1, int(rng.randint(0, _MERSENNE - 1)))
        for _ in range(n_hashes)
    ]


def shingles_col(text_col: str, k: int = 5) -> F.Column:
    """Word k-gram shingle array, built with higher-order functions —
    no Python, no explode."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    return F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        )
    )


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      n_hashes: int = 16, k: int = 5) -> DataFrame:
    """id + minhash signature array<long>, all JVM-side."""
    params = _perm_params(n_hashes)
    hashes = F.transform(
        shingles_col(text_col, k),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)),
    )
    # two projections: the shingle+hash chain lands in a real column first
    # so the n_hashes permutation expressions reference the column instead
    # of inlining (and recomputing) the whole chain n_hashes times
    hashed = df.select(F.col(id_col).alias("id"), hashes.alias("hv"))

    def perm(a: int, b: int):
        # pyspark inspects lambda arity — bind (a, b) via an outer closure
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))

    sig = F.array(
        *[F.array_min(F.transform(F.col("hv"), perm(a, b))) for a, b in params]
    )
    return hashed.select("id", sig.alias("signature"))


def band_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    with_shingles: bool = False,
) -> DataFrame:
    """(id, band, band_hash[, sh]) LSH band keys — pure column
    expressions, so the same code paths batch tables AND streaming
    DataFrames (the stream-static near-dup join in
    streaming/dedup_stream.py).

    with_shingles=True carries the distinct shingle set through the
    projection chain so callers that need (keys + shingles) get them in
    ONE projection of df.  This matters for streams: joining two
    projections of the same streaming DataFrame plans a stateful
    stream-stream self-join with unbounded state; a single projection
    keeps only the stream-static join.  The signature is unchanged by
    hashing the distinct array (array_min ignores duplicates)."""
    rows = n_hashes // bands
    if with_shingles:
        params = _perm_params(n_hashes)
        shing = F.array_distinct(shingles_col(text_col, k))
        base = df.select(F.col(id_col).alias("id"), shing.alias("sh"))
        hashes = F.transform(
            F.col("sh"),
            lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)),
        )
        hashed = base.select("id", "sh", hashes.alias("hv"))

        def perm(a: int, b: int):
            return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE))

        sig = F.array(
            *[
                F.array_min(F.transform(F.col("hv"), perm(a, b)))
                for a, b in params
            ]
        )
        sigs = hashed.select("id", "sh", sig.alias("signature"))
        carry = ["id", "sh"]
    else:
        sigs = minhash_signature(df, id_col, text_col, n_hashes, k)
        carry = ["id"]
    return sigs.select(
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("signature")[b * rows + r].cast("string")
                                    for r in range(rows)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(*carry, "bk.band", "bk.band_hash")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    jaccard_threshold: float = 0.7,
    use_local_checkpoint: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard >= threshold).

    banding: signature split into ``bands`` bands of ``n_hashes/bands``
    rows; docs sharing any band-hash are candidates; candidates verified
    with exact shingle Jaccard (array_intersect/array_union sizes).

    Materialization of the small multi-consumer intermediates (band keys,
    candidate ids), cluster-safe by DEFAULT — the default plan has no
    block-store dependencies:

    - ``checkpoint_dir`` routes them through plans.checkpoint.
      CheckpointStore (parquet/Iceberg-style snapshots) — survives executor
      loss and dynamic allocation; the right choice on a cluster.
    - ``use_local_checkpoint=True`` uses block-store localCheckpoint —
      fastest on a single node / static cluster, but the blocks die with
      their executor.
    - neither: the lineage recomputes per consumer (correct, ~2x the
      signature work) — fine for one-shot jobs.
    """
    from ..plans.skew import ensure_parallelism

    # the shingle/signature chain is CPU-bound: a narrow scan (one split
    # for a small parquet) serializes it — widen first (measured 3.3x)
    df = ensure_parallelism(df)
    banded = band_keys(df, id_col, text_col, n_hashes, bands, k)
    # the signature chain (shingles → 16 permutations) is the expensive
    # part and feeds five downstream consumers — materialize the tiny
    # (id, band, hash) table once instead of re-deriving it per consumer
    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)
    if use_local_checkpoint:
        # lazy (eager=False, r6): the block store still materializes
        # exactly once — at the first consumer — but the synchronous
        # per-checkpoint job barrier disappears; measured ~0.3 s/query
        # at sf0.1 with identical lineage truncation
        banded = banded.localCheckpoint(eager=False)
    elif _cp is not None:
        banded = _cp.write(banded, "minhash_banded")

    # degenerate buckets (near-identical boilerplate at web scale) would
    # make the self-join quadratic; cap them and surface the cap in the
    # plan rather than silently churning.  A capped bucket's members are
    # still paired through their other, finer bands.
    #
    # r6: the cap is a COUNT window over the bucket key instead of the
    # former broadcast semi-join against the small-bucket key set.  Same
    # filter, two wins: (a) the window's exchange partitions banded by
    # (band, band_hash) — exactly the self-join's key — so Catalyst
    # reuses one exchange for cap + join and the broadcast-build job
    # barrier disappears; (b) at corpus scale the surviving-bucket key
    # set grows with the corpus (≈ n/bucket_size keys), so broadcasting
    # it was itself a scale hazard; banded rows are ~24 B of integers,
    # the cheapest thing in the plan to shuffle once.
    MAX_BUCKET = 200
    from pyspark.sql import Window

    w = Window.partitionBy("band", "band_hash")
    capped = (
        banded.withColumn("_bn", F.count("*").over(w))
        .filter(F.col("_bn") <= MAX_BUCKET)
        .drop("_bn")
    )
    cand = (
        capped.alias("l")
        .join(capped.alias("r"), ["band", "band_hash"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    if use_local_checkpoint:
        cand = cand.localCheckpoint(eager=False)
    elif _cp is not None:
        cand = _cp.write(cand, "minhash_cand")

    # exact-Jaccard verify ONLY over candidate ids: shingle arrays are the
    # heaviest intermediate (10-100 KB/doc), so they are filtered down to
    # candidates first and joined WITHOUT a forced broadcast — AQE picks
    # broadcast when the candidate set is small and degrades gracefully to
    # a shuffle join when near-dup families are large (10⁵+ candidates ×
    # 10-100 KB shingle arrays would OOM a forced broadcast)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        df.select(F.col(id_col).alias("id"), shingles_col(text_col, k).alias("sh"))
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .withColumn("sh", F.array_distinct("sh"))
    )
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content fingerprint: one representative (min id) per
    group + duplicate count.  The Blob-PK dedup of the reference
    (models.py:102-113) as a groupBy."""
    from ..functions.quality import fingerprint

    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count("*").alias("dup_count"),
        )
    )


@F.pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit simhash over whitespace tokens — batch-vectorized.

    Two earlier kernels lost: a per-token Python ``hashlib.blake2b``
    loop (pure-Python inner loop, the slowest kernel per byte in the
    dedup stack), and a JVM higher-order-function rewrite
    (aggregate + 64-wide zip_with allocates a fresh 64-int array per
    token — measured ~20x SLOWER than the Python loop at sf0.1).  This
    version flattens ALL tokens of the Arrow batch into one object
    array, hashes them in a single C pass (``pd.util.hash_array`` —
    SipHash with pandas' fixed default key, deterministic across
    processes), and segment-reduces the per-bit votes by document via
    cumsum-at-boundaries (robust to zero-token docs, unlike
    ``np.add.reduceat``).  Bit i is set when strictly more than half the
    tokens have bit i set; null/blank text hashes to 0.
    """
    n = len(texts)
    toks = texts.fillna("").str.lower().str.split()
    lengths = toks.str.len().to_numpy(dtype=np.int64)
    flat = [t for doc in toks for t in doc]
    if not flat:
        return pd.Series(np.zeros(n, dtype=np.int64))
    hs = pd.util.hash_array(np.asarray(flat, dtype=object)).astype(np.uint64)
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=bounds[1:])
    starts, ends = bounds[:-1], bounds[1:]
    sim = np.zeros(n, dtype=np.uint64)
    csum = np.empty(len(hs) + 1, dtype=np.int64)
    csum[0] = 0
    for b in range(64):
        bit = ((hs >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        np.cumsum(bit, out=csum[1:])
        votes = csum[ends] - csum[starts]
        sim |= (votes * 2 > lengths).astype(np.uint64) << np.uint64(b)
    return pd.Series(sim.view(np.int64))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, using 4x16-bit block
    LSH (two equal blocks guarantee recall at distance<=3 is high; exact
    verify via bit_count on xor).

    Degenerate block buckets (identical boilerplate / empty-ish texts
    share all four 16-bit keys) would make the self-join quadratic in the
    family size; buckets above ``max_bucket`` are dropped via the same
    semi-join cap as minhash.  Unlike minhash there is no finer band to
    catch a capped family's pairs — but a family that big is EXACT
    duplication, which belongs to exact_dedup (run it first); the cap
    guards the stage, it doesn't replace exact dedup."""
    from ..plans.skew import ensure_parallelism

    sims = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), simhash64_udf(F.col(text_col)).alias("sim")
    )
    blocks = sims.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("sim", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("kb"),
    ).select("id", "sim", "kb.blk", "kb.key")
    # r6: COUNT-window cap on the block key (same filter as the former
    # broadcast semi-join; the window's exchange is the self-join's own
    # partitioning, so one exchange serves both, and no broadcast of a
    # corpus-growing key set — see minhash_lsh_pairs)
    from pyspark.sql import Window

    w = Window.partitionBy("blk", "key")
    blocks = (
        blocks.withColumn("_bn", F.count("*").over(w))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )
    cand = (
        blocks.alias("l")
        .join(blocks.alias("r"), ["blk", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sim").alias("sim_a"),
            F.col("r.sim").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.98,
    n_planes: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dups, LSH-bucketed — no all-pairs join.

    Each vector lands in its sign-projection bucket; one side additionally
    probes its hamming-1 neighbor buckets, so any pair whose bucket ids
    differ in <=1 bit meets exactly once per shared probe.  Near-dup pairs
    (cosine >= 0.98 → angle <= 11°) disagree on a plane with prob ~θ/π, so
    recall at hamming<=1 is high and tunable via ``n_planes``.  Cost: one
    shuffle of (id, vec, bucket) rows on bucket id — O(n·(n_planes+1))
    rows, never O(n²).
    """
    from .similarity import _plane_literals, auto_planes, bucket_expr, cosine_expr

    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    if n_planes is None:
        # size-driven default: the within-bucket pair join is quadratic in
        # mean bucket size, so a frozen 64-bucket layout explodes at 10^9
        # vectors; the count action is parquet-metadata cheap
        n_planes = auto_planes(df.count())
    planes = _plane_literals(dim, n_planes)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        bucket_expr(vec_col, planes).alias("home"),
    )
    probes = base.select(
        F.col("id"),
        F.col("v"),
        F.explode(
            F.array(
                F.col("home"),
                *[F.col("home").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
        ).alias("bucket"),
    )
    # bucket-equi join; cosine + threshold filter run BEFORE the distinct,
    # so only surviving near-dup pairs (tiny) reach the dedup shuffle
    return (
        base.alias("l")
        .join(probes.alias("r"), F.col("l.home") == F.col("r.bucket"))
        .filter(F.col("l.id") < F.col("r.id"))
        .withColumn("cosine", F.round(cosine_expr("l.v", "r.v", dim), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def drop_common_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 5,
    sep: str = "\n\n",
) -> DataFrame:
    """CCNet-style cross-corpus boilerplate removal: a paragraph whose
    normalized form appears in >= ``min_docs`` DISTINCT documents is
    dropped from every document (cookie banners, nav footers, subscribe
    prompts); survivors are reassembled in original order.

    Returns (id, clean_text) — documents whose every paragraph was common
    are absent (callers left-join and coalesce '').

    Scale shape: one explode, one groupBy on the normalized paragraph
    (map-side partial count), one anti-join (the common set is the
    boilerplate vocabulary — small, AQE broadcasts it from stats; no
    forced hint so a degenerate corpus degrades to a shuffle join), one
    groupBy rebuild.  All JVM-side; paragraphs are keyed by their
    normalized STRING (not a hash) so a hash collision can never merge
    two distinct paragraphs.
    """
    from ..plans.skew import ensure_parallelism

    paras = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn("pkey", F.lower(F.trim(F.col("para"))))
    common = (
        paras.groupBy("pkey")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("pkey")
    )
    kept = paras.join(common, "pkey", "left_anti")
    return kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text")
    )


def paragraph_window_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_words: int = 12,
) -> DataFrame:
    """Global first-occurrence paragraph dedup statistics (the
    Lee-et-al. "Deduplicating Training Data Makes Language Models
    Better" exact-substring idea at paragraph granularity, CCNet's
    per-paragraph variant): every document is cut into fixed
    ``window_words``-word paragraphs; a paragraph is KEPT only in the
    globally first position it appears (ordered by (doc, position)),
    and every later copy anywhere in the corpus is a drop.

    Returns (id, n_paras, n_kept) — ``n_paras - n_kept`` is the
    per-document duplicate mass a training pipeline would cut.

    Scale shape: one explode, one groupBy on the paragraph STRING (not
    a hash — a collision must never merge distinct paragraphs; at
    petabyte scale swap in a 128-bit fingerprint and accept the 2^-64
    risk), one join back on the same key (co-partitioned with the
    groupBy so AQE reuses the exchange), one final groupBy on the id.
    The first-occurrence election is a map-side-combinable MIN of the
    (doc, position) rank — no Window, no skew pile-up on hot
    boilerplate paragraphs.
    """
    words = F.split(F.col(text_col), " ")
    n_paras_col = F.ceil(F.size(words) / F.lit(window_words)).cast("int")
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_paras_col - 1),
                lambda i: F.array_join(
                    F.slice(words, i * window_words + 1, window_words), " "
                ),
            )
        ).alias("idx", "para"),
    )
    rank = (F.col("id") * F.lit(1_000_000) + F.col("idx")).alias("rank")
    ranked = paras.select("id", "para", rank)
    firsts = ranked.groupBy("para").agg(F.min("rank").alias("first_rank"))
    return (
        ranked.join(firsts, "para")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(
                (F.col("rank") == F.col("first_rank")).cast("long")
            ).alias("n_kept"),
        )
    )


def duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 6,
                    min_docs: int = 2) -> DataFrame:
    """Maximal duplicated-substring spans per document (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    ExactSubstr shape, re-expressed relationally instead of via a suffix
    array).  A word ``k``-gram occurring in >= ``min_docs`` distinct
    documents marks the interval ``[pos, pos+k)`` as duplicated; per
    document, overlapping or adjacent intervals merge into maximal
    islands (the SQL gaps-and-islands pattern).  The reference dedups
    whole blobs only (sha3_256 PK, models.py:102-113); span-level dedup
    is the corpus-hygiene extension a training pipeline needs.

    Returns (id, span_start, span_end, span_len, n_grams), 1-based word
    positions, end exclusive.

    Scale: gram building is JVM higher-order functions (no Python); the
    duplicated-gram filter is one groupBy on the gram string with an
    early count-distinct; the join back is the same key so AQE reuses
    the exchange; island assignment is two windows partitioned by doc —
    per-doc data is bounded by document length, so no skew beyond what
    AQE's skew-join handles on the gram key (stop-phrase grams are
    capped by min_docs filtering happening BEFORE the positions join).
    """
    from pyspark.sql import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = docs.select(F.col(id_col).alias("id"), words.alias("w")).filter(
        F.size("w") >= k
    )
    n = F.size("w")
    grams = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.struct(
                    i.cast("long").alias("pos"),
                    F.concat_ws(" ", F.slice("w", i, k)).alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    pos = grams.join(dup, "gram").select(
        "id", "pos", (F.col("pos") + k).alias("e")
    )
    w_prev = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pos.select(
        "id", "pos", "e",
        F.when(
            F.col("pos") > F.coalesce(
                F.max("e").over(w_prev), F.lit(-(1 << 40))
            ),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("new_island"),
    )
    w_run = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "id", "pos", "e", F.sum("new_island").over(w_run).alias("island")
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("e").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
            "n_grams",
        )
    )
