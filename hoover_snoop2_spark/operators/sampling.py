"""Corpus-shaping operators: per-host caps and deterministic sampling.

Web-scale training pipelines cap documents per registered host (domain
diversity — RefinedWeb/C4 keep at most N pages per host) and carve
reproducible subsets.  Both must be deterministic — a re-run on the same
snapshot has to keep exactly the same rows — so ordering/sampling keys are
multiplicative-hash functions of the document id, not rand().

Scale notes:
- ``cap_per_group`` is skew-aware: host populations are zipfian (one host
  can hold 10^8 pages while the median holds 3), so rows in under-cap
  groups bypass the rank entirely via a counts semi-join and only over-cap
  groups pay the per-group sort.  A plain window row_number() would sort
  every row of every host.
- the counts table is one narrow aggregate (host, n) — orders of magnitude
  smaller than the corpus; AQE broadcasts it when it fits and both joins
  degrade gracefully to shuffles when a crawl has 10^9 distinct hosts.
- ``deterministic_sample`` is a pure filter — no shuffle at all — and
  composes with partition pruning (the predicate reaches the scan).

The reference has no sampling tier (it indexes everything); these are the
training-data additions the round brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative constant; rank_key(id) = (id * K) mod 2^32 is a
#: fixed pseudo-random permutation of [0, 2^32) both Spark and any ANSI
#: SQL engine compute exactly (inputs must stay below ~2^31 to avoid
#: long overflow under ANSI mode — mod the id down first for wider ids)
_KNUTH = 2654435761
_M32 = 1 << 32


def rank_key(id_col) -> F.Column:
    """Deterministic pseudo-random long in [0, 2^32) derived from an id.

    pmod (not %) so negative ids land in range, and the multiply is split
    16/16 so (a mod 2^32) * K never overflows a long under ANSI mode:
    a*K mod 2^32 == (a_lo*K + ((a_hi*K mod 2^16) << 16)) mod 2^32, with
    every intermediate < 2^48.  Equals the naive formula for all ids, so
    engines that compute (id % 2^32) * K % 2^32 directly on in-range ids
    (the DuckDB oracles) agree exactly."""
    a = F.pmod(F.col(id_col), F.lit(_M32))
    a_lo = a % 65536
    a_hi = F.shiftright(a, 16)
    term2 = F.pmod(a_hi * _KNUTH, F.lit(65536)) * 65536
    return F.pmod(a_lo * _KNUTH + term2, F.lit(_M32))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by the deterministic
    rank_key permutation of ``id_col`` (ties impossible below 2^32 ids;
    id breaks them above).

    Plan: counts → under-cap rows pass through a semi-join (no sort);
    only rows in over-cap groups are ranked.  Output columns = input
    columns.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    small = counts.filter(F.col("_n") <= cap).select(group_col)
    under = df.join(small, group_col, "left_semi")
    over = df.join(small, group_col, "left_anti")

    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        rank_key(id_col).asc(), F.col(id_col).asc()
    )
    capped = (
        over.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under.unionByName(capped)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Reproducible ~``fraction`` subset: keep rows whose rank_key falls
    below fraction * 2^32.  Pure filter — no shuffle, no state, identical
    membership on every run and every engine that does exact integer
    arithmetic."""
    return df.filter(rank_key(id_col) < int(fraction * _M32))


def dsir_log_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "is_target",
    n_buckets: int = 1024,
    bucket=None,
) -> DataFrame:
    """DSIR hashed-unigram importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling").  Scores
    every document by how much its token distribution resembles a target
    subset of the corpus: ``log w(d) = Σ_tok [log p_target(b(tok)) -
    log p_raw(b(tok))]`` with add-one smoothing over ``n_buckets``
    hashed-unigram buckets.  Raw counts come from all rows, target
    counts from rows where ``target_col`` is true.

    The hashing trick is what makes this a 100-TB operator: the learned
    model is two count vectors of fixed size ``n_buckets`` regardless of
    corpus size, so the per-bucket log-ratio table always broadcasts.
    Plan shape: one token explode feeding (a) a bounded groupBy(bucket)
    (map-side partials collapse to ≤n_buckets rows per partition) and
    (b) a BroadcastHashJoin against the weight table followed by one
    groupBy(id) — a single corpus-sized Exchange end to end, no
    driver-side model fitting beyond the two scalar totals.

    ``bucket`` overrides the bucket expression (a function of the token
    column); default is JVM ``xxhash64 % n_buckets``.  The driver-oracle
    query (q98) passes the portable ``conv(md5[:8]) % n_buckets`` so
    DuckDB can replay the exact bucket assignment.
    """
    tok = F.explode(
        F.split(F.lower(F.col(text_col)), r"\s+")
    ).alias("tok")
    toks = (
        df.select(id_col, target_col, tok)
        .filter(F.length("tok") > 0)
    )
    b = (
        bucket(F.col("tok"))
        if bucket is not None
        else F.pmod(F.xxhash64("tok"), F.lit(n_buckets))
    )
    tb = toks.select(id_col, target_col, b.cast("long").alias("b"))
    bucket_counts = tb.groupBy("b").agg(
        F.count("*").alias("r_cnt"),
        F.sum(F.when(F.col(target_col), 1).otherwise(0)).alias("t_cnt"),
    )
    totals = bucket_counts.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    lw = (
        F.log((F.col("t_cnt") + 1).cast("double"))
        - F.log((F.col("t_tot") + F.lit(n_buckets)).cast("double"))
        - F.log((F.col("r_cnt") + 1).cast("double"))
        + F.log((F.col("r_tot") + F.lit(n_buckets)).cast("double"))
    )
    weights = (
        bucket_counts.crossJoin(F.broadcast(totals))
        .select("b", lw.alias("lw"), "t_cnt", "r_cnt")
    )
    return (
        tb.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("lw").alias("log_weight"),
            F.sum("t_cnt").alias("target_mass"),
            F.sum("r_cnt").alias("raw_mass"),
        )
    )
