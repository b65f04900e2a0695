"""Connected components over near-dup pair graphs (duplicate families).

Pair generators (minhash LSH, simhash, embedding LSH — operators/dedup.py)
emit *edges*; a training-data pipeline needs the *transitive* duplicate
family so one representative per family survives.  The reference keeps that
closure implicitly — every Blob with the same sha3_256 collapses to one row
(models.py:102-113) — which only covers exact-hash cliques; near-dup edges
(A~B, B~C, A!~C) need a real connected-components pass.

Algorithm: the alternating large-star / small-star algorithm of Kiveris et
al., "Connected Components in MapReduce and Beyond" (ACM SoCC 2014).  Each
round is two shuffles (a groupBy-min and an equi-join) over the *edge* set
only — never an adjacency materialization — and the edge set shrinks
monotonically toward the star fixpoint, converging in O(log^2 n) rounds
(2-5 rounds in practice on dedup graphs).  This is the published
web-scale CC recipe, unlike naive label propagation whose round count is
the graph *diameter* (a 10^6-node crawl chain would need 10^6 shuffles).

Scale notes:
- every round materializes a checkpoint to truncate lineage — an iterative
  DataFrame loop otherwise stacks O(rounds) joins into one logical plan and
  planning time explodes; same CheckpointStore/localCheckpoint convention
  as minhash_lsh_pairs (dedup.py) — parquet snapshots are the cluster-safe
  route, localCheckpoint the fast single-node one, cache() the fallback.
- the convergence probe is a count + xxhash64 checksum of the edge set —
  one tiny aggregate per round, no collect of data rows.
- star rounds shuffle on node id; a mega-family (viral boilerplate) makes
  its root a hot key for ONE groupBy side, which AQE skew-split handles —
  payload rows are two longs, so even 10^7-member families are ~160 MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's smallest neighbor.

    Emits (v, m(u)) for v in N(u), v > u, where m(u) = min(N(u) + {u});
    operates on the symmetric edge view so each undirected edge is seen
    from both endpoints.
    """
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Re-point every small neighbor (and the hub) to the smallest one.

    Directs each edge high->low, then for each hub u emits (u, m) and
    (v, m) for v in N(u), v != m, where m = min(N(u)) (all neighbors are
    smaller than the hub after directing).
    """
    directed = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    j = directed.join(directed.groupBy("u").agg(F.min("v").alias("m")), "u")
    hub = j.select("u", F.col("m").alias("v")).distinct()
    small = (
        j.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    return hub.union(small)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min id.

    ``edges`` is an undirected pair list (long ids, e.g. the output of
    minhash_lsh_pairs / simhash_pairs / embedding_dups).  Nodes absent
    from ``edges`` are absent from the output — callers union singletons
    back (see dup_families).

    Lineage truncation per round is NOT optional here: each star round
    references the previous edge set four times, so an untruncated
    logical plan grows ~16x per round and Catalyst analysis ooms the
    driver after a handful of rounds (cache() does not cut the plan —
    GraphFrames mandates a checkpoint dir for its CC for the same
    reason).  ``checkpoint_dir`` routes round snapshots through
    plans.checkpoint.CheckpointStore (parquet; survives executor loss —
    the cluster route); the default is block-store localCheckpoint
    (fastest, fine for static executors; re-run the job on executor
    loss).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    def _checksum(df: DataFrame) -> tuple[int, int]:
        # hashes shifted to 31 bits so the ANSI-mode sum cannot overflow a
        # long below 2^32 rows (collisions irrelevant: count is also checked)
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.shiftrightunsigned(F.xxhash64(F.col("u"), F.col("v")), 33)),
                F.lit(0),
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"])

    e = _pin(e, "cc_round_init")
    prev = _checksum(e)
    for it in range(max_iter):
        nxt = _pin(_small_star(_large_star(e)), f"cc_round_{it}")
        cur = _checksum(nxt)
        if e.is_cached:
            e.unpersist()
        e = nxt
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    # fixpoint edge set is a star forest (node -> component root); roots
    # themselves appear only on the v side
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .join(members.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return members.union(roots)


def dup_families(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    **cc_kwargs,
) -> DataFrame:
    """Assign every document a duplicate-family id (family = component
    min; singletons are their own family) plus the family size.

    The step after near-dup pair generation in a training pipeline:
    ``docs -> minhash_lsh_pairs -> dup_families -> keep one per family``.
    The docs side never shuffles its payload — only (id) columns flow
    through the CC rounds; the final family join broadcasts the family
    table when small (AQE decides).
    """
    comp = connected_components(pairs, src=src, dst=dst, **cc_kwargs)
    assigned = (
        docs.select(F.col(id_col).cast("long").alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("family_id"),
        )
    )
    sizes = assigned.groupBy("family_id").agg(F.count("*").alias("family_size"))
    return assigned.join(sizes, "family_id").select(
        id_col, "family_id", "family_size"
    )


def family_representatives(
    docs: DataFrame,
    families: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "n_chars",
) -> DataFrame:
    """One surviving document per duplicate family — the dedup *apply*
    step (keep-the-longest heuristic; ties broken by lowest id).

    Plan shape: a single groupBy with a max-of-struct aggregate — partial
    aggregation runs map-side, so the shuffle carries one row per
    (partition, family), not one per document.  Deliberately NOT a window
    row_number(), which would shuffle and sort every row.
    """
    joined = families.join(docs.select(id_col, order_col), id_col)
    best = joined.groupBy("family_id", "family_size").agg(
        F.max(
            F.struct(
                F.col(order_col).alias("o"), (-F.col(id_col)).alias("neg_id")
            )
        ).alias("b")
    )
    return best.select(
        "family_id",
        (-F.col("b.neg_id")).cast("long").alias(id_col),
        F.col("b.o").alias(order_col),
        "family_size",
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, rank) PageRank over a directed edge list — the host-graph
    authority score a crawl pipeline uses for quality priors (Common
    Crawl publishes exactly this as its host-level ranks).

    Power iteration as DataFrame rounds: ranks join out-degrees, each
    edge carries rank/degree to its target, a groupBy-sum gathers
    contributions, dangling mass (nodes with no outlinks) redistributes
    uniformly so ranks keep summing to 1.  Per-round lineage truncation
    is mandatory exactly as in connected_components; each round is two
    shuffles (join on src, groupBy dst) — the published web-graph
    recipe, O(iters) rounds with iters fixed (10-20 suffices at any
    scale because convergence depends on damping, not graph size).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct()

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = _pin(nodes, "pr_nodes")
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    degrees = _pin(
        e.groupBy("src").agg(F.count("*").alias("deg")), "pr_degrees"
    )

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for it in range(iters):
        with_deg = ranks.join(
            degrees, ranks["node"] == degrees["src"], "left"
        ).select("node", "rank", "deg")
        # dangling nodes (deg null) leak their mass; collect it once per
        # round (a scalar) and hand it back uniformly
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            e.join(
                with_deg.where(F.col("deg").isNotNull()),
                e["src"] == with_deg["node"],
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("gathered"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = _pin(
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))
                ).alias("rank"),
            ),
            f"pr_round_{it}",
        )
    # engine-stable rounding (queries.py q58 idiom): floor on the raw
    # double is bit-identical across engines, round()'s tie-break is not
    return ranks.select(
        "node",
        (F.floor(F.col("rank") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "rank"
        ),
    )


def trustrank(
    edges: DataFrame,
    seeds: list[int],
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, trust) TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    "Combating Web Spam with TrustRank", VLDB 2004): personalized
    PageRank whose teleport vector is uniform over a hand-vetted
    trusted seed set instead of over all nodes — the spam-demotion
    prior crawl schedulers run next to vanilla :func:`pagerank` (trust
    flows OUT of the seeds along links and decays with distance, so
    link-farm islands unreachable from any seed converge to 0).

    Same power iteration as :func:`pagerank` with two changes: trust
    starts AT the seed distribution, and both the (1-d) teleport and
    the per-round dangling mass return to the SEEDS rather than
    uniformly.  Same two shuffles per round (join on src, groupBy
    dst), same mandatory per-round lineage truncation; the dangling
    scalar is the only per-round collect.  FP operation order matches
    the q146 recursive-CTE oracle term for term: the per-node update is
    ``((1-d) + d*dangling) * v + d*gathered`` so both engines perform
    the identical IEEE sequence; Spark's gather-order nondeterminism is
    absorbed by the final 1e-6 floor rounding (the q58 idiom)."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    spark = edges.sparkSession
    if not seeds:
        raise ValueError("trustrank needs a non-empty seed set")
    seed_df = spark.createDataFrame(
        [(int(s),) for s in sorted(set(seeds))], "node long"
    ).select("node", F.lit(1.0 / len(set(seeds))).alias("v"))

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(seed_df.select("node"))
        .distinct()
    )
    nodes = _pin(
        nodes.join(seed_df, "node", "left").select(
            "node", F.coalesce("v", F.lit(0.0)).alias("v")
        ),
        "tr_nodes",
    )
    degrees = _pin(
        e.groupBy("src").agg(F.count("*").alias("deg")), "tr_degrees"
    )

    trust = nodes.select("node", "v", F.col("v").alias("trust"))
    for it in range(iters):
        with_deg = trust.join(
            degrees, trust["node"] == degrees["src"], "left"
        ).select("node", "v", "trust", "deg")
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("trust"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            e.join(
                with_deg.where(F.col("deg").isNotNull()),
                e["src"] == with_deg["node"],
            )
            .select("dst", (F.col("trust") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("gathered"))
        )
        coef = (1.0 - damping) + damping * dangling
        trust = _pin(
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                "v",
                (
                    F.lit(coef) * F.col("v")
                    + F.lit(damping) * F.coalesce("gathered", F.lit(0.0))
                ).alias("trust"),
            ),
            f"tr_round_{it}",
        )
    return trust.select(
        "node",
        (F.floor(F.col("trust") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "trust"
        ),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, label) synchronous label-propagation communities (Raghavan
    et al. 2007, the GraphX/GraphFrames LPA) — the cheap community pass
    crawl analytics runs between PageRank-style centralities and full
    clustering: mirror networks and link farms converge onto one label
    in a handful of rounds.

    DETERMINISTIC variant: every node starts labeled with its own id;
    each synchronous round every node adopts the most frequent label
    among its neighbors (graph treated as undirected), ties broken by
    the SMALLEST label — `min_by(label, (-count, label))`, so rounds
    are gather-order-free and the q160 recursive-CTE oracle replays
    them exactly.  Fixed `iters` rounds (no convergence probe —
    synchronous LPA can 2-cycle on bipartite structures, which a fixed
    round count sidesteps deterministically).  Per round: one groupBy
    on (dst, label) + one min_by aggregate — two shuffles, same
    mandatory lineage truncation as the other iterative operators
    here.  Isolated nodes (no edges) never appear, matching
    connected_components' contract."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("a"),
            F.col(dst).cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    und = _pin(und, "lpa_edges")
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for it in range(iters):
        gathered = (
            und.join(labels, und["a"] == labels["node"])
            .groupBy(F.col("b").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = _pin(
            gathered.groupBy("node").agg(
                F.expr("min_by(label, struct(-cnt, label))").alias("label")
            ),
            f"lpa_round_{it}",
        )
    return labels


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, hub, auth) HITS (Kleinberg) over a directed edge list —
    the hub/authority companion to :func:`pagerank` crawl pipelines use
    to separate link directories (hubs) from linked-to content
    (authorities).

    Power iteration on A^T A, run UNNORMALIZED over integer scores with
    one L1 normalization at the end: per-round normalization only
    rescales the vector, so the final direction is identical in exact
    math — and keeping rounds in BIGINT makes every intermediate sum
    associative/commutative-exact (no FP gather-order drift at all; the
    single final division is one correctly-rounded IEEE op per node,
    which is what makes the DuckDB oracle bit-exact).  Production note:
    at web scale (or iters large enough that scores approach 2^53)
    switch to per-round float normalization — same two shuffles per
    half-step, same direction, just not integer-exact.

    Each half-step is one join (edges × scores) + one groupBy — the
    same two-shuffle round shape as pagerank, with the same mandatory
    per-round lineage truncation.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct()

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = _pin(nodes, "hits_nodes")

    hub = nodes.select("node", F.lit(1).cast("long").alias("score"))
    auth = nodes.select("node", F.lit(0).cast("long").alias("score"))
    for it in range(iters):
        # auth_v = sum of hub over in-edges (u, v)
        auth = _pin(
            nodes.join(
                e.join(hub, e["src"] == hub["node"])
                .select("dst", "score")
                .groupBy("dst")
                .agg(F.sum("score").alias("g")),
                nodes["node"] == F.col("dst"),
                "left",
            ).select("node", F.coalesce("g", F.lit(0)).alias("score")),
            f"hits_auth_{it}",
        )
        # hub_u = sum of auth over out-edges (u, v)
        hub = _pin(
            nodes.join(
                e.join(auth, e["dst"] == auth["node"])
                .select("src", "score")
                .groupBy("src")
                .agg(F.sum("score").alias("g")),
                nodes["node"] == F.col("src"),
                "left",
            ).select("node", F.coalesce("g", F.lit(0)).alias("score")),
            f"hits_hub_{it}",
        )
    totals = hub.agg(F.sum("score")).first()[0], auth.agg(F.sum("score")).first()[0]
    h_total = float(totals[0] or 1)
    a_total = float(totals[1] or 1)

    def _norm(col, total):
        d = col.cast("double") / F.lit(total)
        return F.floor(d * 1000000 + F.lit(0.5)) / 1000000

    return (
        hub.select("node", F.col("score").alias("h"))
        .join(auth.select("node", F.col("score").alias("a")), "node")
        .select(
            "node",
            _norm(F.col("h"), h_total).alias("hub"),
            _norm(F.col("a"), a_total).alias("auth"),
        )
    )


def resolve_roots(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    rounds: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, root, depth) for a parent-pointer forest — the primitive
    behind email-thread reconstruction (In-Reply-To chains; the
    reference walks the same parent links one Django row at a time via
    ``parent_id``, models.py) and any other ancestry flattening.

    Pointer doubling: start from ``r(i) = parent(i) or i`` and iterate
    ``r(i) <- r(r(i))``, ``d(i) <- d(i) + d(r(i))`` — after k rounds
    every node within ``2^k`` steps of its root is fully resolved, so
    ``rounds=5`` covers chains 32 deep while a naive parent walk would
    need 32 joins.  Each round is ONE self equi-join on the current
    ancestor (shuffle on id — at 10^12 rows both sides hash-partition
    on the same key and AQE handles skewed mega-threads), followed by a
    mandatory lineage truncation exactly as in connected_components:
    the join references the mapping twice per round, so the untruncated
    plan doubles per round.

    A parent id absent from ``df`` (a References header pointing at a
    message the crawl never saw) stays as-is: the chain resolves to the
    nearest *known* ancestor — the dangling id becomes the thread key,
    which is what mail clients do when the head of a thread is missing.
    """
    m = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(parent_col).cast("long").alias("p"),
    )

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(d: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(d, name)
        return d.localCheckpoint(eager=True)

    r = m.select(
        "id",
        F.coalesce("p", "id").alias("r"),
        F.when(F.col("p").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("d"),
    )
    for it in range(rounds):
        nxt = r.select(
            F.col("id").alias("id2"),
            F.col("r").alias("r2"),
            F.col("d").alias("d2"),
        )
        r = _pin(
            r.join(nxt, r["r"] == nxt["id2"], "left").select(
                "id",
                F.coalesce("r2", "r").alias("r"),
                (F.col("d") + F.coalesce("d2", F.lit(0))).alias("d"),
            ),
            f"roots_{it}",
        )
    return r.select(
        "id", F.col("r").alias("root"), F.col("d").cast("long").alias("depth")
    )


def kcore(
    edges: DataFrame,
    k: int = 4,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 12,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, deg, converged) k-core decomposition by iterative peeling
    (Seidman 1983; the Batagelj-Zaveršnik peel expressed as synchronous
    rounds) — the density filter crawl analytics runs to separate the
    organically-linked core of a host graph from its fringe (link-spam
    detection and graph-sampling both start from the k-core, because a
    spam farm must BUY core membership: every member needs k real
    edges that survive everyone else's peeling).

    Synchronous rounds: compute undirected degrees, drop every node
    with deg < k, keep only edges with BOTH endpoints surviving,
    repeat.  Each round is one groupBy (degree) + two semi-joins (edge
    filter) — shuffles on node id only, edge payloads two longs, the
    same mandatory per-round lineage truncation as the other iterative
    operators here.  A peel can cascade (removing the fringe drops a
    neighbor under k), so a fixed `rounds` budget carries a
    CONVERGENCE CERTIFICATE instead of a hidden truncation: the edge
    set shrinks monotonically, so `converged` = (edge count unchanged
    over the last round) proves the fixpoint was reached — the q184
    certificate idiom applied to an iterative operator.  The returned
    `deg` is the degree INSIDE the final subgraph (the core's own
    degrees, ≥ k whenever converged)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("long").alias("lo"),
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(d: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(d, name)
        return d.localCheckpoint(eager=True)

    e = _pin(e, "kcore_edges")
    prev = e
    for it in range(rounds):
        und = e.select(F.col("lo").alias("node")).unionAll(
            e.select(F.col("hi").alias("node"))
        )
        keep = (
            und.groupBy("node")
            .agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= k)
            .select("node")
        )
        prev = e
        e = _pin(
            e.join(keep, e["lo"] == keep["node"], "left_semi").join(
                keep, e["hi"] == keep["node"], "left_semi"
            ),
            f"kcore_round_{it}",
        )
    # monotone edge set: equal counts over the last round <=> fixpoint
    flag = (
        prev.agg(F.count("*").alias("n_prev"))
        .crossJoin(e.agg(F.count("*").alias("n_cur")))
        .select((F.col("n_prev") == F.col("n_cur")).alias("converged"))
    )
    und = e.select(F.col("lo").alias("node")).unionAll(
        e.select(F.col("hi").alias("node"))
    )
    return (
        und.groupBy("node")
        .agg(F.count("*").alias("deg"))
        .crossJoin(F.broadcast(flag))
    )


def bowtie(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    doubling_rounds: int = 6,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, scc_id, scc_size, cls) web bow-tie decomposition (Broder
    et al., "Graph structure in the Web", WWW 2000): CORE = the largest
    strongly connected component, IN = reaches the core, OUT =
    reachable from it, OTHER = tendrils and disconnected islands.  The
    first structural question asked of any crawl's host graph — it
    tells you which seeds can ever discover which content.

    Reachability by DOUBLING (reach ∪ reach∘reach per round), so
    `doubling_rounds` rounds cover paths up to 2^rounds — O(log
    diameter) shuffles instead of the diameter-many of naive BFS; each
    round is one self-join + distinct on (u, v) pairs.  SCC id =
    smallest mutually-reachable node; the core pick (max size, min id)
    is a one-row broadcast, never a collect.  Pair-closure
    materialization is O(n·reach) — right for host-level graphs (10^6
    hosts); page-level SCC at 10^12 nodes would switch to the
    label-forwarding variant, same round structure."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(d: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(d, name)
        return d.localCheckpoint(eager=True)

    reach = _pin(e, "bowtie_base")
    for it in range(doubling_rounds):
        hop = reach.select(
            F.col("u").alias("m"), F.col("v").alias("w")
        )
        reach = _pin(
            reach.unionAll(
                reach.join(hop, reach["v"] == hop["m"]).select(
                    "u", F.col("w").alias("v")
                )
            ).distinct(),
            f"bowtie_round_{it}",
        )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # reflexive closure so scc_id(u) always includes u itself
    reach_star = reach.unionAll(
        nodes.select(F.col("node").alias("u"), F.col("node").alias("v"))
    ).distinct()
    back = reach_star.select(
        F.col("v").alias("bu"), F.col("u").alias("bv")
    )
    mutual = reach_star.join(
        back,
        (reach_star["u"] == back["bu"]) & (reach_star["v"] == back["bv"]),
        "left_semi",
    )
    scc = mutual.groupBy("u").agg(F.min("v").alias("scc_id")).select(
        F.col("u").alias("node"), "scc_id"
    )
    sizes = scc.groupBy("scc_id").agg(F.count("*").alias("scc_size"))
    core = F.broadcast(
        sizes.orderBy(F.col("scc_size").desc(), F.col("scc_id").asc())
        .limit(1)
        .select(F.col("scc_id").alias("core_id"))
    )
    core_nodes = scc.crossJoin(core).where(
        F.col("scc_id") == F.col("core_id")
    ).select(F.col("node").alias("cn"))
    to_core = reach.join(
        core_nodes, reach["v"] == core_nodes["cn"], "left_semi"
    ).select(F.col("u").alias("node")).distinct()
    from_core = reach.join(
        core_nodes, reach["u"] == core_nodes["cn"], "left_semi"
    ).select(F.col("v").alias("node")).distinct()
    labeled = (
        scc.join(sizes, "scc_id")
        .crossJoin(core)
        .join(
            to_core.select(F.col("node"), F.lit(1).alias("t")),
            "node",
            "left",
        )
        .join(
            from_core.select(F.col("node"), F.lit(1).alias("f")),
            "node",
            "left",
        )
    )
    return labeled.select(
        "node",
        "scc_id",
        "scc_size",
        F.when(F.col("scc_id") == F.col("core_id"), F.lit("CORE"))
        .when(F.col("t").isNotNull(), F.lit("IN"))
        .when(F.col("f").isNotNull(), F.lit("OUT"))
        .otherwise(F.lit("OTHER"))
        .alias("cls"),
    )


def bfs_hops(
    edges: DataFrame,
    seeds: list[int],
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Minimum hop count from a seed set — parallel BFS by frontier
    expansion (the crawl-depth question: how many link hops from the
    seed list does each host sit, i.e. which crawl round would first
    discover it).  The reference has no graph layer at all (walk/
    unarchive recursion in tasks.py is tree-shaped); this is the
    companion of :func:`bowtie` reachability, returning *distances*
    rather than reachability classes.

    Per round: one equi-join of the current frontier (shrinking) with
    the edge set + one anti-join against the visited set — both shuffle
    on node id, frontier rows are a single long.  Rounds = graph
    diameter, each round's result pinned (CheckpointStore / eager
    localCheckpoint) so the logical plan stays O(1) deep.  The per-round
    driver scalar is the frontier count (same discipline as pagerank's
    dangling-mass scalar).  Unreached nodes are simply absent — callers
    left-join and read NULL as unreachable.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    spark = edges.sparkSession
    e = _pin(e, "bfs_edges")
    frontier = _pin(
        spark.createDataFrame(
            [(int(s),) for s in sorted(set(seeds))], "node long"
        ),
        "bfs_seed",
    )
    visited = frontier.select("node", F.lit(0).cast("long").alias("hop"))
    visited = _pin(visited, "bfs_hop_0")
    for r in range(1, max_rounds + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(r).cast("long").alias("hop"))
        )
        nxt = _pin(nxt, f"bfs_hop_{r}")
        if nxt.isEmpty():
            break
        visited = _pin(visited.union(nxt), f"bfs_visited_{r}")
        frontier = nxt.select("node")
    return visited


def deterministic_walks(
    edges: DataFrame,
    seeds: DataFrame,
    length: int = 8,
    salt: str = "walks-v1",
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DeepWalk-style walk corpus, derandomized: one walk per seed node,
    each step choosing the out-neighbor with the MINIMUM
    ``md5(salt|walk_id|step|neighbor)`` digest.  Graph-embedding
    training data (DeepWalk, node2vec) is random-walk sentences; a
    distributed pipeline wants those walks *reproducible* across
    retries, executors, and engines — a seeded RNG is not (Spark task
    retry re-rolls it), a content-keyed hash argmin is.  The reference
    has no graph layer (its only traversal is the tree-shaped
    walk/unarchive recursion, snoop/data/tasks.py) — this extends the
    graph suite (q52/q146/q160/q211) with the sampling axis.

    Per step: one equi-join of the frontier (|seeds| rows, shrinking
    only at sinks) against the edge set, then a per-walk ``min_by`` —
    an aggregation with map-side partial combine, so the shuffle
    payload per walk is one (hash, node) pair per partition, not the
    full out-degree fan-out.  ``length`` rounds total, lineage pinned
    per round (CheckpointStore when given, eager localCheckpoint
    otherwise).  Walks hitting a sink node simply end early (absent
    rows), matching how walk corpora truncate at dangling pages.

    Output: (walk_id, step, node) with step 0 = the seed itself.
    The hash input is pure ASCII built from cast-to-string longs, so
    any engine reproduces the corpus bit-exactly (the q213 oracle
    replays it in DuckDB via the closed-form edge rules).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).distinct()

    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    e = _pin(e, "walk_edges")
    frontier = seeds.select(
        F.col(seeds.columns[0]).cast("long").alias("walk_id")
    ).distinct().withColumn("node", F.col("walk_id"))
    frontier = _pin(frontier, "walk_seed")
    rows = frontier.select(
        "walk_id", F.lit(0).cast("long").alias("step"), "node"
    )
    out = _pin(rows, "walk_step_0")
    result = out
    for r in range(1, length + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    "dst",
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(salt),
                            F.col("walk_id").cast("string"),
                            F.lit(str(r)),
                            F.col("dst").cast("string"),
                        )
                    ),
                ).alias("node")
            )
        )
        nxt = _pin(nxt, f"walk_step_{r}")
        if nxt.isEmpty():
            break
        result = result.union(
            nxt.select("walk_id", F.lit(r).cast("long").alias("step"), "node")
        )
        frontier = nxt
    return result
