"""Connected components / duplicate-family clustering (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.operators.graph import connected_components, dup_families


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_two_disjoint_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_in_log_rounds(spark):
    # a 64-node path: naive label propagation needs 63 rounds; the
    # alternating algorithm must finish well inside max_iter=10
    edges = [(i, i + 1) for i in range(63)]
    got = _components(spark, edges, max_iter=10)
    assert got == {i: 0 for i in range(64)}


def test_star_and_duplicate_edges(spark):
    # duplicate + reversed edges collapse; hub already a star
    got = _components(spark, [(5, 1), (1, 5), (5, 1), (5, 9), (9, 5)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_self_loops_ignored(spark):
    got = _components(spark, [(3, 3), (3, 4)])
    assert got == {3: 3, 4: 3}


def test_dup_families_assigns_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    fam = {
        r["doc_id"]: (r["family_id"], r["family_size"])
        for r in dup_families(docs, pairs).collect()
    }
    assert fam == {
        0: (0, 3), 1: (0, 3), 2: (0, 3),
        3: (3, 1),
        4: (4, 2), 5: (4, 2),
    }


def test_family_representatives_longest_wins_ties_lowest_id(spark):
    from hoover_snoop2_spark.operators.graph import family_representatives

    docs = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 30), (3, 7)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    fam = dup_families(docs, pairs)
    got = {
        r["family_id"]: (r["doc_id"], r["n_chars"], r["family_size"])
        for r in family_representatives(docs, fam).collect()
    }
    # family {0,1,2}: 1 and 2 tie on length 30 -> lowest id (1) wins
    assert got == {0: (1, 30, 3), 3: (3, 7, 1)}


def test_family_representatives_plan_is_aggregate_not_window(spark):
    # the dedup-apply step must stay a partial-aggregable groupBy; a
    # window row_number() would sort every row inside each family
    from hoover_snoop2_spark.operators.graph import family_representatives

    docs = spark.createDataFrame([(0, 10), (1, 30)], "doc_id long, n_chars long")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    plan = family_representatives(docs, dup_families(docs, pairs))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan


def test_dup_families_over_minhash_pairs(spark):
    """End-to-end: near-dup pair generation -> family closure.

    Transitive case: A~B and B~C are near-dups but A and C drift further
    apart — the family must still unite all three.
    """
    from hoover_snoop2_spark.operators.dedup import minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside "
        "the old house near the river bend every single morning"
    )
    rows = [
        (0, base),
        (1, base.replace("lazy", "sleepy")),
        (2, base.replace("lazy", "sleepy").replace("warm", "cold")),
        (3, "entirely unrelated text about catalyst optimizer rules and "
            "adaptive query execution with shuffle partition coalescing "
            "for large distributed joins in columnar engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # 16 bands of 4 rows: with the fixed seed this finds exactly (0,1) and
    # (1,2) at j=0.72 but NOT (0,2) at j=0.51 — the genuinely transitive
    # case the closure exists for (default 4x4 banding misses all pairs)
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=64, bands=16, jaccard_threshold=0.5
    )
    fam = {
        r["doc_id"]: r["family_id"]
        for r in dup_families(docs, pairs).collect()
    }
    assert fam[0] == fam[1] == fam[2] == 0
    assert fam[3] == 3


def test_cc_matches_union_find_on_random_graphs(spark):
    """Seeded random graphs: the star-rounds fixpoint must equal a plain
    union-find closure exactly (labels = component min)."""
    import random

    rng = random.Random(20260817)
    for trial in range(6):
        n = rng.randint(2, 60)
        m = rng.randint(0, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        if not edges:
            continue

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e if e[0] != e[1]}
        # nodes only in self-loops are absent from CC output by contract
        expect = {v: find(v) for v in touched}

        got = _components(spark, edges)
        assert got == expect, f"trial {trial}: n={n} edges={edges}"


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from hoover_snoop2_spark.operators.graph import pagerank

    # directed graph incl. a dangling node (3) and a hub (0)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (4, 0), (4, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=12).collect()}

    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    for s, ds in out.items():
        for d in ds:
            M[idx[d], idx[s]] = 1.0 / len(ds)
    r = np.full(n, 1.0 / n)
    damping = 0.85
    for _ in range(12):
        dangling = sum(r[idx[v]] for v in nodes if v not in out)
        r = (1 - damping) / n + damping * (M @ r) + damping * dangling / n
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-4, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-3


def test_pagerank_empty_edges(spark):
    from hoover_snoop2_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, iters=2).count() == 0


def test_hits_matches_numpy_power_iteration(spark):
    import numpy as np

    from hoover_snoop2_spark.operators.graph import hits

    # a hub (4 links out to everything) and an authority (everyone -> 2)
    edges = [(4, 0), (4, 1), (4, 2), (4, 3), (0, 2), (1, 2), (3, 2), (2, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iters=8).collect()}

    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n), dtype=np.int64)
    for s, d in edges:
        A[idx[s], idx[d]] = 1
    h = np.ones(n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(8):
        a = A.T @ h
        h = A @ a
    hn, an = h / h.sum(), a / a.sum()
    for v in nodes:
        assert abs(got[v][0] - hn[idx[v]]) < 1e-5, (v, got[v], hn[idx[v]])
        assert abs(got[v][1] - an[idx[v]]) < 1e-5, (v, got[v], an[idx[v]])
    # node 4 is the hub, node 2 the authority
    assert max(got, key=lambda v: got[v][0]) == 4
    assert max(got, key=lambda v: got[v][1]) == 2
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-3
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-3


def test_hits_empty_edges(spark):
    from hoover_snoop2_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df, iters=2).count() == 0


def test_trustrank_matches_numpy_power_iteration(spark):
    import numpy as np

    from hoover_snoop2_spark.operators.graph import trustrank

    # seeds {0,1}; node 5 is a link-farm island unreachable from seeds
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (4, 0), (1, 3), (5, 4), (6, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = [0, 1]
    got = {
        r["node"]: r["trust"]
        for r in trustrank(df, seeds=seeds, iters=12).collect()
    }

    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    for s, ds in out.items():
        for d in ds:
            M[idx[d], idx[s]] = 1.0 / len(ds)
    v = np.zeros(n)
    for s in seeds:
        v[idx[s]] = 1.0 / len(seeds)
    t = v.copy()
    damping = 0.85
    for _ in range(12):
        dangling = sum(t[idx[u]] for u in nodes if u not in out)
        t = ((1 - damping) + damping * dangling) * v + damping * (M @ t)
    for u in nodes:
        assert abs(got[u] - t[idx[u]]) < 1e-4, (u, got[u], t[idx[u]])
    # trust is conserved (teleport + dangling both return to seeds)
    assert abs(sum(got.values()) - 1.0) < 1e-3
    # the island pair (5,6) is unreachable from any seed -> ~zero trust
    assert got[5] < 1e-6 and got[6] < 1e-6
    # node 4 only receives from the island, so it decays too
    assert got[4] < 1e-6


def test_trustrank_requires_seeds(spark):
    from hoover_snoop2_spark.operators.graph import trustrank

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        trustrank(df, seeds=[], iters=1)


def test_label_propagation_two_communities(spark):
    from hoover_snoop2_spark.operators.graph import label_propagation

    # two triangles bridged by one edge: LPA must keep them as two
    # communities labeled by each triangle's smallest node id
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=4).collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5]
    assert got[3] != 0


def test_label_propagation_deterministic_ties(spark):
    from hoover_snoop2_spark.operators.graph import label_propagation

    # a 2-path: node 1 sees labels {0, 2} with equal counts -> the
    # smallest-label tie-break must pick 0, every run
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for _ in range(2):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iters=3).collect()
        }
        assert got[1] == 0


def _peel_kcore(edges, k):
    """Brute-force Batagelj-Zaveršnik peel: repeatedly drop nodes with
    undirected degree < k; returns {node: final_degree}."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            return deg
        es = {e for e in es if e[0] not in drop and e[1] not in drop}


def test_kcore_matches_bruteforce_peel_on_random_graphs(spark):
    import random

    from hoover_snoop2_spark.operators.graph import kcore

    rng = random.Random(20260818)
    for trial in range(5):
        n = rng.randint(4, 40)
        m = rng.randint(n, 3 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        k = rng.randint(2, 4)
        expect = _peel_kcore(edges, k)

        df = spark.createDataFrame(edges, "src long, dst long")
        rows = kcore(df, k=k, rounds=12).collect()
        got = {r["node"]: r["deg"] for r in rows}
        assert got == expect, f"trial {trial}: k={k} edges={edges}"
        assert all(r["converged"] for r in rows)


def test_kcore_cascade_needs_multiple_rounds(spark):
    from hoover_snoop2_spark.operators.graph import kcore

    # triangle {0,1,2} + a pendant chain 2-3-4: peeling 4 drops 3 next
    # round (cascade), the triangle survives k=2
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = kcore(df, k=2, rounds=8).collect()
    got = {r["node"]: r["deg"] for r in rows}
    assert got == {0: 2, 1: 2, 2: 2}
    assert all(r["converged"] for r in rows)


def test_kcore_unconverged_certificate(spark):
    from hoover_snoop2_spark.operators.graph import kcore

    # a 12-node pendant chain into a triangle cascades one node per
    # round; rounds=2 cannot reach the fixpoint -> converged=False
    edges = [(0, 1), (1, 2), (0, 2)] + [(i, i + 1) for i in range(2, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = kcore(df, k=2, rounds=2).collect()
    assert rows and not any(r["converged"] for r in rows)


def test_kcore_empty_core(spark):
    from hoover_snoop2_spark.operators.graph import kcore

    # a tree has no 2-core at all
    edges = [(0, 1), (1, 2), (1, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert kcore(df, k=2, rounds=8).count() == 0


def _py_bowtie(edges):
    """Brute-force bow-tie: transitive closure by Floyd-Warshall-ish
    BFS, SCC = mutual reachability, classes per Broder et al."""
    nodes = sorted({v for e in edges for v in e if e[0] != e[1]})
    adj = {v: set() for v in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
    reach = {}
    for s in nodes:
        seen, stack = set(), [s]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        reach[s] = seen
    scc = {
        v: min(
            [v]
            + [w for w in nodes if w in reach[v] and v in reach[w]]
        )
        for v in nodes
    }
    sizes = {}
    for v in nodes:
        sizes[scc[v]] = sizes.get(scc[v], 0) + 1
    core_id = min(
        sizes, key=lambda c: (-sizes[c], c)
    )
    core_nodes = {v for v in nodes if scc[v] == core_id}
    out = {}
    for v in nodes:
        if scc[v] == core_id:
            cls = "CORE"
        elif reach[v] & core_nodes:
            cls = "IN"
        elif any(v in reach[c] for c in core_nodes):
            cls = "OUT"
        else:
            cls = "OTHER"
        out[v] = (scc[v], sizes[scc[v]], cls)
    return out


def test_bowtie_matches_bruteforce_on_random_digraphs(spark):
    import random

    from hoover_snoop2_spark.operators.graph import bowtie

    rng = random.Random(20260818)
    for trial in range(4):
        n = rng.randint(5, 24)
        m = rng.randint(n, 3 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        expect = _py_bowtie(edges)

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["scc_id"], r["scc_size"], r["cls"])
            for r in bowtie(df, doubling_rounds=6).collect()
        }
        assert got == expect, f"trial {trial}: edges={edges}"


def test_bowtie_textbook_anatomy(spark):
    from hoover_snoop2_spark.operators.graph import bowtie

    # core ring {10,11,12}, IN chain 1->2->10, OUT chain 12->20->21,
    # island pair {30,31}
    edges = [
        (10, 11), (11, 12), (12, 10),
        (1, 2), (2, 10),
        (12, 20), (20, 21),
        (30, 31), (31, 30),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["cls"] for r in bowtie(df, doubling_rounds=5).collect()}
    assert got == {
        10: "CORE", 11: "CORE", 12: "CORE",
        1: "IN", 2: "IN",
        20: "OUT", 21: "OUT",
        30: "OTHER", 31: "OTHER",
    }


def test_bfs_hops_chain_branch_and_unreachable(spark):
    from hoover_snoop2_spark.operators.graph import bfs_hops

    # 0 -> 1 -> 2 -> 3, 0 -> 4, 5 -> 0 (5 unreachable FROM seed),
    # 6 <-> 7 an island, plus a back edge 3 -> 1 (cycle must not loop)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 4), (5, 0), (6, 7), (7, 6), (3, 1)],
        "src long, dst long",
    )
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds=[0]).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1}


def test_bfs_hops_multi_seed_takes_min(spark):
    from hoover_snoop2_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (9, 3)], "src long, dst long"
    )
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds=[0, 9]).collect()}
    assert got == {0: 0, 9: 0, 1: 1, 2: 2, 3: 1}


def test_deterministic_walks_tiny_graph_matches_hand_md5(spark):
    """Each step must pick the out-neighbor with the smallest
    md5(salt|walk_id|step|neighbor) — verified against hashlib."""
    import hashlib

    from hoover_snoop2_spark.operators.graph import deterministic_walks

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "walk_id long")
    out = deterministic_walks(edges, seeds, length=4, salt="t")
    got = {
        (r["walk_id"], r["step"]): r["node"] for r in out.collect()
    }
    nbrs = {0: [1, 2], 1: [0, 2], 2: [0, 1]}
    for wid in (0, 1, 2):
        cur = wid
        assert got[(wid, 0)] == wid
        for step in range(1, 5):
            cur = min(
                nbrs[cur],
                key=lambda n: hashlib.md5(
                    f"t|{wid}|{step}|{n}".encode()
                ).hexdigest(),
            )
            assert got[(wid, step)] == cur


def test_deterministic_walks_reproducible_and_sink_truncates(spark):
    from hoover_snoop2_spark.operators.graph import deterministic_walks

    # 0 -> 1 -> 2 (sink): the walk from 0 must stop at step 2
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "walk_id long")
    a = sorted(map(tuple, deterministic_walks(edges, seeds, 8).collect()))
    b = sorted(map(tuple, deterministic_walks(edges, seeds, 8).collect()))
    assert a == b == [(0, 0, 0), (0, 1, 1), (0, 2, 2)]


def test_recursive_cte_thread_paths_closed_form(spark):
    """q225 (Spark-native WITH RECURSIVE) against the closed form: for
    the doc%8 forest, root = doc - doc%8, depth = doc%8 and the path is
    the full root..doc run — plus the plan proof that Spark's recursive
    UnionLoop (not a driver loop) executes the fixpoint."""
    from tests.conftest import SF_DIR

    from hoover_snoop2_spark.queries import QUERIES

    df = QUERIES["q225_recursive_thread_paths"](spark, SF_DIR)
    rows = df.collect()
    ids = {r.doc_id for r in rows}
    assert rows and len(ids) == len(rows)  # every doc exactly once
    for r in rows:
        root = r.doc_id - r.doc_id % 8
        assert r.root == root
        assert r.depth == r.doc_id % 8
        assert r.path == "/".join(str(i) for i in range(root, r.doc_id + 1))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan or "Recursion" in plan
