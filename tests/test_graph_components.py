"""Connected components / dedup cluster consolidation (operators/graph.py)."""

from __future__ import annotations

import pytest

from soccer_data_pipeline_spark.operators.graph import (
    _star_contract,
    connected_components,
    dup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_long_path_converges(spark):
    """A 12-node path (diameter 11) — exercises multi-round propagation
    well past a fixed-small-round assumption."""
    cc = connected_components(_edges(spark, [(i, i + 1) for i in range(11)]))
    rows = {r.node: r.cluster_id for r in cc.collect()}
    assert set(rows) == set(range(12))
    assert set(rows.values()) == {0}


def test_high_diameter_chain_auto_fallback(spark):
    """A 61-node chain (diameter 60) with max_iters=5: min-label alone
    cannot converge, so connected_components must auto-switch to the
    large-star/small-star contraction and still produce the exact
    single-component labeling."""
    cc = connected_components(
        _edges(spark, [(i, i + 1) for i in range(60)]),
        max_iters=5,
        driver_cutoff=None,
    )
    rows = {r.node: r.cluster_id for r in cc.collect()}
    assert set(rows) == set(range(61))
    assert set(rows.values()) == {0}


def test_high_diameter_raises_without_fallback(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(30)]),
            max_iters=3,
            fallback=None,
            driver_cutoff=None,
        ).collect()


def test_star_contract_direct(spark):
    """Star contraction standalone: mixed topology — two cliques, a
    chain bridging one of them, an isolated self-loop node."""
    pairs = (
        [(1, 2), (2, 3), (1, 3)]        # clique {1,2,3}
        + [(3, 100), (100, 101), (101, 102)]  # chain hanging off it
        + [(50, 51), (51, 52), (50, 52)]      # clique {50,51,52}
        + [(77, 77)]                           # self-loop only
    )
    e = spark.createDataFrame(pairs, "u long, v long")
    out = {r.node: r.label for r in _star_contract(e).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 100: 1, 101: 1, 102: 1,
        50: 50, 51: 50, 52: 50,
        77: 77,
    }


def _union_find_reference(pairs):
    """Driver-side union-find oracle: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_both_paths_match_union_find_on_random_graphs(spark):
    """min-label and star contraction must both reproduce the exact
    union-find labeling on seeded random graphs (mixed cliques, chains,
    and sparse noise — the shapes real near-dup pair tables take)."""
    import random

    rng = random.Random(7)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ] + [(i, i + 1) for i in range(120, 150)]  # a diameter-30 chain
    pairs = [(a, b) for a, b in pairs if a != b]
    expected = _union_find_reference(pairs)

    e = _edges(spark, pairs)
    # driver_cutoff=None forces the distributed min-label loop; the
    # cutoff path IS the union-find reference, so covering it here
    # would be circular. fallback=None makes non-convergence within
    # max_iters a loud failure instead of a silent star-contraction
    # rescue — this leg must exercise min-label itself (ADVICE r5)
    got_minlabel = {
        r.node: r.cluster_id
        for r in connected_components(
            e, max_iters=50, driver_cutoff=None, fallback=None
        ).collect()
    }
    assert got_minlabel == expected

    e2 = spark.createDataFrame(pairs, "u long, v long")
    got_star = {r.node: r.label for r in _star_contract(e2).collect()}
    assert got_star == expected


def test_disjoint_cliques_and_keeper(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    out = {r.doc_id: r for r in dup_clusters(_edges(spark, pairs)).collect()}
    assert {d: r.cluster_id for d, r in out.items()} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20
    }
    assert out[1].cluster_size == 3 and out[10].cluster_size == 2 and out[23].cluster_size == 4
    assert [d for d, r in sorted(out.items()) if r.is_keeper] == [1, 10, 20]


def test_triangle_count_known_graphs(spark):
    """K5 has C(5,3)=10 triangles; a path graph has none; K5 plus a
    disjoint path changes nothing but the edge count."""
    from soccer_data_pipeline_spark.operators.graph import triangle_count

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    path = [(10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(k5 + path, "u long, v long")
    row = triangle_count(df).collect()[0]
    assert row.n_edges == len(k5) + len(path)
    assert row.n_triangles == 10
    df2 = spark.createDataFrame(path, "u long, v long")
    assert triangle_count(df2).collect()[0].n_triangles == 0


def test_pagerank_star_and_invariants(spark):
    """On an undirected star graph the hub outranks every leaf, leaves
    tie exactly (identical ordered contribution folds), and total rank
    mass stays ~1 (power iteration preserves mass up to teleport
    rounding)."""
    from soccer_data_pipeline_spark.operators.graph import pagerank

    star = [(0, i) for i in range(1, 7)]
    df = spark.createDataFrame(star, "u long, v long")
    ranks = {r.node: r.r for r in pagerank(df, iters=5).collect()}
    hub, leaves = ranks[0], [ranks[i] for i in range(1, 7)]
    assert hub > max(leaves)
    assert len(set(leaves)) == 1  # bit-identical, not just close
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_kcore_peel_profile_known_graph(spark):
    """K5 survives 3-core peeling untouched; a pendant path is stripped
    one layer per round (classic peel cascade)."""
    from soccer_data_pipeline_spark.operators.graph import kcore_peel_profile

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    # pendant chain hanging off node 0: 0-10, 10-11, 11-12
    chain = [(0, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k5 + chain, "u long, v long")
    prof = {r.round: (r.n_removed, r.n_remaining) for r in kcore_peel_profile(df, k=3, rounds=3).collect()}
    # removal is simultaneous per round on the CURRENT graph: deg(10)=2,
    # deg(11)=2, deg(12)=1 — all < 3, so the whole chain peels in round 1
    assert prof[1] == (3, 5)
    # rounds 2-3: K5 is a 4-core; nothing else peels
    assert prof[2] == (0, 5) and prof[3] == (0, 5)


def test_kcore_peel_degenerate_graph_removes_everything(spark):
    """VERDICT r6 #5: on a degenerate graph (every node below k in
    round 1) the removal set is NODE-SIZED — the anti-join must not
    force-broadcast it. This peels a 2000-edge perfect matching
    (every degree = 1 < k=3): round 1 removes all 4000 nodes, later
    rounds are empty, and the plan adapts instead of OOMing."""
    from pyspark.sql import functions as F

    from soccer_data_pipeline_spark.operators.graph import kcore_peel_profile

    edges = spark.range(2000).select(
        (F.col("id") * 2).alias("u"), (F.col("id") * 2 + 1).alias("v")
    )
    prof = {
        r.round: (r.n_removed, r.n_remaining)
        for r in kcore_peel_profile(edges, k=3, rounds=3).collect()
    }
    assert prof == {1: (4000, 0), 2: (0, 0), 3: (0, 0)}


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two K4 cliques joined by one bridge edge: after two synchronous
    rounds every clique member carries its clique's minimum label, and
    the bridge does not merge the communities (clique-internal votes
    dominate). Deterministic tie-break = smallest label."""
    from pyspark.sql import functions as F

    from soccer_data_pipeline_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "u long, v long")
    got = {r.node: r.community for r in label_propagation(edges, iters=2).collect()}
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}
