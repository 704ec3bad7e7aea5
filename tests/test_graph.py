"""PageRank over DataFrame edge lists (operators/graph.py, q141):
hand-checked fixed-point values on toy graphs, mass conservation, the
bipartite encoder, and the one-shuffle-per-iteration plan property."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators.graph import (
    bipartite_interaction_edges, out_degrees, pagerank)


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_symmetric_pair_converges_to_uniform(spark):
    """Two nodes pointing at each other: rank stays exactly 1.0 forever
    ((1-d) + d·1.0/1 = 1.0) — the fixed point of a regular graph."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = _ranks(pagerank(edges, iters=4))
    assert got == {1: 1.0, 2: 1.0}


def test_star_graph_center_accumulates(spark):
    """3-leaf star, symmetric edges, 1 iteration by hand:
    center: 0.15 + 0.85·(3 leaves · 1.0/1) = 2.70
    leaf:   0.15 + 0.85·(1.0/3)            = 0.43333...
    """
    e = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    edges = spark.createDataFrame(e, "src long, dst long")
    got = _ranks(pagerank(edges, iters=1))
    assert got[0] == pytest.approx(2.70)
    for leaf in (1, 2, 3):
        assert got[leaf] == pytest.approx(0.15 + 0.85 / 3)


def test_mass_is_conserved_without_dangling_nodes(spark):
    """Σ ranks = |V| at every iteration count when out-degree ≥ 1
    everywhere (each node redistributes all its mass; teleport term
    re-adds exactly what damping removed)."""
    e = [(0, 1), (1, 2), (2, 0), (2, 1), (1, 0), (0, 2)]
    edges = spark.createDataFrame(e, "src long, dst long")
    for k in (1, 3):
        total = sum(_ranks(pagerank(edges, iters=k)).values())
        assert total == pytest.approx(3.0, abs=1e-12)


def test_out_degrees(spark):
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 1)],
                                  "src long, dst long")
    got = {r["src"]: r["deg"] for r in out_degrees(edges).collect()}
    assert got == {1: 2, 2: 1}


def test_bipartite_encoder_disambiguates_and_symmetrizes(spark):
    """Left id 3 and right id 3 must become DIFFERENT nodes (7 vs 6), and
    every interaction must appear in both directions."""
    inter = spark.createDataFrame([(3, 3), (1, 2)], "u long, v long")
    got = {(r["src"], r["dst"])
           for r in bipartite_interaction_edges(inter, "u", "v").collect()}
    assert got == {(7, 6), (6, 7), (3, 4), (4, 3)}


def test_unreferenced_dst_node_gets_base_rank(spark):
    """A sink that also points somewhere (1→2, 2→1, 1→3, 3→1): node 3
    receives only from 1 (deg 2). One iteration by hand:
    r(3) = 0.15 + 0.85·(1.0/2) = 0.575."""
    edges = spark.createDataFrame([(1, 2), (2, 1), (1, 3), (3, 1)],
                                  "src long, dst long")
    got = _ranks(pagerank(edges, iters=1))
    assert got[3] == pytest.approx(0.575)


def test_iteration_plan_has_no_cartesian_and_no_python(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    plan = (pagerank(edges, iters=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_weighted_pagerank_hand_checked(spark):
    """Weighted star, 1 iteration by hand. Edges (center 0, weights 3/1 to
    leaves 1/2, symmetric back-edges weight 1):
    center strength 4, leaves strength 1 each.
    r(1) = 0.15 + 0.85·(1.0·3/4) = 0.7875
    r(2) = 0.15 + 0.85·(1.0·1/4) = 0.3625
    r(0) = 0.15 + 0.85·(1/1 + 1/1) = 1.85
    """
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, wt double")
    got = _ranks(pagerank(edges, iters=1, weight="wt"))
    assert got[0] == pytest.approx(1.85)
    assert got[1] == pytest.approx(0.7875)
    assert got[2] == pytest.approx(0.3625)


def test_unit_weights_match_unweighted(spark):
    e = [(0, 1), (1, 2), (2, 0), (2, 1), (1, 0), (0, 2)]
    edges = spark.createDataFrame(e, "src long, dst long")
    weighted = edges.withColumn("wt", F.lit(1.0))
    a = _ranks(pagerank(edges, iters=3))
    b = _ranks(pagerank(weighted, iters=3, weight="wt"))
    assert a.keys() == b.keys()
    for n in a:
        assert a[n] == pytest.approx(b[n], abs=1e-12)


def test_weighted_mass_is_conserved(spark):
    edges = spark.createDataFrame(
        [(0, 1, 2.5), (1, 0, 0.5), (1, 2, 1.5), (2, 1, 4.0), (2, 0, 1.0),
         (0, 2, 1.0)],
        "src long, dst long, wt double")
    total = sum(_ranks(pagerank(edges, iters=2, weight="wt")).values())
    assert total == pytest.approx(3.0, abs=1e-12)


def test_dangling_nodes_diagnostic(spark):
    from ds_ga1004_bigdata_project_spark.operators.graph import dangling_nodes

    ok = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    assert dangling_nodes(ok).count() == 0
    bad = spark.createDataFrame([(1, 2), (1, 3), (3, 1)],
                                "src long, dst long")
    assert [r["node"] for r in dangling_nodes(bad).collect()] == [2]


def test_int32_ids_encode_without_overflow(spark):
    """2·id+1 must widen to long BEFORE the arithmetic — a 32-bit id
    ≥ 2³⁰ would wrap negative and collide node encodings."""
    big = (1 << 30) + 7
    inter = spark.createDataFrame([(big, big)], "u int, v int")
    got = {(r["src"], r["dst"])
           for r in bipartite_interaction_edges(inter, "u", "v").collect()}
    assert got == {(2 * big + 1, 2 * big), (2 * big, 2 * big + 1)}
    assert all(x > 0 for pair in got for x in pair)


def test_pagerank_shuffle_path_matches_broadcast_path(spark, monkeypatch):
    """Above the broadcast-size bound the hint is dropped (a hard
    F.broadcast is never downgraded by Spark) — the stats-planned
    shuffle path must produce identical ranks."""
    from ds_ga1004_bigdata_project_spark.operators import graph as G

    e = [(0, 1), (1, 2), (2, 0), (2, 1), (1, 0), (0, 2)]
    edges = spark.createDataFrame(e, "src long, dst long")
    with_hint = _ranks(pagerank(edges, iters=2))
    monkeypatch.setattr(G, "BROADCAST_STATE_MAX_BYTES", 0)
    without = _ranks(G.pagerank(edges, iters=2))
    assert with_hint.keys() == without.keys()
    for n in with_hint:
        assert with_hint[n] == pytest.approx(without[n], abs=1e-15)


def test_connected_components_labels_min_id(spark):
    from ds_ga1004_bigdata_project_spark.operators.graph import (
        connected_components)

    # two components: {1,2,3} via a chain, {10,11}; direction mixed
    edges = spark.createDataFrame([(2, 1), (2, 3), (11, 10)],
                                  "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    from ds_ga1004_bigdata_project_spark.operators.graph import (
        connected_components)

    chain = [(i, i + 1) for i in range(12)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert set(got.values()) == {0} and len(got) == 13


def test_connected_components_distributed_tier_exceeds_max_iters(spark):
    """A 40-node chain on the DISTRIBUTED tier (driver_edge_max=0) with a
    small max_iters: connected_components must keep iterating to exact
    labels (its 'iterate' contract) instead of returning split components."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        resolve_keep_list)

    chain = [(i, i + 1) for i in range(40)]
    ids = spark.createDataFrame([(i,) for i in range(41)], "id long")
    pairs = spark.createDataFrame(chain, "a long, b long")
    got = {r["id"]: r["keep_id"]
           for r in resolve_keep_list(ids, pairs, max_iters=4,
                                      driver_edge_max=0,
                                      nonconverged="iterate").collect()}
    assert set(got.values()) == {0} and len(got) == 41


def test_resolve_keep_list_warns_or_raises_on_nonconvergence(spark):
    import warnings

    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        resolve_keep_list)

    chain = [(i, i + 1) for i in range(40)]
    ids = spark.createDataFrame([(i,) for i in range(41)], "id long")
    pairs = spark.createDataFrame(chain, "a long, b long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        resolve_keep_list(ids, pairs, max_iters=4, driver_edge_max=0).collect()
    assert any("still changing" in str(w.message) for w in caught)
    with pytest.raises(RuntimeError, match="still changing"):
        resolve_keep_list(ids, pairs, max_iters=4, driver_edge_max=0,
                          nonconverged="raise")


def test_pagerank_tol_early_exit_matches_fixed_k(spark):
    """On the symmetric pair the fixed point is exact after one iteration;
    tol must exit early (identical output, fewer cached states) and a
    tight-tol run must equal the fixed-K values on a non-trivial graph."""
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    caches: list = []
    got = _ranks(pagerank(edges, iters=50, tol=1e-9, caches=caches))
    assert got == {1: 1.0, 2: 1.0}
    # early exit: 50 iterations would persist 50 states; convergence on a
    # regular graph is immediate (delta 0 after iteration 1 or 2).

    e = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)] + [(1, 2), (2, 1)]
    edges2 = spark.createDataFrame(e, "src long, dst long")
    fixed = _ranks(pagerank(edges2, iters=30))
    conv = _ranks(pagerank(edges2, iters=30, tol=1e-12))
    for n in fixed:
        assert conv[n] == pytest.approx(fixed[n], abs=1e-9)


def test_pagerank_unpersists_degree_table_without_cache_handle(spark, monkeypatch):
    """ADVICE r6: handle-less pagerank calls must not pin the degree
    table forever — deg (the only bare persist left in the loop) must be
    unpersisted before return when no caches list is passed."""
    from ds_ga1004_bigdata_project_spark.operators import relational as R

    real = R.persisted
    handles: list = []

    def spy(df):
        out = real(df)
        handles.append(out)
        return out

    monkeypatch.setattr(R, "persisted", spy)
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    pagerank(edges, iters=2).collect()
    assert handles, "pagerank no longer persists deg — update this test"
    for h in handles:
        assert not h.storageLevel.useMemory and not h.storageLevel.useDisk
