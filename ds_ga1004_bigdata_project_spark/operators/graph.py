"""Iterative graph analytics over DataFrame edge lists.

PageRank over the user–item interaction graph is a classic non-factorized
recommendation baseline (ItemRank-style): item importance smoothed by graph
structure rather than raw popularity — heavy users contribute LESS per
interaction because contributions are out-degree-normalized. The reference
ranks items by a factorized model (ALS,
recommender_train.py); this module provides the graph-walk counterpart on
the same interaction relation, plus the generic edge-list PageRank it is
built from.

Scale shape (the textbook distributed PageRank):

* state per iteration is one (node, rank) relation — |V| rows, never
  edges — persisted and counted each round (the standard iterative-
  algorithm checkpoint discipline: lineage stays one iteration deep, the
  planner sees small identical jobs whose generated code is JIT-reused,
  and the superseded state is released immediately);
* the degree/strength table is computed and persisted ONCE (it never
  changes; deriving it in-plan re-ran its 2|E|-row aggregation shuffle
  inside every iteration — measured 3× the whole query), and under the
  no-dangling contract its key set doubles as the node set;
* each iteration is then ONE shuffle keyed by ``dst`` (the contribution
  aggregation, map-side combined) plus explicit |V|-row broadcasts of
  the weight/contribution sides (provably small — hinting skips AQE's
  per-micro-stage replanning, ~30% of iteration wall-clock, while AQE
  stays on to skew-split the dst shuffle on power-law graphs);
* the edge list itself stays IN-PLAN: the CALLER persists its expensive
  upstream (typically a join+distinct over an interaction relation), and
  each iteration re-derives the edges with a map-side cache scan, never
  a shuffle;
* no driver-side control state: convergence loops are fixed-K (the
  common production choice — K=3..10). SCALE.md records the variant
  measurements and the 10× stress ratio (3.33× at 10× edges+vertices).

Nodes with zero out-degree would leak rank mass ("dangling" nodes);
callers pass symmetric or bipartite-both-directions edge lists, where
none exist — the bipartite builder below guarantees this by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Broadcast the |V|-row rank-state relations only while they provably fit
#: (~20 B/row against the session's 64 MB broadcast threshold) — a hard
#: F.broadcast hint is never downgraded by Spark, so past this the joins
#: plan from stats (shuffle join) instead.
BROADCAST_STATE_MAX_BYTES = 64 * 1024 * 1024


def out_degrees(edges: DataFrame, src: str = "src",
                weight: str | None = None) -> DataFrame:
    """(src, deg) out-degree table for a directed edge list — edge count,
    or total outgoing edge WEIGHT (strength) when ``weight`` names a
    column."""
    agg = (F.sum(F.col(weight).cast("double")) if weight
           else F.count(F.lit(1)))
    return edges.groupBy(src).agg(agg.alias("deg"))


def pagerank(edges: DataFrame, iters: int, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             weight: str | None = None,
             caches: list[DataFrame] | None = None,
             tol: float | None = None) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list → (node, rank).

    Init rank = 1.0 per node (the mass-conserving convention: ranks sum
    to |V| when no dangling nodes exist); update
    ``rank' = (1-d) + d · Σ_{in-edges} rank(src)/deg(src)``. With a
    ``weight`` column the walk is weighted: each in-edge contributes
    ``rank(src) · w / strength(src)`` (strength = total outgoing weight),
    the standard weighted-PageRank transition — mass conservation holds
    because every node's outgoing shares sum to 1 either way.

    Every node must have out-degree ≥ 1 and the caller should persist
    ``edges``'s upstream (see module docstring). The node set is the
    degree table's key set — a contract-violating dangling node (in-edges
    only) is DROPPED from the output rather than reported with a bogus
    base rank. Each iteration pre-merges
    rank/deg into one |V|-row weight table so the edge-side work is ONE
    join + ONE map-side-combined aggregation; the weight side is tiny
    relative to edges — AQE turns the join into a broadcast from runtime
    stats, and at graph sizes where |V| no longer broadcasts the same
    plan degrades gracefully to a co-partitioned shuffle join. The final
    rank state is persisted; its handle appends to ``caches`` under the
    repo's cache-ownership contract (eviction-safe: pure joins/aggs
    recompute deterministically). When ``caches`` is None the degree
    table is unpersisted before returning (the returned plan reads only
    the final rank state, which recomputes deterministically if evicted)
    — repeated handle-less calls must not accumulate pinned relations.

    ``tol``: convergence-aware early termination. ``iters`` stays the
    hard cap, but when ``max |rank − prev_rank| < tol`` the loop exits
    early with the converged state. The check is FREE: the per-iteration
    cache-materialization action (previously a bare ``count()``) becomes
    a one-row max-delta aggregate over the state that carries the
    previous rank alongside the new one — same job count, same shuffle
    shape, and when the graph converges before ``iters`` the remaining
    iterations (a full dst-keyed shuffle each) are skipped. ``tol=None``
    preserves exact fixed-K semantics."""
    from .relational import lineage_cut, persisted

    # The degree table never changes across iterations — persist it (|V|
    # rows; eagerly, serially: left lazy, every iteration's job re-runs
    # its 2|E|-row aggregation shuffle, which measured 3× the whole
    # query). Under the no-dangling contract every node appears as a
    # src, so deg's key set IS the node set — no separate union-distinct
    # job. The edge list itself stays IN-PLAN: a map-side projection of
    # whatever the caller persisted (contract above), so re-deriving it
    # per iteration costs one cache scan, not a shuffle.
    deg = persisted(out_degrees(edges, src, weight))
    n_nodes = deg.count()
    if caches is not None:
        caches.append(deg)
    # Explicit broadcast hints on the |V|-row weight/contribution sides
    # skip AQE's wait-for-runtime-stats replanning on every micro-stage
    # of the iteration (~30% of iteration wall-clock measured) — but a
    # hard hint is never downgraded, so it is applied ONLY while the
    # rank state is provably broadcast-sized (measured from the degree
    # count we compute anyway; ~20 B/row against the session's 64 MB
    # broadcast threshold). Past that the joins plan from stats like any
    # other — the graceful shuffle-join degradation the module promises.
    # AQE stays ON throughout for what it is good at here: skew-
    # splitting the per-dst contribution shuffle on power-law graphs.
    hint = (F.broadcast if n_nodes * 20 <= BROADCAST_STATE_MAX_BYTES
            else (lambda df: df))
    nodes = deg.select(F.col(src).alias("node"))
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    prev: DataFrame | None = None
    for _ in range(iters):
        w = (ranks.join(hint(deg), ranks["node"] == deg[src])
             .select(F.col("node").alias("_wn"),
                     (F.col("rank") / F.col("deg")).alias("_w")))
        share = (F.col("_w") * F.col(weight).cast("double") if weight
                 else F.col("_w"))
        contrib = (edges.join(hint(w), F.col(src) == F.col("_wn"))
                   .groupBy(dst)
                   .agg(F.sum(share).alias("c")))
        new_rank = (F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0)))
        # lineage_cut, not bare persist: the rank state's logical plan
        # otherwise grows one full iteration deeper per round (persist
        # caches data but never shrinks the plan), and long runs drown
        # the driver in plan analysis/printing before any shuffle runs.
        if tol is None:
            # Fixed-K path: state is (node, rank); the eager checkpoint
            # is the materializing action.
            state = lineage_cut(
                nodes.join(hint(contrib),
                           nodes["node"] == contrib[dst], "left")
                .select("node", new_rank.alias("rank")))
            delta = None
        else:
            # Convergence path: the state carries the previous rank, and
            # the SAME materializing action returns max |Δrank| — no
            # extra job relative to the eager cut above.
            state = lineage_cut(
                ranks.join(hint(contrib),
                           ranks["node"] == contrib[dst], "left")
                .select("node", new_rank.alias("rank"),
                        F.col("rank").alias("_prev")),
                eager=False)
            delta = state.agg(
                F.max(F.abs(F.col("rank") - F.col("_prev")))).first()[0]
        prev = state
        ranks = state.select("node", "rank")
        if delta is not None and delta < tol:
            break
    if caches is not None:
        caches.append(prev if prev is not None else ranks)
    else:
        # No cache handle requested: release the pinned degree table now
        # (the returned plan reads only the final rank state; eviction is
        # safe — pure joins/aggs recompute deterministically).
        deg.unpersist()
    return ranks


def bipartite_interaction_edges(inter: DataFrame, left_col: str,
                                right_col: str) -> DataFrame:
    """Both-direction edge list for a bipartite interaction relation,
    with the two id spaces disambiguated by integer encoding: left nodes
    → ``2·id + 1``, right nodes → ``2·id`` (cheaper than string tags at
    shuffle time; decode a right node with ``node / 2``). No dangling
    nodes by construction — every edge exists in both directions. Pass a
    PERSISTED ``inter`` (half the rows of the edge list it derives —
    cheaper to hold than the edges themselves; both directions are
    map-side projections of the same cached rows). The ids are widened
    to long BEFORE the ×2 arithmetic — a 32-bit id column with ids
    ≥ 2³⁰ would otherwise silently wrap negative pre-cast and collide
    node encodings."""
    l_enc = F.col(left_col).cast("long") * 2 + 1
    r_enc = F.col(right_col).cast("long") * 2
    fwd = inter.select(l_enc.alias("src"), r_enc.alias("dst"))
    rev = inter.select(r_enc.alias("src"), l_enc.alias("dst"))
    return fwd.union(rev)


def dangling_nodes(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Diagnostic: nodes that appear as a destination but never as a
    source — the "dangling" nodes that violate :func:`pagerank`'s
    contract (they would absorb rank mass and then be dropped from the
    output). Run it once on a NEW edge source before wiring it into an
    iterative job; an empty result certifies the contract. One anti-join
    of two |V|-row projections — metadata-scale."""
    srcs = edges.select(F.col(src).alias("node")).distinct()
    return (edges.select(F.col(dst).alias("node")).distinct()
            .join(srcs, "node", "left_anti"))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iters: int = 8) -> DataFrame:
    """(node, component) labeling of the undirected graph under ``edges``
    (direction is ignored; both orientations are considered), with
    ``component`` = the smallest node id in the component — the public
    graph-API form of the dedup cluster resolver
    (:func:`~.dedup.resolve_keep_list`), sharing its adaptive two-tier
    engine: metadata-sized edge lists collapse via a driver union-find on
    one bounded collect, larger ones run frontier-only min-label
    propagation where the iterating relation is |edge endpoints| rows,
    never the node universe.

    Unlike the dedup resolver (whose clusters are small and dense by
    construction), a public graph API sees arbitrary topologies — long
    chains can exceed ``max_iters`` propagation steps. The contract here
    is EXACT labels, so the distributed tier runs in ``"iterate"`` mode:
    ``max_iters`` is the batch-sizing hint, and propagation continues
    until a full batch changes nothing (labels strictly decrease toward
    the component minimum, so termination within the true diameter is
    guaranteed) rather than silently returning split components."""
    from .dedup import resolve_keep_list

    nodes = (edges.select(F.col(src).alias("id"))
             .union(edges.select(F.col(dst).alias("id")))
             .distinct())
    pairs = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    out = resolve_keep_list(nodes, pairs, max_iters=max_iters,
                            nonconverged="iterate")
    return out.select(F.col("id").alias("node"),
                      F.col("keep_id").alias("component"))


def triangle_participation(edges: DataFrame, src: str = "src",
                           dst: str = "dst",
                           caches: list | None = None) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (community density, spam/bot subgraph detection).
    ``edges`` must be the canonical undirected relation: distinct,
    ``src < dst``.

    Algorithm: degree-ordered orientation + edge-iterator over compact
    adjacency arrays (the standard distributed-triangle design — Suri &
    Vassilvitskii 2011 lineage). Every edge directs from its
    (degree, id)-smaller endpoint to the larger, which (a) makes each
    triangle appear exactly once — as the closure of its base edge
    (a, b) by the common out-neighborhood of a and b — and (b) bounds
    every out-degree at O(√m) on any graph, so the oriented adjacency
    array of even a 10⁸-degree hub is √m-sized. The per-edge work is
    ONE in-row ``array_intersect`` of two sorted O(√m) arrays; the
    O(m^1.5) wedge stream of the naive formulation (measured 3× slower
    wall at sf0.1 and OOM-prone — it materializes Σ outdeg² rows) never
    exists as data.

    Plan: one degree agg, two joins to attach endpoint degrees, one
    collect_list agg to the |V|-row oriented adjacency relation, two
    adjacency joins back onto the edge list (node-keyed; AQE broadcasts
    while the adjacency relation fits, shuffles when it doesn't), then
    explode(intersect) → per-node count. The only corpus-shaped shuffles
    are on node keys; nothing ever materializes wedges.

    ``caches`` receives the persisted adjacency relation (it feeds both
    endpoint joins).

    Returns (node, n_triangles), one row per node in ≥1 triangle."""
    # the edge relation appears three times in the plan (degree union ×2
    # + orientation join) but is NOT persisted: the identical exchange
    # subtrees dedupe via ReusedExchange, which measured FASTER than an
    # InMemoryRelation round-trip (persist cost > recompute-from-reuse).
    deg = (edges.select(F.col(src).alias("n"))
           .unionAll(edges.select(F.col(dst).alias("n")))
           .groupBy("n").agg(F.count("*").alias("deg")))
    e = (edges
         .join(deg.select(F.col("n").alias(src),
                          F.col("deg").alias("_dsrc")), src)
         .join(deg.select(F.col("n").alias(dst),
                          F.col("deg").alias("_ddst")), dst))
    s_first = (F.struct(F.col("_dsrc"), F.col(src))
               < F.struct(F.col("_ddst"), F.col(dst)))
    o = e.select(
        F.when(s_first, F.col(src)).otherwise(F.col(dst)).alias("s"),
        F.when(s_first, F.col(dst)).otherwise(F.col(src)).alias("d"))
    adj = (o.groupBy("s")
            .agg(F.sort_array(F.collect_list("d")).alias("nbrs")))
    if caches is not None:
        from .relational import persisted
        adj = persisted(adj)
        caches.append(adj)
    # The oriented edge list IS the adjacency relation exploded (o is
    # distinct and collect_list keeps every neighbor), so the closure
    # regenerates (s, d, N⁺(s)) with one IN-ROW explode of the persisted
    # adjacency instead of joining the o-side pipeline back onto it:
    # the whole upstream (degree agg + orientation joins + regroup) now
    # executes exactly once — into ``adj`` — and the closure pays ONE
    # node-keyed join (for N⁺(d)) instead of two (r14 interleaved warm-
    # JVM A/B at sf0.1: min 15.1 → 9.8 s, median 30 → 10 s on a degraded
    # box, identical values; plan diff: the second adjacency join and
    # the duplicated edge/degree/orientation subtree are gone).
    closed = (adj
              .select(F.col("s"), F.col("nbrs").alias("_na"),
                      F.explode("nbrs").alias("d"))
              .join(adj.select(F.col("s").alias("d"),
                               F.col("nbrs").alias("_nb")), "d")
              .select(F.col("s"), F.col("d"),
                      F.array_intersect("_na", "_nb").alias("_c"))
              .filter(F.size("_c") > 0))
    # per-node contributions in ONE pass over the closed edges: a
    # union-of-three-projections over `tri` would re-execute the whole
    # closure join per branch (no exchange sits at the union point to
    # reuse). Here s and d each earn |intersection| triangles and every
    # common neighbor earns 1, emitted as one in-row explode.
    contrib = (closed.select(F.explode(F.concat(
        F.array(F.struct(F.col("s").alias("node"),
                         F.size("_c").cast("long").alias("w"))),
        F.array(F.struct(F.col("d").alias("node"),
                         F.size("_c").cast("long").alias("w"))),
        F.transform(F.col("_c"),
                    lambda x: F.struct(x.alias("node"),
                                       F.lit(1).cast("long")
                                        .alias("w"))))).alias("p"))
        .select(F.col("p.node").alias("node"), F.col("p.w").alias("w")))
    return contrib.groupBy("node").agg(F.sum("w").alias("n_triangles"))
