"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — a 100 TB corpus runs them as a funnel:

1. :func:`exact_dedup` — hash-groupBy on md5(text): one shuffle of (hash, id).
2. :func:`fingerprint_dedup` — md5 of the canonical token bag: catches
   reorder/duplicate-word near-copies at the same cost as exact.
3. :func:`ngram_jaccard_pairs` — inverted-index candidate join on shared
   shingles + exact Jaccard. No O(n²): only docs sharing a shingle ever meet.
4. :func:`minhash_lsh_pairs` / :func:`simhash` — sketch-based: constant-size
   signatures per doc, banding buckets as join keys. The only tier whose cost
   is independent of document length at compare time.

All tiers emit (smaller_id, larger_id) candidate pairs or keep-lists; a final
connected-components / min-id-per-group step picks survivors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import content_fingerprint, word_shingles, ws_tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = True) -> DataFrame:
    """Exact duplicate groups via hash-groupBy (one shuffle of 16-byte keys).

    Returns one row per distinct content: (content_hash, keep_id = min id,
    dup_cnt). At scale: only (hash, id) pairs shuffle, never the text."""
    c = F.col(text_col)
    if normalize:
        c = F.lower(F.trim(c))
    return (
        df.select(F.md5(c).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def fingerprint_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Bag-of-words-canonical dedup: same shuffle shape as exact_dedup but
    invariant to token order/repetition (see
    :func:`~..functions.text.content_fingerprint`)."""
    return (
        df.select(content_fingerprint(F.col(text_col)).alias("fingerprint"),
                  F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        min_jaccard: float = 0.0,
                        max_doc_freq: int | None = None,
                        caches: list[DataFrame] | None = None) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, candidate-generated
    through an inverted-index self-join (docs meet only on shared shingles).

    Plan shape: explode distinct shingles → self-equi-join on shingle
    (AQE handles hot shingles via skew-join splitting; stopword-like shingles
    can be pre-filtered by document frequency) → count intersections per pair
    → join per-doc set sizes → jaccard = inter / (|a|+|b|-inter).

    Output: (a, b, inter_cnt, a_cnt, b_cnt, jaccard) with a < b. Exact — no
    sketch error; cost scales with shared-shingle pair count, not n².

    ``max_doc_freq`` prunes postings for shingles appearing in more than that
    many documents — the inverted-index stop-list. A shingle shared by f docs
    contributes f² candidate pairs; boilerplate shingles (headers, license
    text) make the join quadratic without this. Pruning only drops
    *candidate generation* via those shingles: with the cap engaged the
    pruned postings count the sub-cap intersection share, and the
    stop-listed share is restored exactly by a per-doc stop-shingle-array
    correction (``array_intersect`` over arrays bounded by the number of
    distinct stop shingles), so every emitted jaccard is identical to the
    uncapped value. (Round 10 fix — VERDICT r9 #5's test caught the
    prior form counting intersections over the pruned postings only,
    which underestimated jaccard for any pair sharing a stop-listed
    shingle and severed true pairs far beyond the documented trade.)
    NB: a pair sharing ONLY ultra-common shingles is still missed —
    that's the standard recall trade-off; size the cap ≫ expected
    dup-clique size."""
    from .relational import fan_out_small_scan

    tokens = ws_tokens(F.col(text_col))
    # Single-small-file corpora serialize the shingle projection (one
    # input split = one task for the HOF-heavy pipeline, SCALE.md
    # §in-suite-inflation); fan out conditionally — a no-op at scale.
    shingled = fan_out_small_scan(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(tokens, n)).alias("shingles"),
    )
    # The shingle projection (interpreted higher-order fns) feeds three plan
    # branches (sizes + both self-join sides); persist so it computes once.
    # Cache ownership: pass ``caches`` to receive the handle and unpersist
    # after the pair output is materialized (same contract as
    # minhash_banded_pairs).
    from pyspark import StorageLevel
    shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(shingled)
    sizes = shingled.select("id", F.size("shingles").alias("set_size"))
    posting = shingled.select("id", F.explode("shingles").alias("shingle"))
    # Threshold-gated LENGTH prune (r14 optimization round, guide §3.2 /
    # PPJoin's length lemma, the q173 discipline): J ≥ t implies
    # t·max(|A|,|B|) ≤ min(|A|,|B|), so when the caller sets a positive
    # ``min_jaccard`` the candidate self-join can drop every collision
    # of a size-incompatible pair BEFORE the per-pair intersection
    # aggregation — those pairs exit via the final jaccard filter anyway,
    # so the output is identical row-for-row. The prune costs one int
    # per posting row; the rationalized p/q ≤ t underestimates t, which
    # only weakens the prune (never drops a qualifying pair). int64
    # arithmetic throughout (int32 products overflow under ANSI).
    _len_pred = None
    if min_jaccard > 0:
        _lp = F.lit(math.floor(min_jaccard * 1_000_000_000)).cast("long")
        _lq = F.lit(1_000_000_000).cast("long")
        posting = shingled.select(
            "id", F.size("shingles").alias("_sz"),
            F.explode("shingles").alias("shingle"))

        def _len_pred(x, y):  # noqa: E731 — join-side size compatibility
            sx = F.col(f"{x}._sz").cast("long")
            sy = F.col(f"{y}._sz").cast("long")
            return _lp * F.greatest(sx, sy) <= _lq * F.least(sx, sy)
    if max_doc_freq is not None:
        # Stop-list tier: sub-cap postings only GENERATE candidates (and
        # count the sub-cap share of the intersection map-side, exactly
        # as the uncapped join would); the stop-listed share is then
        # restored by an EXACT correction term — each doc's array of
        # stop shingles (at most |distinct stop shingles| long, tiny by
        # definition: they're the handful of boilerplate keys the cap
        # exists to remove) left-joins onto the candidate pairs and
        # array_intersect adds back what pruning hid. Emitted jaccards
        # therefore match the uncapped computation pair-for-pair without
        # ever shipping full shingle arrays per pair (the naive
        # verify-against-full-sets plan measured 10× the shuffle of the
        # uncapped join at 10× corpus — the correction term is bounded
        # by candidates × stop-shingles-per-doc instead).
        dfreq = (posting.groupBy("shingle")
                 .agg(F.count(F.lit(1)).alias("df")))
        rare = dfreq.filter(F.col("df") <= max_doc_freq).select("shingle")
        stop = dfreq.filter(F.col("df") > max_doc_freq).select("shingle")
        cand_posting = posting.join(rare, "shingle")
        a, b = cand_posting.alias("a"), cand_posting.alias("b")
        _cond = (F.col("a.shingle") == F.col("b.shingle")) \
            & (F.col("a.id") < F.col("b.id"))
        if _len_pred is not None:
            _cond = _cond & _len_pred("a", "b")
        pairs_sub = (
            a.join(b, _cond)
            .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
            .agg(F.count(F.lit(1)).alias("_inter_sub"))
        )
        stop_arr = (posting.join(stop, "shingle")
                    .groupBy("id")
                    .agg(F.collect_list("shingle").alias("_stop")))
        pairs = (
            pairs_sub
            .join(stop_arr.select(F.col("id").alias("a"),
                                  F.col("_stop").alias("_sa")), "a", "left")
            .join(stop_arr.select(F.col("id").alias("b"),
                                  F.col("_stop").alias("_sb")), "b", "left")
            .select("a", "b",
                    (F.col("_inter_sub")
                     + F.when(F.col("_sa").isNotNull()
                              & F.col("_sb").isNotNull(),
                              F.size(F.array_intersect("_sa", "_sb")))
                        .otherwise(F.lit(0))).alias("inter_cnt")))
    else:
        a, b = posting.alias("a"), posting.alias("b")
        _cond = (F.col("a.shingle") == F.col("b.shingle")) \
            & (F.col("a.id") < F.col("b.id"))
        if _len_pred is not None:
            _cond = _cond & _len_pred("a", "b")
        pairs = (
            a.join(b, _cond)
            .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
            .agg(F.count(F.lit(1)).alias("inter_cnt"))
        )
    out = (
        pairs
        .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("set_size", "a_cnt"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("set_size", "b_cnt"), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter_cnt") /
                    (F.col("a_cnt") + F.col("b_cnt") - F.col("inter_cnt")), 6),
        )
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out.select("a", "b", "inter_cnt", "a_cnt", "b_cnt", "jaccard")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3, num_hashes: int = 32,
                      max_jaccard_distance: float = 0.8, seed: int = 42) -> DataFrame:
    """Approximate near-dup pairs via MinHash + LSH banding
    (``pyspark.ml.feature.MinHashLSH`` over a HashingTF shingle vector).

    The scale path when even the inverted-index join is too big: signatures are
    ``num_hashes`` ints per doc regardless of length, and
    ``approxSimilarityJoin`` only compares docs sharing an LSH band bucket.
    Seeded → deterministic, but hash-specific → rows-only harness check."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    tokens = ws_tokens(F.col(text_col))
    docs = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(tokens, n)).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    feat = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hashes, seed=seed)
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, max_jaccard_distance,
                                        distCol="jaccard_distance")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("a"),
            F.col("datasetB.id").alias("b"),
            F.round(1 - F.col("jaccard_distance"), 6).alias("approx_jaccard"),
        )
    )


#: LSH bucket size above which candidate-pair expansion switches from the
#: in-row flatten(transform(...)) (whole quadratic pair set in ONE row) to a
#: within-bucket self-join (same pair set, streamed). 512 members caps the
#: in-row path at ~131k 16-byte pair structs ≈ 2 MB per row — still far
#: inside the single-value limit. Chosen by the r9 cap sweep (VERDICT r8
#: #3; SCALE.md "LSH cap sweep"): q64 at sf0.1 measured 3.73/3.49/2.90/
#: 2.97 s for caps 128/256/512/1024 (min-of-two, fresh session each, q06
#: control flat) — the knee is 512; 1024 buys nothing further and doubles
#: the worst-case in-row value. Pair-SET equality between the two paths is
#: pinned by test_minhash_hot_bucket_join_path_matches_inrow_path at cap=1.
_LSH_BUCKET_EXPAND_MAX = 512


def minhash_banded_pairs(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 5,
                         bands: int = 3, rows_per_band: int = 3,
                         min_jaccard: float = 0.0, seed: int = 42,
                         caches: list[DataFrame] | None = None) -> DataFrame:
    """Native MinHash + LSH banding in pure DataFrame ops (no ml, no UDF).

    Classic construction: k = bands·rows_per_band minhashes per doc
    (min over shingles of seeded xxhash64); each band of ``rows_per_band``
    signature values hashes to one bucket key; docs sharing ANY band bucket
    become candidates (P[candidate] ≈ 1-(1-j^r)^b); candidates are then
    verified with EXACT Jaccard over their shingle sets.

    Plan shape at scale: per-doc signature is k longs (constant, regardless of
    document length); candidate generation shuffles (band_idx, band_hash, id)
    — 24-byte rows — ONCE into per-bucket groups; only verified candidate
    pairs ever touch shingle arrays again. This is the 100 TB dedup tier:
    cost is O(docs·k + candidate_pairs), never O(n²).

    Cache ownership: the shingle projection is persisted (it feeds the
    signature build AND both verify-join sides). Pass ``caches`` to receive
    the handle and unpersist once the pair output has been materialized
    downstream; otherwise the block lives until the session clears it."""
    from pyspark import StorageLevel

    k = bands * rows_per_band
    tokens = ws_tokens(F.col(text_col))
    # Shingles are hashed to int64 AT CONSTRUCTION, and straight off the
    # zipped token STRUCTS — xxhash64 hashes the n token fields directly,
    # so no concatenated shingle string is ever allocated (measured ~25%
    # off the corpus scan; it also cannot alias token boundaries the way a
    # joined string can). Everything downstream — the persisted canonical
    # set, the k minhash functions (re-hash the 8-byte long with
    # per-function seeds), the exact-Jaccard verify (array_intersect over
    # longs) — works on fixed-width integers. Jaccard over the hashed sets
    # equals Jaccard over the token-tuple sets up to xxhash64 collisions
    # (~2⁻⁶⁴ per pair — far below any dedup threshold's sensitivity), the
    # persist is ~5× smaller than string shingles, and the verify compares
    # longs instead of variable-length strings. (Arithmetic families like
    # h1+i·h2 for the k functions would be cheaper still but overflow
    # under ANSI mode, Spark 4's default.)
    shifted = [F.slice(tokens, i + 1, 1 << 30) for i in range(n)]
    hashed = F.transform(F.arrays_zip(*shifted),
                         lambda s: F.xxhash64(s, F.lit(seed)))
    shingle_hashes = F.when(
        F.size(tokens) < n, F.array().cast("array<bigint>")
    ).otherwise(F.slice(hashed, 1, F.size(tokens) - n + 1))
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingle_hashes).alias("shingles"),
    ).filter(F.size("shingles") > 0).persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(shingled)

    # All k minhashes in ONE fold over the shingle array (k separate
    # array_min(transform(...)) passes allocated k intermediate arrays per
    # doc and re-traversed the set k times — measured ~2× slower): the
    # accumulator is the running k-vector of minima, updated per shingle.
    _LMAX = (1 << 63) - 1
    mh = F.expr(f"""aggregate(
        shingles, array_repeat({_LMAX}L, {k}),
        (acc, h) -> zip_with(acc, sequence(0, {k - 1}),
                             (m, i) -> least(m, xxhash64(h, i + {seed}))),
        acc -> acc)""")
    sigs = shingled.select("id", mh.alias("mh"))
    band_rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("mh")[b * rows_per_band + r]
                         for r in range(rows_per_band)]).alias("bucket"),
        )
        for b in range(bands)
    ]
    posting = sigs.select(
        "id", F.explode(F.array(*band_rows)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # Candidate pairs by per-bucket grouping, not a posting self-join: ONE
    # shuffle of the 24-byte posting rows into (band, bucket) groups, then
    # in-place pair expansion over the sorted member list (i<j), vs the
    # self-join's two shuffled sides + join. Per-bucket work is quadratic
    # in bucket size either way — that is LSH's contract (bands/rows are
    # sized so buckets stay small) — but the BLAST RADIUS must not be: the
    # in-row expansion holds all B·(B-1)/2 pair structs of a bucket inside
    # ONE row, so a degenerate hot bucket (tiny-vocabulary corpora collide
    # thousands of docs into one bucket — q56's own fixture note) would hit
    # the 2 GB single-value limit / executor OOM where a join only ever
    # STREAMS output rows (ADVICE r7). Split by size instead of capping
    # silently: buckets ≤ _LSH_BUCKET_EXPAND_MAX members (≤ ~32k pair
    # structs ≈ 512 KB in-row — safe) take the cheap in-row path; larger
    # buckets re-explode their member list and pair via a within-bucket
    # equi-self-join, which is the same quadratic candidate SET (exactness
    # preserved, no silent drop) held only in streamed join output, never
    # one value.
    buckets = (posting.groupBy("band", "bucket")
               .agg(F.array_sort(F.collect_list("id")).alias("ids"))
               .filter(F.size("ids") > 1))
    small_b = buckets.filter(F.size("ids") <= _LSH_BUCKET_EXPAND_MAX)
    hot_b = buckets.filter(F.size("ids") > _LSH_BUCKET_EXPAND_MAX)
    pair_arr = F.expr("""flatten(transform(
        sequence(0, size(ids) - 2),
        i -> transform(slice(ids, i + 2, size(ids)),
                       x -> struct(ids[i] AS a, x AS b))))""")
    cand_small = (small_b.select(F.explode(pair_arr).alias("p"))
                  .select("p.a", "p.b"))
    hot_members = hot_b.select(
        "band", "bucket", F.explode("ids").alias("id"))
    cand_hot = (hot_members.alias("x")
                .join(hot_members.alias("y"), ["band", "bucket"])
                .filter(F.col("x.id") < F.col("y.id"))
                .select(F.col("x.id").alias("a"), F.col("y.id").alias("b")))
    candidates = cand_small.unionByName(cand_hot).distinct()
    sh_a = shingled.select(F.col("id").alias("a"), F.col("shingles").alias("sh_a"))
    sh_b = shingled.select(F.col("id").alias("b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "a").join(sh_b, "b")
        .withColumn("inter_cnt", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter_cnt") /
                    (F.size("sh_a") + F.size("sh_b") - F.col("inter_cnt")), 6))
        .select("a", "b", "jaccard")
    )
    if min_jaccard > 0:
        verified = verified.filter(F.col("jaccard") >= min_jaccard)
    return verified


#: Edge count at or below which duplicate-cluster resolution runs as ONE
#: driver-side union-find over the collected edge list instead of iterative
#: distributed propagation. Edges are two longs each — 100k edges is ~2 MB,
#: metadata scale (the edge count is already materialized for cache
#: correctness, so the dispatch is free). Above it: the distributed loop.
RESOLVE_DRIVER_EDGE_MAX = 100_000


def resolve_keep_list(ids: DataFrame, pairs: DataFrame,
                      max_iters: int = 8,
                      driver_edge_max: int = RESOLVE_DRIVER_EDGE_MAX,
                      nonconverged: str = "warn") -> DataFrame:
    """Turn near-duplicate PAIRS into a per-document keep decision via
    min-label propagation (connected-components-lite).

    Converges in O(diameter) propagation steps — near-dup clusters are small
    and dense, so ``max_iters=8`` covers chains of length 8+ (typical
    clusters converge in 1-2). Driver-side job count is minimized two ways
    (VERDICT r2 #7 — q64 was dominated by fixed per-job overhead):

    - the FIRST propagation is folded into initialization: labels seed with
      ``min(id, min(neighbor))`` directly from the edge list, so star-shaped
      clusters (the common case) are already converged before the loop;
    - propagation runs in batches of two lazy steps per convergence check —
      labels only decrease, so "no change across a batch" still detects
      convergence exactly, with half the count() actions.

    Input: ``ids`` (col ``id``), ``pairs`` (cols ``a``,``b``). Output:
    (id, keep_id, is_kept) — one row per doc, survivor = min id per cluster.
    All joins/aggs, no driver state — and the ITERATION ONLY EVER TOUCHES
    DOCS ADJACENT TO A DUP EDGE: a doc with no candidate pair keeps itself
    by definition, so the label table in the loop is |edge endpoints| rows
    (typically a few % of the corpus), not |corpus|. Untouched docs are
    stitched back with one final left join. At 100 TB that is the
    difference between iterating over the dedup frontier and re-shuffling
    the whole corpus every round.

    ``max_iters`` bounds the distributed loop; on a graph whose diameter
    exceeds it the labels would still be moving when the loop exhausts —
    silently returning them would split components. ``nonconverged``
    picks the policy for that case: ``"warn"`` (default — dedup clusters
    are small/dense and the seeded init already covers stars, so hitting
    the bound is an anomaly worth surfacing, not failing a 100 TB job
    over), ``"raise"`` (strict callers), or ``"iterate"`` (keep batching
    until ``changed == 0`` — labels strictly decrease and are bounded
    below by the component minimum, so termination within the true
    diameter is guaranteed; :func:`~.graph.connected_components`, whose
    contract is EXACT labels on arbitrary public graphs, uses this). The
    detection is free: it reuses the batch-convergence count the loop
    already computes."""
    from pyspark import StorageLevel

    # Materialize the (possibly expensive) pair-finding ONCE, in its single
    # undirected orientation — the iteration must never re-trigger upstream
    # minhash/jaccard pipelines, and neither dispatch tier needs the
    # doubled edge list materialized (union-find is orientation-blind; the
    # distributed tier derives both orientations from this cache in-plan).
    #
    # CACHE OWNERSHIP: if the CALLER already persisted ``pairs``, reuse
    # that cache and never unpersist it. Re-persisting `select("a","b")`
    # of an (a,b)-only cached frame registers a TRIVIAL-PROJECTION plan
    # that `sameResult`s the caller's, and unpersisting it evicts the
    # caller's entry too — every later plan over the caller's handle then
    # silently recomputes the whole upstream pipeline from the source
    # (measured: cdc_overlap_clusters lost all cache substitution, 16
    # parquet scans in one query).
    caller_cached = (pairs.storageLevel.useMemory
                     or pairs.storageLevel.useDisk)
    pairs_u = pairs.select("a", "b")
    if not caller_cached:
        pairs_u = pairs_u.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = pairs_u.count()

    if n_edges <= driver_edge_max:
        # Small-edge tier (the AUC/ranks adaptive-dispatch pattern): the
        # verified dup-edge list is almost always tiny relative to the
        # corpus — collect it (metadata-sized by the guard above), run exact
        # path-compressed union-find on the driver, ship the per-touched-doc
        # keep table back as ONE broadcast-joinable mapping. Replaces the
        # whole iterative join loop (lineage cuts + convergence counts) with
        # a single tiny join; results identical to full propagation (exact
        # CC either way, survivor = min id per component).
        try:
            rows = pairs_u.collect()
        finally:
            if not caller_cached:
                pairs_u.unpersist()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ra, rb = find(r["a"]), find(r["b"])
            if ra != rb:
                parent[ra] = rb
        comp_min: dict = {}
        members = set(parent) | {find(k) for k in parent}
        for node in members:
            root = find(node)
            comp_min[root] = min(comp_min.get(root, node), node)
        mapping = [(node, comp_min[find(node)]) for node in members]
        id_t = ids.schema["id"].dataType.simpleString()
        keep_df = ids.sparkSession.createDataFrame(
            mapping, schema=f"id {id_t}, keep_id {id_t}")
        return (ids.join(F.broadcast(keep_df), "id", "left")
                .select(F.col("id"),
                        F.coalesce(F.col("keep_id"), F.col("id"))
                        .alias("keep_id"))
                .withColumn("is_kept", F.col("id") == F.col("keep_id")))

    # Distributed tier: both edge orientations, derived IN-PLAN from the
    # cached single-orientation pair list (a map-side cache scan per use,
    # never a second materialization).
    edges = (pairs_u.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(pairs_u.select(F.col("b").alias("src"),
                                         F.col("a").alias("dst"))))

    def propagate(lbl: DataFrame) -> DataFrame:
        neighbor_min = (edges.join(lbl, edges.dst == lbl.id)
                        .groupBy("src").agg(F.min("keep_id").alias("nbr_min")))
        return (lbl.join(neighbor_min, lbl.id == neighbor_min.src, "left")
                .select(F.col("id"),
                        F.least(F.col("keep_id"),
                                F.coalesce(F.col("nbr_min"), F.col("keep_id")))
                        .alias("keep_id")))

    # Lineage MUST be cut every batch: each propagate() embeds the label
    # plan twice (join left side + inside neighbor_min), so without
    # truncation the LOGICAL plan quadruples per batch — exponential
    # analysis cost that OOMs the driver long before any data moves. The
    # eager checkpoint doubles as the batch's materializing action.
    from .relational import lineage_cut

    # Seeded initialization over the TOUCHED set only: label(src) =
    # min(src, min(neighbors)) — identity labels + one propagation, one job,
    # and star-shaped clusters (the common case) are already converged.
    labels = lineage_cut(
        edges.groupBy("src").agg(F.min("dst").alias("nbr_min"))
        .select(F.col("src").alias("id"),
                F.least(F.col("src"), F.col("nbr_min")).alias("keep_id")))
    steps_done = 1
    # Loop-scoped shuffle width (r15, VERDICT r14 next-round #1b — the
    # subword _loop_confs pattern, with AQE kept ON: the label-propagation
    # shuffles are frontier-scale and can be skewed by hub components, so
    # skew splitting must stay live, unlike the fixed-size vocab loop).
    # Width follows the MEASURED partition count of the cached pair
    # relation — data-sized, never a constant: at 100 TB the edge cache
    # holds hundreds of scan partitions and the loop inherits them; on a
    # fixture it is 1-2, so the per-batch jobs stop paying 32-partition
    # scheduling for KB-sized frontiers. Saved/restored exactly (the
    # conftest tripwire enforces restoration).
    spark = ids.sparkSession
    _width_key = "spark.sql.shuffle.partitions"
    _saved_width = spark.conf.get(_width_key)
    spark.conf.set(_width_key,
                   str(max(1, pairs_u.rdd.getNumPartitions())))
    try:
        # None = no convergence check has run yet. In "iterate" mode that
        # counts as NOT converged (ADVICE r7: with max_iters <= 1 the old
        # `changed not in (None, 0)` guard skipped the loop entirely and
        # returned seeded-init labels — one implicit propagation — with no
        # convergence check, silently splitting components despite the
        # exact-labels contract). The loop must run at least one batch
        # before "iterate" trusts convergence.
        changed = None
        while steps_done < max_iters or (nonconverged == "iterate"
                                         and changed != 0):
            batch = (min(2, max_iters - steps_done)
                     if steps_done < max_iters else 2)
            updated = labels
            for _ in range(batch):
                updated = propagate(updated)
            # Lazy cut (r15): the convergence count is the batch's
            # materializing action — the propagation executes and
            # checkpoints INSIDE the count job instead of paying a
            # dedicated checkpoint job first (lineage_cut's documented
            # eager=False case; per-batch jobs 2 → 1, plan depth
            # unchanged once materialized).
            updated = lineage_cut(updated, eager=False)
            changed = (updated.alias("u")
                       .join(labels.alias("l"), "id")
                       .filter(F.col("u.keep_id") != F.col("l.keep_id")).count())
            labels = updated
            steps_done += batch
            if changed == 0:
                break
        if changed not in (None, 0):
            msg = (f"resolve_keep_list: labels still changing after "
                   f"{steps_done} propagation steps (max_iters={max_iters}) "
                   f"— component labels may be split; raise max_iters or "
                   f"pass nonconverged='iterate'")
            if nonconverged == "raise":
                raise RuntimeError(msg)
            import warnings
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        # Stitch the untouched majority back in: no edge → keeps itself.
        return (ids.join(labels, "id", "left")
                .select(F.col("id"),
                        F.coalesce(F.col("keep_id"), F.col("id"))
                        .alias("keep_id"))
                .withColumn("is_kept", F.col("id") == F.col("keep_id")))
    finally:
        spark.conf.set(_width_key, _saved_width)
        if not caller_cached:
            pairs_u.unpersist()


def dedup_corpus(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                 upstream_caches: list[DataFrame] | None = None) -> DataFrame:
    """End-to-end near-dup removal: given candidate pairs from ANY tier
    (jaccard/minhash/simhash/embedding), keep one survivor per duplicate
    cluster and return the cleaned corpus.

    ``upstream_caches``: persisted handles from the pair-finding tier (e.g.
    :func:`minhash_banded_pairs`' shingle cache). They are released HERE,
    right after :func:`resolve_keep_list` eagerly materializes the edge
    list — the earliest point they are no longer needed. The label table
    itself stays persisted (the returned plan reads it); eviction is safe
    (pure joins/aggs recompute deterministically)."""
    ids = df.select(F.col(id_col).alias("id"))
    keep = resolve_keep_list(ids, pairs).filter("is_kept").select("id")
    if upstream_caches:
        for c in upstream_caches:
            c.unpersist()
    return df.join(keep, df[id_col] == keep.id, "left_semi")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 60) -> DataFrame:
    """Per-document SimHash signature (≤60 bits so it fits a signed int64).

    Each distinct token hashes to ``bits`` bits via xxhash64; the signature bit
    b is 1 iff more token-hashes have bit b set than not. Pure higher-order
    array expressions: per doc, fold token hash values into a bit-vote array of
    length ``bits``, then reassemble. Hamming-close signatures → near-dups.

    Grouping by signature (or banded substrings of it for hamming tolerance)
    gives the cheapest content-clustering shuffle possible: 8 bytes per doc."""
    hashed = df.select(
        F.col(id_col).alias("id"),
        _simhash_token_hashes(text_col).alias("_h"),
    )
    return hashed.select("id", simhash_vote_expr("_h", bits).alias("simhash"))


def _simhash_token_hashes(text_col: str):
    """Per-row array of xxhash64 token hashes feeding the simhash vote."""
    tokens = F.array_distinct(ws_tokens(F.lower(F.col(text_col))))
    return F.transform(tokens, lambda t: F.xxhash64(t))


def simhash_vote_expr(hash_array_col: str, bits: int = 60):
    """The SimHash majority-vote as ONE reusable column expression over an
    ``array<bigint>`` of token hashes — shared by batch :func:`simhash` and
    the streaming near-dup suppressor (``streaming.events``).

    Single-pass: ONE fold whose accumulator is a ``bits``-wide vote array
    (+1 if the bit is set, −1 if not), signature reassembled in the fold's
    finish lambda. Expressed as one SQL string on purpose: SQL's shiftright
    accepts a COLUMN shift amount (the PySpark wrapper only takes a Python
    int), so no per-bit unrolling is needed — the whole expression is a few
    hundred bytes instead of a 60-wide unrolled tree, and it reaches
    Catalyst in one py4j call instead of hundreds (the previous form spent
    ~1.6 s of driver time just BUILDING the Column; measured q57
    4.7 s → 2.6 s at sf0.1 on an idle box, bit-identical signatures)."""
    return F.expr(f"""aggregate(
      {hash_array_col}, array_repeat(cast(0 as bigint), {bits}),
      (acc, h) -> zip_with(acc, sequence(0, {bits - 1}),
                           (a, b) -> a + (shiftright(h, b) & 1) * 2 - 1),
      acc -> aggregate(
        zip_with(acc, sequence(0, {bits - 1}),
                 (v, b) -> if(v > 0, shiftleft(cast(1 as bigint), b),
                              cast(0 as bigint))),
        cast(0 as bigint), (s, x) -> s + x)
    )""")


def simhash_dup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact-signature SimHash grouping (hamming distance 0): one 8-byte-key
    shuffle. For hamming≤k, band the signature into k+1 chunks and union the
    per-chunk groupings (pigeonhole) — same plan shape, k+1 shuffles."""
    sigs = simhash(df, text_col, id_col)
    return sigs.groupBy("simhash").agg(
        F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt")
    )


def decontaminate_corpus(docs: DataFrame, eval_sources: list[str],
                         n: int = 5, text_col: str = "text",
                         id_col: str = "doc_id",
                         source_col: str = "source") -> DataFrame:
    """DROP train documents sharing any n-gram with the eval split — the
    production decontamination direction (:func:`cross_split_ngram_overlap`
    is the REPORT direction: per-eval-doc overlap counts).

    Scale design: the eval n-gram set is BROADCAST, so the train corpus —
    the 100 TB side — never shuffles at all. Plan shape:

    1. eval side: explode → distinct n-grams (a shuffle of the SMALL split
       only; eval sets are small by definition — benchmark suites are MBs);
    2. train side: explode map-side → broadcast LEFT SEMI against the eval
       set → distinct contaminated doc ids (a shuffle of hit IDS only,
       bounded by contamination volume, not corpus size);
    3. corpus: broadcast LEFT ANTI against the contaminated-id set.

    Two columnar scans of the train text, zero train-side wide exchanges —
    the broadcast plays the role a bloom-filter pre-filter plays in
    shuffle-based engines, with exact (not probabilistic) semantics.
    ``tests/test_plans.py`` asserts the no-train-shuffle property."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    sh = docs.select(F.col(id_col), F.col(source_col),
                     F.explode(word_shingles(toks, n)).alias("ng"))
    is_eval = F.col(source_col).isin(eval_sources)
    eval_ng = sh.filter(is_eval).select("ng").distinct()
    contaminated = (sh.filter(~is_eval)
                    .join(F.broadcast(eval_ng), "ng", "left_semi")
                    .select(id_col).distinct())
    return (docs.filter(~is_eval)
            .join(F.broadcast(contaminated), id_col, "left_anti"))


def cross_split_ngram_overlap(docs: DataFrame, eval_sources: list[str],
                              n: int = 5, text_col: str = "text",
                              id_col: str = "doc_id",
                              source_col: str = "source",
                              broadcast_eval: bool = True) -> DataFrame:
    """Benchmark decontamination: for every EVAL document, count its distinct
    n-gram shingles that also occur anywhere in the TRAIN split.

    The canonical pre-training hygiene op (eval sets leak into web-scale
    corpora; n-gram overlap is the standard detector). Returns
    (doc_id, n_shared_ngrams) for eval docs with ≥1 collision; downstream
    either drops those docs or masks the spans.

    Two plans (``broadcast_eval``):

    - True (default, the :func:`decontaminate_corpus` shape): the eval
      (doc, n-gram) set — small by definition — BROADCASTS to a map-side
      inner join against the train explode, so the train corpus never
      shuffles its n-grams; only MATCHED (doc, ng) hits cross a wide
      exchange for the distinct (map-side partially deduped). At 100 TB
      train / MB-scale eval this is the only shape that avoids shuffling
      the train shingle universe.
    - False (inverted-index form): both sides collapse to distinct shingles
      and hash-join on ng — the fallback when the eval split is itself too
      large to broadcast (cross-CORPUS overlap rather than benchmark
      decontamination)."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    sh = docs.select(F.col(id_col), F.col(source_col),
                     F.explode(word_shingles(toks, n)).alias("ng"))
    is_eval = F.col(source_col).isin(eval_sources)
    eval_ng = sh.filter(is_eval).select(id_col, "ng").distinct()
    if broadcast_eval:
        hits = (sh.filter(~is_eval).select("ng")
                .join(F.broadcast(eval_ng), "ng")
                .select(id_col, "ng").distinct())
        return hits.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_shared_ngrams"))
    train_ng = sh.filter(~is_eval).select("ng").distinct()
    return (eval_ng.join(train_ng, "ng", "left_semi")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shared_ngrams")))


def incremental_ingest_dedup(new_docs: DataFrame, index: DataFrame,
                             text_col: str = "text", id_col: str = "doc_id",
                             fp_col: str = "fingerprint") -> DataFrame:
    """Incremental corpus ingestion: dedup a NEW batch of documents against
    a persisted fingerprint INDEX of everything already ingested, plus
    within-batch — the daily-ingest shape of a training-data pipeline
    (the full-corpus operators above re-scan everything; this touches only
    the new batch and the index).

    Returns the surviving (id, fingerprint) rows: batch docs whose
    canonical content fingerprint (:func:`~..functions.text.
    content_fingerprint` — order/duplication-invariant) appears neither in
    the index nor earlier (min id) in the batch. ``index`` needs a
    ``fp_col`` column; chain runs by unioning the survivors back in.

    Scale shape: the batch side is days-sized, the index corpus-sized —
    keep the index WRITTEN BUCKETED BY ``fp_col`` (``write.bucketBy``), so
    the anti-join reads only matching buckets and the batch (the small
    side) is the only thing that shuffles; the within-batch groupBy
    shuffles (fp, id) pairs, never text. Nothing here re-reads historical
    documents — only their fingerprints."""
    fps = new_docs.select(
        F.col(id_col),
        content_fingerprint(F.col(text_col)).alias(fp_col))
    fresh = fps.join(index.select(fp_col), fp_col, "left_anti")
    return (fresh.groupBy(fp_col)
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, fp_col))


def editdist_blocked_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", block_len: int = 16,
                           prefix_len: int = 80, max_dist: int = 8,
                           max_block: int = 64) -> DataFrame:
    """Typo-tolerant near-duplicate pairs by bounded edit distance — the
    record-linkage tier of the dedup funnel: catches small in-place edits
    (OCR noise, boilerplate date stamps, version strings) that shingle
    tiers dilute across many n-grams.

    Semantics (the blocking is part of the spec, as in every production
    linkage system): two docs pair iff their lower-cased ``block_len``-char
    prefixes are IDENTICAL, their block's population is ≤ ``max_block``
    (the same stop-list discipline as :func:`ngram_jaccard_pairs` —
    boilerplate-prefix blocks are skipped, never exploded), and the
    Levenshtein distance between their ``prefix_len``-char prefixes is
    ≤ ``max_dist``. Returns (id_a, id_b, dist) with id_a < id_b.

    Scale shape: one shuffle of (block, prefix, id) — ~``prefix_len``
    bytes/doc, never the text; within-block pair generation is bounded at
    ``max_block``²/2 per block by the stop-list; the distance itself uses
    Spark's thresholded Levenshtein (early-exits the DP at ``max_dist`` —
    O(prefix·dist), not O(prefix²)). All JVM expressions, no Python."""
    d = df.select(
        F.col(id_col),
        F.lower(F.substring(F.col(text_col), 1, block_len)).alias("_blk"),
        F.lower(F.substring(F.col(text_col), 1, prefix_len)).alias("_pre"))
    allowed = (d.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bc"))
               .filter(F.col("_bc") <= max_block).select("_blk"))
    d = d.join(allowed, "_blk")
    a = d.select(F.col("_blk"), F.col(id_col).alias("id_a"),
                 F.col("_pre").alias("_pa"))
    b = d.select(F.col("_blk").alias("_blk2"), F.col(id_col).alias("id_b"),
                 F.col("_pre").alias("_pb"))
    dist = F.levenshtein(F.col("_pa"), F.col("_pb"), max_dist)
    return (a.join(b, (F.col("_blk") == F.col("_blk2"))
                   & (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b", dist.alias("dist"))
            .filter(F.col("dist") >= 0))


def multi_eval_contamination(docs: DataFrame, eval_sources: list[str],
                             n: int = 5, text_col: str = "text",
                             id_col: str = "doc_id",
                             source_col: str = "source") -> DataFrame:
    """Contamination MATRIX across many eval benchmarks in ONE corpus pass:
    (train doc id, eval source, shared distinct n-grams) — the production
    decontamination reality, where a release is screened against dozens of
    benchmark suites at once and each leaky document must be attributed to
    the specific benchmark(s) it leaks (:func:`decontaminate_corpus` is
    the single-set drop direction; :func:`cross_split_ngram_overlap` the
    per-eval-doc report).

    Scale shape, as the siblings: the (eval_source, n-gram) set is small
    by definition (benchmarks are MBs) and BROADCAST; the train corpus is
    scanned once, shingled map-side, and only HIT rows — bounded by
    contamination volume × benchmark count, never corpus size — reach the
    per-(doc, benchmark) aggregation shuffle. ``countDistinct`` absorbs
    repeated in-document shingles without a train-side pre-distinct."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    sh = docs.select(F.col(id_col), F.col(source_col),
                     F.explode(word_shingles(toks, n)).alias("ng"))
    is_eval = F.col(source_col).isin(eval_sources)
    eval_ng = (sh.filter(is_eval)
               .select(F.col(source_col).alias("eval_source"), "ng")
               .distinct())
    return (sh.filter(~is_eval)
            .join(F.broadcast(eval_ng), "ng")
            .groupBy(id_col, "eval_source")
            .agg(F.countDistinct("ng").alias("n_shared_ngrams")))


def cdc_chunks(df: DataFrame, window: int = 3, text_col: str = "text",
               id_col: str = "doc_id", nibble: str = "0") -> DataFrame:
    """Content-defined chunking (FastCDC/rsync family): split each document
    at ROLLING-HASH cut points instead of fixed offsets, so an insertion
    or deletion only perturbs the chunks adjacent to the edit — every
    chunk outside the edit window keeps its exact fingerprint, which is
    what makes chunk-level dedup robust to partial overlap (fixed-size
    chunking loses alignment after the first edit).

    Cut rule: a boundary falls after token ``j`` when the md5 of the
    ``window``-token shingle ENDING at ``j`` starts with ``nibble``
    (p = 1/16 per position → expected chunk ≈ 16 + window tokens).

    Plan shape: token rows (posexplode) → lag-window cut flags → running
    chunk ids → ordered reassembly, ALL whole-stage-codegen JVM work
    hash-partitioned by document (no global sort; skew bounded by the
    longest single document — the q124 sessionization shape). The
    tempting zero-shuffle array-land form (shingle array + filter +
    slice-per-chunk in one projection) is 5-70× SLOWER here: Catalyst
    re-inlines the arrays into each higher-order-function lambda, so the
    shingle/bounds arrays are rebuilt per ELEMENT — O(n²) interpreted
    work per document (measured 457 s vs 6.8 s at sf0.1; SCALE.md).

    Returns (id_col, chunk_no, chunk_text, fp): every chunk of every
    document, fingerprinted."""
    from pyspark.sql import Window as W

    from ..functions.text import ws_tokens

    toks = ws_tokens(F.lower(F.col(text_col)))
    tok = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    w = W.partitionBy(id_col).orderBy("pos")
    # Token at 0-based ``pos`` starts a new chunk iff the shingle ending
    # at pos-1 (its ``window`` lagged predecessors) carries the marker.
    lags = [F.lag("tok", window - j).over(w) for j in range(window)]
    starts = F.when(
        (F.col("pos") >= window)
        & (F.substring(F.md5(F.concat_ws(" ", *lags)), 1, 1) == nibble),
        1).otherwise(0)
    chunked = tok.withColumn(
        "chunk_no", F.sum(starts).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    chunks = (chunked.groupBy(id_col, "chunk_no")
              .agg(F.concat_ws(" ", F.transform(
                   F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                   lambda s: s.tok)).alias("chunk_text")))
    return (chunks.filter(F.col("chunk_text") != "")
                  .withColumn("fp", F.md5(F.col("chunk_text"))))


def cdc_duplicate_chunks(df: DataFrame, window: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         top_n: int = 25) -> DataFrame:
    """Chunk-level duplication report over :func:`cdc_chunks`: fingerprints
    appearing more than once (copies within OR across documents), heaviest
    first. ONE shuffle (groupBy fp) after the map-only chunking pass —
    the aggregation keys are content hashes, so the shuffle is uniform by
    construction (no hot keys beyond genuinely viral chunks)."""
    ch = cdc_chunks(df, window=window, text_col=text_col, id_col=id_col)
    return (ch.groupBy("fp")
              .agg(F.count("*").alias("n_copies"),
                   F.countDistinct(id_col).alias("n_docs"),
                   F.min(id_col).alias("first_doc"))
              .filter(F.col("n_copies") > 1)
              .orderBy(F.desc("n_copies"), "fp")
              .limit(top_n))


def cdc_overlap_clusters(df: DataFrame, window: int = 3,
                         min_shared_chunks: int = 2,
                         max_fp_docs: int = 64,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         caches: list[DataFrame] | None = None) -> DataFrame:
    """Document-level partial-overlap clusters from content-defined chunks
    (VERDICT r7 #5): q147 surfaces duplicated CHUNKS; real pipelines need
    the doc clusters those chunks imply — documents stitched together from
    shared passages (mirror sites, quote farms, versioned articles) that
    whole-document near-dup (q32/q64) misses because the docs differ
    globally while overlapping locally.

    Construction: per-doc DISTINCT chunk fingerprints from
    :func:`cdc_chunks`; a fingerprint is overlap EVIDENCE only when shared
    by 2..``max_fp_docs`` documents — fps above the cap are viral
    boilerplate (q148's domain, navigation chrome/license headers), which
    both adds no pairwise-overlap signal and is precisely what would make
    pair generation quadratic at 100 TB, so the cap is a semantic
    parameter of the relation (mirrored exactly in the oracle), not a
    silent drop; documents sharing >= ``min_shared_chunks`` evidence fps
    become edges; clusters are connected components over those edges via
    :func:`resolve_keep_list` (adaptive driver-union-find / distributed
    min-label tiers — no new iteration code), cluster id = min doc id.

    Plan shape: chunking is map-only per document; the fp-eligibility
    count and the pair count are each ONE map-side-combined shuffle on
    content-hash keys (uniform by construction); per-fp pair fan-out is
    bounded by ``max_fp_docs``² so the edge relation is O(docs·chunks)
    not O(docs²). Shared-chunk counts are exact integers — the whole
    relation is cross-engine exact.

    Returns (cluster_id, doc_id, n_cluster_docs): one row per document
    that belongs to a >=2-doc overlap cluster.

    ``caches``: as in :func:`minhash_banded_pairs` — the edge list is
    persisted (it feeds cluster resolution AND the touched-doc set); pass
    a list to receive the handle and unpersist once the output has been
    materialized, else it lives until the session clears it."""
    from pyspark import StorageLevel

    ch = cdc_chunks(df, window=window, text_col=text_col, id_col=id_col)
    doc_fp = ch.select(F.col(id_col).alias("id"), "fp").distinct()
    fp_ok = (doc_fp.groupBy("fp").agg(F.count("*").alias("_nd"))
             .filter((F.col("_nd") >= 2) & (F.col("_nd") <= max_fp_docs))
             .select("fp"))
    elig = doc_fp.join(fp_ok, "fp")
    # Persist the edge list: the chunking/pairing pipeline must run ONCE,
    # while edges feed both the touched-doc set and cluster resolution
    # (resolve_keep_list's internal persist then reads this cache, not the
    # corpus). Only edge-endpoint docs can belong to a >=2-doc cluster, so
    # resolving over `touched` instead of the full corpus removes BOTH
    # corpus-wide stitch scans the naive `ids=df` form pays (the r8
    # explain showed the stitched label relation — and its documents scan
    # — duplicated under the size-agg and the output join).
    pairs = (elig.alias("x").join(elig.alias("y"), "fp")
             .filter(F.col("x.id") < F.col("y.id"))
             .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
             .agg(F.count("*").alias("shared"))
             .filter(F.col("shared") >= min_shared_chunks)
             .select("a", "b")
             .persist(StorageLevel.MEMORY_AND_DISK))
    if caches is not None:
        caches.append(pairs)
    touched = (pairs.select(F.col("a").alias("id"))
               .unionByName(pairs.select(F.col("b").alias("id")))
               .distinct())
    labels = resolve_keep_list(touched, pairs)
    clustered = (labels.groupBy("keep_id")
                 .agg(F.count("*").alias("n_cluster_docs"))
                 .filter(F.col("n_cluster_docs") >= 2))
    return (labels.join(clustered, "keep_id")
            .select(F.col("keep_id").alias("cluster_id"),
                    F.col("id").alias(id_col), "n_cluster_docs")
            .orderBy("cluster_id", id_col))


def cross_doc_boilerplate(df: DataFrame, n: int = 5,
                          df_permille: int = 100,
                          flag_ratio: float = 0.2,
                          text_col: str = "text", id_col: str = "doc_id",
                          source_col: str = "source") -> DataFrame:
    """Cross-document boilerplate exposure (RefinedWeb/C4-class signal):
    an n-gram shingle occurring in more than ``df_permille``/1000 of all
    documents is boilerplate (navigation chrome, license headers,
    templates); each document's boilerplate ratio is the share of its
    DISTINCT shingles that are boilerplate, and a document above
    ``flag_ratio`` is template-dominated. Complements the intra-document
    repetition score (q82) and pairwise dedup (q32/q64): this finds mass
    REUSE that is neither self-repetition nor any single near-duplicate
    pair.

    Exactness discipline: the document-frequency threshold is the integer
    comparison ``df · 1000 > df_permille · N`` (no float), per-document
    ratios round to 4 dp and aggregate as DECIMAL sums, so the per-source
    relation is bit-identical cross-engine. Plan: per-doc distinct
    shingles explode once; doc-frequency is one map-side-combined shuffle
    on shingle keys; the boilerplate set left-joins back on the same
    keys; corpus size rides a broadcast 1-row aggregate.

    Returns (source, n_docs, n_flagged, mean_boiler_ratio) over documents
    with at least one shingle, ordered by source."""
    from ..functions.text import word_shingles, ws_tokens

    sh_doc = (df.select(
        F.col(id_col), F.col(source_col),
        F.explode(F.array_distinct(
            word_shingles(ws_tokens(F.lower(F.col(text_col))), n)))
        .alias("sh")))
    n_docs_tbl = df.agg(F.count("*").alias("_n"))
    doc_freq = sh_doc.groupBy("sh").agg(F.count("*").alias("_df"))
    boiler = (doc_freq.crossJoin(F.broadcast(n_docs_tbl))
              .filter(F.col("_df") * 1000 > F.lit(df_permille) * F.col("_n"))
              .select("sh", F.lit(1).alias("_is_b")))
    per_doc = (sh_doc.join(boiler, "sh", "left")
               .groupBy(id_col)
               .agg(F.first(source_col).alias(source_col),
                    F.count("*").alias("_n_sh"),
                    F.sum(F.coalesce(F.col("_is_b"), F.lit(0)))
                    .alias("_n_boiler")))
    rat = per_doc.select(
        source_col,
        F.round(F.col("_n_boiler") / F.col("_n_sh").cast("double"), 4)
        .cast("decimal(8,4)").alias("_r"))
    return (rat.groupBy(source_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("_r") > flag_ratio, 1).otherwise(0))
                 .alias("n_flagged"),
                 F.round(F.sum("_r").cast("double") / F.count("*"), 4)
                 .alias("mean_boiler_ratio"))
            .orderBy(source_col))


def leakage_safe_split(df: DataFrame, min_jaccard: float = 0.6, n: int = 3,
                       fractions: tuple[float, float] = (0.8, 0.1),
                       salt: int = 42, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_doc_freq: int | None = None,
                       caches: list[DataFrame] | None = None) -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: documents are split at the NEAR-DUP-CLUSTER level, not
    the document level. A doc-level random split puts ~2·p·(1-p) of every
    duplicate pair on opposite sides of the train/eval fence — the
    benchmark-contamination mechanism dedup exists to prevent — so the
    unit of assignment must be the cluster.

    Construction: exact n-gram-Jaccard near-dup pairs above
    ``min_jaccard`` (:func:`ngram_jaccard_pairs` — inverted-index
    candidates, no all-pairs) → connected components via
    :func:`resolve_keep_list` (frontier-only, touches edge endpoints) →
    every document's cluster id is its component min id (singletons: the
    doc id itself, via one left join — no corpus shuffle) → the CLUSTER
    id, not the doc id, feeds the shared multiplicative hash
    (``sampling._knuth_hash`` — the same cross-engine convention as every
    deterministic sampler here) and permille thresholds derived from
    ``fractions`` pick the split. Every member of a cluster hashes the
    same value, so co-membership of a split is structural, not checked.

    ``max_doc_freq`` is the inverted-index stop-list passthrough
    (:func:`ngram_jaccard_pairs`) — at corpus scale boilerplate shingles
    make candidate generation quadratic without it; the recall trade-off
    (a pair sharing ONLY ultra-common shingles is missed) is the
    standard one and must be mirrored in any external replica of the
    split.

    Returns (``id_col``, cluster_id, split) — one row per document,
    split ∈ {'train','val','test'}."""
    from .sampling import _knuth_hash

    pairs = (ngram_jaccard_pairs(df, text_col=text_col, id_col=id_col,
                                 n=n, min_jaccard=min_jaccard,
                                 max_doc_freq=max_doc_freq,
                                 caches=caches)
             .select("a", "b"))
    touched = (pairs.select(F.col("a").alias("id"))
               .unionByName(pairs.select(F.col("b").alias("id")))
               .distinct())
    labels = resolve_keep_list(touched, pairs).select("id", "keep_id")
    out = (df.select(F.col(id_col))
             .join(labels.withColumnRenamed("id", id_col), id_col, "left")
             .select(F.col(id_col),
                     F.coalesce(F.col("keep_id"), F.col(id_col))
                      .alias("cluster_id")))
    h = F.pmod(_knuth_hash("cluster_id", salt), F.lit(1_000_000))
    t_train = int(fractions[0] * 1_000_000)
    t_val = int((fractions[0] + fractions[1]) * 1_000_000)
    return out.withColumn(
        "split",
        F.when(h < t_train, F.lit("train"))
         .when(h < t_val, F.lit("val"))
         .otherwise(F.lit("test")))


def span_dedup_rewrite(df: DataFrame, k: int = 8, text_col: str = "text",
                       id_col: str = "doc_id",
                       key_mode: str = "string") -> DataFrame:
    """Exact duplicated-SPAN rewrite (the substring-dedup tier of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models Better"):
    every k-token span that occurs more than once corpus-wide keeps its
    FIRST occurrence (lexicographic min (doc id, position)) and is cut
    out of every later occurrence, then each document is rebuilt from its
    surviving tokens in original order. Unlike doc-level dedup this
    removes the memorization-prone repeated passage while keeping both
    documents' unique remainder — intra-document repetition is handled
    by the same rule (a doc repeating its own span loses the later copy).

    Matching is case-normalized; the rebuild keeps original casing
    (positions align because both views split on the same whitespace).
    Single pass: spans whose winner occurrence is itself cut by a
    DIFFERENT overlapping span are not re-adjudicated — the standard
    practical semantics (the reference suffix-array pipeline makes the
    same choice per pass).

    Plan shape: positional k-grams come from the O(len) zipped-shift
    shingle builder, ONE shuffle on the gram key finds winners via a
    map-side-combined ``min(struct(id, pos))`` (partial aggregation — a
    window row_number over gram would shuffle every occurrence of hot
    boilerplate grams to one task), losers shuffle back doc-keyed as
    bare (id, start) ints, and coverage + rebuild are array-land in one
    projection. The covered-index array is projected as a column
    referenced twice (size + membership filter) so CollapseProject
    cannot re-inline it into the lambda (the O(n²) HOF trap, SCALE.md
    r7). Rebuild cost is O(tokens × covered-spans) per doc — bounded by
    the doc's own duplication, not the corpus.

    ``key_mode='hash64'`` shuffles 8-byte ``xxhash64(gram)`` keys instead
    of ~k-word strings — the 100 TB mode (collision odds ~(grams²)/2⁶⁴;
    tested equal to string keys on fixtures). ``'string'`` is exact and
    is what the DuckDB oracle mirrors.

    Returns (``id_col``, n_tokens, n_removed, clean_text) — one row per
    document, unchanged docs with n_removed = 0 and their original text."""
    if k < 2:
        raise ValueError(f"span length k must be >= 2, got {k}")
    if key_mode not in ("string", "hash64"):
        raise ValueError(f"unknown key_mode {key_mode!r}")

    norm = ws_tokens(F.lower(F.col(text_col)))
    grams = df.select(
        F.col(id_col), F.posexplode(word_shingles(norm, k)).alias("pos", "g"))
    if key_mode == "hash64":
        grams = grams.select(id_col, "pos", F.xxhash64("g").alias("g"))

    winners = (grams.groupBy("g")
               .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("win"),
                    F.count("*").alias("c"))
               .filter(F.col("c") > 1)
               .select("g", "win"))
    losers = (grams.join(winners, "g")
              .filter((F.col(id_col) != F.col(f"win.{id_col}"))
                      | (F.col("pos") != F.col("win.pos")))
              .select(id_col, "pos"))
    spans = losers.groupBy(id_col).agg(
        F.collect_set("pos").alias("starts"))

    base = df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("w"))
    joined = (base.join(spans, id_col, "left")
              .select(id_col, "w",
                      F.array_distinct(F.flatten(F.transform(
                          F.coalesce("starts",
                                     F.array().cast("array<int>")),
                          lambda p: F.sequence(p, p + F.lit(k - 1)))))
                       .alias("covered")))
    kept = F.filter("w", lambda t, i: ~F.array_contains(F.col("covered"), i))
    return joined.select(
        F.col(id_col),
        F.size("w").alias("n_tokens"),
        F.size("covered").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"))


def winnowing_fingerprints(df: DataFrame, k: int = 4, w: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           max_df: int | None = None) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every k-token gram, then from each
    sliding window of ``w`` consecutive hashes keep the minimum. The
    guarantee that makes this the standard similarity-fingerprint
    selector: any shared run of ``k + w - 1`` tokens between two
    documents is CERTAIN to contribute at least one common fingerprint,
    while only ~2/(w+1) of positions are kept — density is tunable,
    detection is deterministic (no MinHash-style probabilistic miss).

    Plan: the k-gram hashes are built IN-ROW (one ``transform`` over a
    position sequence whose lambda touches only the pre-projected token
    attribute — the HOF free-subexpression trap doesn't apply to
    attributes), so the only corpus-shaped data motion is one doc-keyed
    exchange for the per-document window min and one fingerprint-keyed
    exchange for the distinct. 16-hex-char truncated md5 keeps shuffle
    rows narrow (the q31/q147 convention).

    ``max_df`` (optional) drops fingerprints appearing in more than
    that many documents before any pairing — the boilerplate
    blast-radius cap for corpus scale (a fingerprint shared by 10⁶
    documents is template noise generating 10¹² pairs, not linkage
    evidence). ``None`` keeps exact semantics.

    Returns the distinct (id_col, fp) fingerprint relation."""
    n = F.size(F.col("_toks"))
    # guard: sequence(1, x) DESCENDS for x < 1 (short docs would slice at
    # non-positive positions) — docs with fewer than k tokens have no gram
    positions = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))) \
                 .otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        positions,
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i, k))),
            1, 16))
    pos = (df.select(F.col(id_col),
                     ws_tokens(F.lower(F.col(text_col))).alias("_toks"))
             .select(id_col, (n - (k - 1)).alias("_npos"),
                     F.posexplode(hashes).alias("_p0", "_h")))
    from pyspark.sql import Window
    win = (Window.partitionBy(id_col).orderBy(F.col("_p0"))
                 .rowsBetween(0, w - 1))
    fps = (pos.withColumn("_fp", F.min("_h").over(win))
              .filter(F.col("_p0") + 1 <= F.col("_npos") - (w - 1))
              .select(id_col, F.col("_fp").alias("fp"))
              .distinct())
    if max_df is not None:
        dfreq = (fps.groupBy("fp")
                    .agg(F.count("*").alias("_df"))
                    .filter(F.col("_df") <= max_df)
                    .select("fp"))
        fps = fps.join(dfreq, "fp")
    return fps


def winnowing_pairs(df: DataFrame, k: int = 4, w: int = 5,
                    min_shared: int = 5, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_df: int | None = None) -> DataFrame:
    """Document pairs ranked by shared winnowing fingerprints — the
    MOSS-style similarity report over :func:`winnowing_fingerprints`.
    Inverted-index pairing: docs meet only through fingerprints they
    share (never all-pairs), counts are exact integers.

    Returns (doc_a, doc_b, n_shared) with doc_a < doc_b and
    ``n_shared >= min_shared``."""
    fps = winnowing_fingerprints(df, k=k, w=w, text_col=text_col,
                                 id_col=id_col, max_df=max_df)
    a = fps.select(F.col(id_col).alias("doc_a"), "fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    return (a.join(b, "fp")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("n_shared"))
             .filter(F.col("n_shared") >= min_shared))


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      min_containment: float = 0.5,
                      max_doc_freq: int | None = None,
                      caches: list[DataFrame] | None = None) -> DataFrame:
    """Asymmetric shingle-set CONTAINMENT pairs — the partial-copy
    detector Jaccard systematically misses (Broder's resemblance vs
    containment distinction): a short document fully embedded in a long
    one has containment ≈ 1 on the short side while Jaccard ≈
    |short|/|long| can sit far below any dedup threshold. The standard
    quote-expansion / article-plus-wrapper case in web corpora.

    Reuses the q32 inverted-index candidate machinery
    (:func:`ngram_jaccard_pairs` — docs meet only on shared shingles,
    same ``max_doc_freq`` stop-list trade) and derives both directed
    containments from the exact intersection and set sizes it already
    carries. Keeps pairs where EITHER direction reaches
    ``min_containment``.

    Output: (a, b, inter_cnt, a_cnt, b_cnt, containment_a,
    containment_b) with a < b; ``containment_a`` = |A∩B|/|A| — how much
    of A lives inside B."""
    pairs = ngram_jaccard_pairs(df, text_col=text_col, id_col=id_col,
                                n=n, min_jaccard=0.0,
                                max_doc_freq=max_doc_freq, caches=caches)
    ca = F.round(F.col("inter_cnt").cast("double")
                 / F.col("a_cnt").cast("double"), 6)
    cb = F.round(F.col("inter_cnt").cast("double")
                 / F.col("b_cnt").cast("double"), 6)
    return (pairs.select("a", "b", "inter_cnt", "a_cnt", "b_cnt",
                         ca.alias("containment_a"),
                         cb.alias("containment_b"))
            .filter((F.col("containment_a") >= min_containment)
                    | (F.col("containment_b") >= min_containment)))


def prefix_filtered_jaccard_pairs(df: DataFrame, threshold: float,
                                  text_col: str = "text",
                                  id_col: str = "doc_id", n: int = 3,
                                  caches: list[DataFrame] | None = None
                                  ) -> DataFrame:
    """Exact Jaccard-threshold similarity join with PREFIX FILTERING —
    the SSJoin / All-Pairs / PPJoin candidate-pruning scheme (Chaudhuri
    et al. 2006; Bayardo et al. 2007; Xiao et al. 2008): order every
    document's shingles by GLOBAL rarity (document frequency asc,
    shingle asc — one shared total order), and index only each
    document's first ``n_sh − ⌈t·n_sh⌉ + 1`` shingles. PPJoin's prefix
    lemma guarantees any pair with J ≥ t shares a shingle within BOTH
    prefixes, so the candidate set is complete — results are EXACT
    while candidate generation touches only the rare head of each
    document instead of every posting (at t=0.8 the prefix is ~20% of
    the document; boilerplate-heavy tails never generate candidates,
    doing structurally what q32's ``max_doc_freq`` stop-list does
    heuristically, but with zero recall loss).

    Plan: one df-count shuffle (the global order), one doc-keyed
    regroup into rarity-ordered shingle arrays (the extra shuffle this
    scheme buys its pruning with), prefix explode → self-join on the
    (rare) prefix tokens, exact verify via in-row ``array_intersect``
    on candidate pairs only.

    Returns (a, b, inter_cnt, a_cnt, b_cnt, jaccard) with a < b and
    jaccard ≥ threshold."""
    from pyspark import StorageLevel

    from .relational import fan_out_small_scan

    tokens = ws_tokens(F.col(text_col))
    # Conditional fan-out before the HOF-heavy shingle projection (see
    # ngram_jaccard_pairs — the single-split serial-scan class).
    shingled = fan_out_small_scan(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(tokens, n)).alias("shingles"))
    shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    if caches is not None:
        caches.append(shingled)
    posting = shingled.select("id", F.explode("shingles").alias("shingle"))
    dfreq = posting.groupBy("shingle").agg(F.count("*").alias("_df"))
    ordered = (posting.join(dfreq, "shingle")
               .groupBy("id")
               .agg(F.sort_array(F.collect_list(
                   F.struct(F.col("_df"), F.col("shingle"))))
                   .alias("_ord")))
    # Exact prefix length (ADVICE r8): ⌈t·n⌉ via INTEGER arithmetic on a
    # rationalized threshold, never a float ceil — F.ceil(n*t) on the
    # IEEE product rounds UP when t·n is an exact integer whose product
    # carries one ulp of noise (0.28·25 → 7.000000000000001 → ceil 8),
    # shortening the prefix below the completeness lemma and silently
    # dropping qualifying pairs. t is rationalized as floor(t·10⁹)/10⁹
    # (underestimating t only LENGTHENS the prefix — extra candidates,
    # zero recall loss); ⌈n·p/q⌉ = ⌊(n·p + q − 1)/q⌋ is exact in int64.
    #
    # q = 10⁶, not 10⁹ (ADVICE r14): Spark `/` on long operands is IEEE
    # DOUBLE division, so F.floor(num/den) is only exact-floor when the
    # numerator is exactly representable (num < 2⁵³ ≈ 9.0·10¹⁵) — then
    # the one rounding of the quotient is below num·2⁻⁵³/den < 1/den,
    # the gap between the true quotient and any integer it doesn't
    # equal, so the floor cannot move. With q = 10⁹ the alpha numerator
    # p·(sx+sy) breaches 2⁵³ once a pair's combined set size passes
    # ~9·10⁶ shingles and the mis-floor could STRENGTHEN the positional
    # prune (drop a qualifying pair). q = 10⁶ bounds every numerator in
    # this function by 10⁶·2³² ≈ 4.3·10¹⁵ < 2⁵³ for ALL int32 set
    # sizes, making both floors provably exact at any document size the
    # engine can represent. Rationalizing t at 10⁻⁶ instead of 10⁻⁹
    # only weakens the prunes (p/q ≤ t still), so completeness holds
    # and the verify stage keeps the output identical.
    _q = 1_000_000
    _p = math.floor(threshold * _q)
    n_sh = F.size("_ord")
    ceil_tn = F.floor((n_sh.cast("long") * F.lit(_p) + F.lit(_q - 1))
                      / F.lit(_q))
    plen = (n_sh - ceil_tn + 1).cast("int")
    # The prefix relation carries each posting's SIZE and 0-based rarity
    # POSITION so the candidate join can apply the two other exact
    # PPJoin prunes before anything is shuffled to the verify stage
    # (guide §3.2: reduce the big side before moving it):
    #
    #  * LENGTH filter — J ≥ t implies t·max(|A|,|B|) ≤ min(|A|,|B|);
    #    with the rationalized p/q ≤ t, keeping pairs with
    #    p·max ≤ q·min is implied for every true pair (underestimating
    #    t only weakens the prune, never drops a qualifying pair).
    #  * POSITIONAL filter — at a collision at positions (i, j) of the
    #    shared global rarity order, the overlap of a pair whose FIRST
    #    common shingle this is cannot exceed 1 + min(|A|−i−1, |B|−j−1),
    #    and J ≥ t needs overlap ≥ ⌈t/(1+t)·(|A|+|B|)⌉ ≥
    #    ⌈p·(|A|+|B|)/(p+q)⌉ (p/(p+q) ≤ t/(1+t), monotone). A true
    #    pair's first collision always passes, so keeping pairs where
    #    ANY collision passes is complete; later collisions passing
    #    only re-admit candidates the verify stage rejects anyway.
    #
    # All arithmetic is int64 (p,q = 10⁶ × sizes ≤ 2³¹ stays < 2⁶³;
    # plain int32 products overflow under ANSI mode — measured), and
    # both floor-divisions are exact for all int32 set sizes (numerators
    # < 2⁵³ — see the q = 10⁶ note above; ADVICE r14 flagged the q = 10⁹
    # alpha division as inexact past ~9·10⁶ combined shingles).
    # Measured at sf0.1: candidates 409k → 125k (−69%), and the verify
    # stage (two shingle-array joins + array_intersect per candidate)
    # was the dominant ~70% of the query wall.
    prefix = (ordered.select(
        "id", n_sh.alias("_sz"), F.posexplode(F.transform(
            F.slice("_ord", 1, plen), lambda s: s["shingle"]))
        .alias("_pos", "shingle")))
    _pl, _ql = F.lit(_p).cast("long"), F.lit(_q).cast("long")
    sx, sy = F.col("x._sz").cast("long"), F.col("y._sz").cast("long")
    length_ok = (_pl * F.greatest(sx, sy) <= _ql * F.least(sx, sy))
    alpha = F.floor((_pl * (sx + sy) + F.lit(_p + _q - 1).cast("long"))
                    / F.lit(_p + _q).cast("long"))
    ubound = (F.lit(1) + F.least(sx - F.col("x._pos") - F.lit(1),
                                 sy - F.col("y._pos") - F.lit(1)))
    cand = (prefix.alias("x")
            .join(prefix.alias("y"),
                  (F.col("x.shingle") == F.col("y.shingle"))
                  & (F.col("x.id") < F.col("y.id")))
            .filter(length_ok & (ubound >= alpha))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct())
    verify = (cand
              .join(shingled.select(F.col("id").alias("a"),
                                    F.col("shingles").alias("_sa")), "a")
              .join(shingled.select(F.col("id").alias("b"),
                                    F.col("shingles").alias("_sb")), "b")
              .select("a", "b",
                      F.size(F.array_intersect("_sa", "_sb"))
                       .alias("inter_cnt"),
                      F.size("_sa").alias("a_cnt"),
                      F.size("_sb").alias("b_cnt")))
    return (verify
            .withColumn("jaccard",
                        F.round(F.col("inter_cnt")
                                / (F.col("a_cnt") + F.col("b_cnt")
                                   - F.col("inter_cnt")), 6))
            .filter(F.col("jaccard") >= threshold))


def exact_dedup_keep_best(df: DataFrame, score, text_col: str = "text",
                          id_col: str = "doc_id",
                          normalize: bool = True,
                          fingerprint: bool = False) -> DataFrame:
    """Duplicate groups keeping the BEST copy instead of the min-id copy
    (:func:`exact_dedup` / :func:`fingerprint_dedup`'s policy):
    production dedup keeps the highest-quality / longest / most-recent
    representative — min-id keeps whatever was crawled first. ``score``
    is any integer-valued quality Column (integer so the keep decision
    has no float boundary anywhere — enforced, a non-integral score
    raises TypeError); ties break to the SMALLEST id under the id
    column's natural ordering, so ``id_col`` may be numeric OR string
    (ADVICE r8: the old ``max(struct(score, −id))`` tie-break
    unary-minused the id, which silently null-casts string ids).
    ``fingerprint=True`` groups on the order/duplication-invariant
    token-bag fingerprint (the q31 canonical key) instead of the raw
    normalized text.

    Same shuffle shape as exact_dedup — one hash-keyed agg over
    (hash, score, id); the winner is a min over (−score, id) structs
    (score is integral, so the unary minus is exact and type-safe;
    the id rides in its own type), map-side combined. Returns
    (content_hash, keep_id, keep_score, dup_cnt) for every distinct
    content."""
    if fingerprint:
        key = content_fingerprint(F.col(text_col))
    else:
        c = F.col(text_col)
        if normalize:
            c = F.lower(F.trim(c))
        key = F.md5(c)
    sel = df.select(key.alias("content_hash"),
                    F.col(id_col).alias("_id"), score.alias("_score"))
    score_type = sel.schema["_score"].dataType.simpleString()
    if score_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"exact_dedup_keep_best: score must be integer-valued "
            f"(got {score_type}) — cast or rank it first so the keep "
            f"decision has no float boundary")
    return (sel
            .groupBy("content_hash")
            .agg(F.min(F.struct((-F.col("_score")).alias("ns"),
                                F.col("_id").alias("i"))).alias("w"),
                 F.count(F.lit(1)).alias("dup_cnt"))
            .select("content_hash",
                    F.col("w.i").alias("keep_id"),
                    (-F.col("w.ns")).alias("keep_score"),
                    "dup_cnt"))


def ngram_novelty(train: DataFrame, pool: DataFrame, n: int = 5,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: for every
    ``pool`` document, the fraction of its DISTINCT n-gram shingles that
    appear nowhere in ``train`` — the memorization-risk / freshness
    score. Where :func:`cross_split_ngram_overlap` REPORTS contaminated
    eval docs (any hit is a defect), novelty SCORES incoming docs on a
    [0, 1] scale so a curation pipeline can rank-and-keep the most novel
    additions (continual-pretraining data selection) or flag near-zero
    novelty as verbatim recall.

    Plan: both sides explode distinct shingles once; the train side
    collapses to its distinct shingle universe (map-side partial
    dedup), the pool postings LEFT JOIN it on the shingle key and one
    doc-keyed agg counts misses — two shuffles, both linear in distinct
    shingles. The novelty ratio divides two exact integers (one IEEE
    divide, cross-engine exact). Hot boilerplate shingles are harmless
    here — they match early and carry no pair fan-out (no self-join
    anywhere). Docs with fewer than ``n`` tokens have no shingles and
    are absent from the output (documented contract).

    Returns one row per pool doc: (id_col, n_shingles, n_novel,
    novelty)."""
    def _distinct_sh(df):
        toks = ws_tokens(F.lower(F.col(text_col)))
        return df.select(
            F.col(id_col),
            F.explode(F.array_distinct(word_shingles(toks, n)))
             .alias("ng"))

    train_ng = _distinct_sh(train).select("ng").distinct()
    pool_ng = _distinct_sh(pool)
    hit = pool_ng.join(train_ng.withColumn("_seen", F.lit(1)),
                       "ng", "left")
    return (hit.groupBy(id_col)
            .agg(F.count("*").alias("n_shingles"),
                 F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
                  .cast("long").alias("n_novel"))
            .withColumn("novelty",
                        F.col("n_novel").cast("double")
                        / F.col("n_shingles").cast("double")))


def jaccard_threshold_curve(df: DataFrame,
                            thresholds: tuple[float, ...] = (
                                0.5, 0.6, 0.7, 0.8, 0.9),
                            text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            max_doc_freq: int | None = None,
                            caches: list[DataFrame] | None = None
                            ) -> DataFrame:
    """Dedup-rate curve: how many near-dup pairs (and how many flagged
    documents) survive at EACH candidate threshold — the sweep a
    curation team runs before committing to one Jaccard cutoff, from
    ONE candidate-generation pass. Threshold choice is the single most
    consequential dedup knob (Lee et al. 2022 sweep it per corpus);
    recomputing the pair relation per threshold multiplies the
    dominant cost by the sweep size for no reason — every per-pair
    Jaccard at or above min(thresholds) is already exact in the q32
    relation, so the whole curve is two tiny rollups of it.

    Plan: :func:`ngram_jaccard_pairs` once at ``min(thresholds)``;
    pairs roll up per threshold via a broadcast non-equi join against
    the |thresholds|-row literal table (count), and flagged-doc counts
    come from each doc's MAX pair Jaccard (one explode of the pair
    relation + a doc-keyed max — never re-touching the corpus).
    Thresholds compare as identical double literals against the
    6-dp-rounded Jaccard on any engine.

    Returns one row per threshold: (threshold, n_pairs, n_docs),
    threshold ascending; zero-survivor thresholds report honest 0s."""
    spark = df.sparkSession
    pairs = ngram_jaccard_pairs(df, text_col=text_col, id_col=id_col,
                                n=n, min_jaccard=min(thresholds),
                                max_doc_freq=max_doc_freq,
                                caches=caches)
    if caches is not None:
        from .relational import persisted
        pairs = persisted(pairs)
        caches.append(pairs)
    thr = spark.createDataFrame(
        [(float(t),) for t in sorted(thresholds)], "threshold double")
    # STREAM the pair relation against the broadcast |thresholds|-row
    # table (crossJoin + filter -> BroadcastNestedLoopJoin with the
    # TINY side broadcast). The tempting `thr LEFT JOIN pairs ON
    # jaccard >= t` inverts that: to preserve the 5-row left side Spark
    # must broadcast PAIRS — the whole candidate pipeline builds on the
    # driver's broadcast path (learning-13 class; measured 11.5 s vs
    # 2.9 s at sf0.01). Zero-survivor thresholds come back via a final
    # 5-row left join instead.
    np_ = (pairs.crossJoin(F.broadcast(thr))
           .filter(F.col("jaccard") >= F.col("threshold"))
           .groupBy("threshold").agg(F.count("*").alias("np")))
    docmax = (pairs.select(F.col("a").alias("id"), "jaccard")
              .unionAll(pairs.select(F.col("b").alias("id"), "jaccard"))
              .groupBy("id").agg(F.max("jaccard").alias("maxj")))
    nd = (docmax.crossJoin(F.broadcast(thr))
          .filter(F.col("maxj") >= F.col("threshold"))
          .groupBy("threshold").agg(F.count("*").alias("nd")))
    return (thr.join(np_, "threshold", "left")
            .join(nd, "threshold", "left")
            .select("threshold",
                    F.coalesce(F.col("np"), F.lit(0)).alias("n_pairs"),
                    F.coalesce(F.col("nd"), F.lit(0)).alias("n_docs"))
            .orderBy("threshold"))
