"""Round-15 wave, STAGED (written r14 post-close, registered r15): the
eight probed core slots plus the LTV-curve spare — nine queries.

The registry growth policy (COVERAGE.md rule 2) budgets ~10-12 new
driver slots per round so every certification window keeps ≥35 refresh
slots — but it constrains ``REGISTRY``, not the tree. These builders
are the r15 wave designed and probed in PLANS.md ("Round 15 wave
pre-design"): written now with the full discipline (DuckDB oracle
twins with identical aliases, cross-engine exactness, tri-SF parity in
``tests/test_staged_parity.py`` every session), and moved into
``queries.REGISTRY`` at r15 open alongside the second retirement batch
— a one-line flip per query, with the evidence already rounds deep.

Staged queries are NOT in the driver rotation, NOT in bench.py, and
NOT in the plan-audit registry pin (``tools/plan_audit.py`` sweeps
``REGISTRY``); at registration they enter all three plus
``_DEFERRED_TO_NEXT_WINDOW`` / COVERAGE / SCALE rows per the r14
protocol.

Exactness conventions (the r14 toolkit, memory-documented): money in
integer cents via ``CAST(x AS DECIMAL(18,2)) * 100``; cross-engine
floats only as ONE final IEEE divide (or divide+sqrt tree) of exact
integer operands; dates emitted as yyyy-MM-dd STRINGS (the q246
dtype-gate lesson); oracle sums stay BIGINT/HUGEINT while Spark
carries DECIMAL(38) for 100 TB headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import Query
from .sources.catalog import Catalog

STAGED: dict[str, Query] = {}


def _stage(name: str, survey: str, oracle: str | None):
    def deco(fn):
        STAGED[name] = Query(name, fn, oracle, survey)
        return fn
    return deco


@_stage(
    "q253_relational_division",
    survey="net-new relational division (universal quantification: customers whose orders span ALL order priorities — count-distinct-equals-domain rewrite of the double-NOT-EXISTS textbook form; the classic FOR-ALL surface)",
    oracle="""
        WITH per AS (
          SELECT o_custkey,
                 count(DISTINCT o_orderpriority) AS n_priorities
          FROM orders GROUP BY 1),
        dom AS (SELECT count(DISTINCT o_orderpriority) AS d FROM orders)
        SELECT per.n_priorities,
               CAST(count(*) AS BIGINT) AS n_customers,
               (per.n_priorities = dom.d) AS spans_all
        FROM per, dom
        GROUP BY per.n_priorities, dom.d
        ORDER BY per.n_priorities
    """,
)
def q253_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division (universal quantification): which customers
    ordered under EVERY priority class. The textbook double-NOT-EXISTS
    decorrelates to ``count(distinct attr) per key == |attr domain|`` —
    one map-side-combinable aggregate over the fact keyed by customer
    plus a 1-row domain-count frame, instead of a per-customer
    correlated subquery pair (the oracle keeps the domain subquery so
    both engines derive |domain| from data, never a literal). Output
    is the distinct-priority-count histogram with the division answer
    as the ``spans_all`` top row. 100 TB: groupBy(o_custkey) is the
    only row-grain shuffle (partial count-distinct map-side); the
    domain count is a broadcast scalar frame (plan-audit SCALAR_FRAME
    class)."""
    cat = Catalog(spark, sf_dir)
    per = (cat.orders.groupBy("o_custkey")
           .agg(F.countDistinct("o_orderpriority").alias("n_priorities")))
    dom = cat.orders.agg(
        F.countDistinct("o_orderpriority").alias("_dom"))
    hist = per.groupBy("n_priorities").agg(
        F.count(F.lit(1)).alias("n_customers"))
    return (hist.crossJoin(F.broadcast(dom))
            .select("n_priorities", "n_customers",
                    (F.col("n_priorities") == F.col("_dom"))
                    .alias("spans_all"))
            .orderBy("n_priorities"))


@_stage(
    "q256_weighted_quantiles",
    survey="net-new weighted quantiles (token-WEIGHTED median/p90 of document length per source — weighted value-domain histogram + prefix sums, pure integer threshold comparisons, no float anywhere; distinct from every unweighted quantile site q212/q234/q239/q242/q246)",
    oracle="""
        WITH t AS (
          SELECT source,
                 CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
                   AS n_tokens
          FROM documents),
        h AS (
          SELECT source, n_tokens, sum(n_tokens) AS w
          FROM t GROUP BY 1, 2),
        c AS (
          SELECT source, n_tokens, w,
                 sum(w) OVER (PARTITION BY source ORDER BY n_tokens
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(w) OVER (PARTITION BY source) AS tot
          FROM h)
        SELECT source,
               CAST(max(tot) AS BIGINT) AS total_tokens,
               min(CASE WHEN 2 * cum >= tot THEN n_tokens END)
                 AS w_median_tokens,
               min(CASE WHEN 10 * cum >= 9 * tot THEN n_tokens END)
                 AS w_p90_tokens
        FROM c GROUP BY source
        ORDER BY source
    """,
)
def q256_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted quantiles of document length per source: "the doc
    length below which half (90%) of the TOKENS live" — the
    sequence-packing / context-budget planning number, where the
    unweighted median (q212-class) answers a different question
    ("half the DOCS"). Entirely integer: weighted value-domain
    histogram (length -> sum of tokens), per-source prefix sums over
    the bounded length domain, and the quantile is the smallest length
    whose doubled (10×) cumulative weight clears the total (9× total)
    — threshold comparisons in exact BIGINT, no division, no floats,
    so the oracle match is definitionally bit-exact. 100 TB: one
    map-side-combined histogram aggregate; the window runs over the
    per-source LENGTH DOMAIN (value-bounded), never over documents."""
    cat = Catalog(spark, sf_dir)
    t = cat.documents.select(
        "source",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
        .alias("n_tokens"))
    h = t.groupBy("source", "n_tokens").agg(
        F.sum("n_tokens").alias("w"))
    wc = (Window.partitionBy("source").orderBy("n_tokens")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("source")
    c = (h.withColumn("cum", F.sum("w").over(wc))
         .withColumn("tot", F.sum("w").over(wt)))
    return (c.groupBy("source")
            .agg(F.max("tot").alias("total_tokens"),
                 F.min(F.when(2 * F.col("cum") >= F.col("tot"),
                              F.col("n_tokens"))).alias("w_median_tokens"),
                 F.min(F.when(10 * F.col("cum") >= 9 * F.col("tot"),
                              F.col("n_tokens"))).alias("w_p90_tokens"))
            .orderBy("source"))


@_stage(
    "q255_t_closeness",
    survey="net-new t-closeness privacy audit (per-QI-group EMD between the group's and the global ordered-sensitive-attribute distribution, Li et al. 2007 — completes the k-anonymity (q142) / l-diversity (q220) release-gate triptych; EMD over an ordered domain = sum of |cumulative differences|, exact after n_group x n_total cross-scaling)",
    oracle="""
        WITH b AS (
          SELECT c_mktsegment, n_name,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kbucket
          FROM customer JOIN nation ON c_nationkey = n_nationkey),
        cells AS (
          SELECT c_mktsegment, n_name, bal_kbucket, count(*) AS c_gb
          FROM b GROUP BY 1, 2, 3),
        grp AS (
          SELECT c_mktsegment, n_name, count(*) AS n_g
          FROM b GROUP BY 1, 2),
        bk AS (
          SELECT bal_kbucket, count(*) AS c_b FROM b GROUP BY 1),
        bkc AS (
          SELECT bal_kbucket, c_b,
                 sum(c_b) OVER (ORDER BY bal_kbucket
                                ROWS UNBOUNDED PRECEDING) AS cum_b
          FROM bk),
        tot AS (SELECT count(*) AS n,
                       count(DISTINCT bal_kbucket) AS nb FROM b),
        grid AS (
          SELECT g.c_mktsegment, g.n_name, g.n_g,
                 k.bal_kbucket, k.cum_b,
                 coalesce(c.c_gb, 0) AS c_gb
          FROM grp g CROSS JOIN bkc k
          LEFT JOIN cells c
            ON c.c_mktsegment = g.c_mktsegment
           AND c.n_name = g.n_name AND c.bal_kbucket = k.bal_kbucket),
        cg AS (
          SELECT c_mktsegment, n_name, n_g, cum_b,
                 sum(c_gb) OVER (PARTITION BY c_mktsegment, n_name
                                 ORDER BY bal_kbucket
                                 ROWS UNBOUNDED PRECEDING) AS cum_g
          FROM grid)
        SELECT cg.c_mktsegment, cg.n_name,
               max(cg.n_g) AS n_rows,
               CAST(sum(abs(tot.n * cg.cum_g - cg.n_g * cg.cum_b))
                    AS DOUBLE)
                 / (CAST(max(cg.n_g) AS DOUBLE) * CAST(tot.n AS DOUBLE)
                    * CAST(tot.nb - 1 AS DOUBLE)) AS t_closeness
        FROM cg, tot
        GROUP BY cg.c_mktsegment, cg.n_name, tot.n, tot.nb
        ORDER BY cg.c_mktsegment, cg.n_name
    """,
)
def q255_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li et al. 2007): for each quasi-identifier group
    (segment, nation), the Earth Mover's Distance between the group's
    and the global distribution of the ORDERED sensitive attribute
    (the q142 acctbal k-bucket) — the release gate l-diversity misses
    when a group's sensitive values are diverse but skewed. Over an
    ordered domain EMD reduces to the sum of |cumulative differences|;
    cross-scaling by n x n_g keeps every term an exact integer
    (DECIMAL(38) Spark-side for 100 TB, BIGINT in the fixture-bounded
    oracle), normalized once by n_g * n * (B-1) in a single IEEE
    divide — bit-identical cross-engine, emitted UNROUNDED. Zero cells
    are materialized via the group x bucket-domain grid (the q217
    chi-square discipline). 100 TB: every relation after the first
    aggregate is attribute-domain-bounded (groups x buckets); the
    per-group window runs over ≤|bucket domain| rows."""
    cat = Catalog(spark, sf_dir)
    b = (cat.customer.join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_mktsegment", "n_name",
                 F.floor(F.col("c_acctbal") / 1000).alias("bal_kbucket")))
    cells = b.groupBy("c_mktsegment", "n_name", "bal_kbucket").agg(
        F.count(F.lit(1)).alias("c_gb"))
    grp = b.groupBy("c_mktsegment", "n_name").agg(
        F.count(F.lit(1)).alias("n_g"))
    wb = (Window.orderBy("bal_kbucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bkc = (b.groupBy("bal_kbucket").agg(F.count(F.lit(1)).alias("c_b"))
           .withColumn("cum_b", F.sum("c_b").over(wb))
           .drop("c_b"))
    tot = b.agg(F.count(F.lit(1)).alias("_n"),
                F.countDistinct("bal_kbucket").alias("_nb"))
    grid = (grp.crossJoin(F.broadcast(bkc))
            .join(cells, ["c_mktsegment", "n_name", "bal_kbucket"],
                  "left")
            .withColumn("c_gb", F.coalesce(F.col("c_gb"), F.lit(0))))
    wg = (Window.partitionBy("c_mktsegment", "n_name")
          .orderBy("bal_kbucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cg = grid.withColumn("cum_g", F.sum("c_gb").over(wg))
    term = F.abs(F.col("_n").cast("decimal(38,0)") * F.col("cum_g")
                 - F.col("n_g").cast("decimal(38,0)") * F.col("cum_b"))
    return (cg.crossJoin(F.broadcast(tot))
            .groupBy("c_mktsegment", "n_name")
            .agg(F.max("n_g").alias("n_rows"),
                 (F.sum(term).cast("double")
                  / (F.max("n_g").cast("double")
                     * F.max("_n").cast("double")
                     * (F.max("_nb") - 1).cast("double")))
                 .alias("t_closeness"))
            .orderBy("c_mktsegment", "n_name"))


@_stage(
    "q254_gini_concentration",
    survey="net-new Gini / Lorenz revenue concentration (customer lifetime revenue inequality from exact integer-cents rank-weighted sums via the adaptive global-ranks machinery — G = (2*S1 - (n+1)*S)/(n*S), ONE IEEE divide; complements q248's HHI share-of-squares with the rank-based concentration read)",
    oracle="""
        WITH r AS (
          SELECT o_custkey,
                 sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS rev_c
          FROM orders GROUP BY 1),
        rn AS (
          SELECT rev_c,
                 row_number() OVER (ORDER BY rev_c, o_custkey) AS i
          FROM r),
        nn AS (SELECT count(*) AS n FROM r),
        m AS (
          SELECT nn.n AS n, sum(rev_c) AS s, sum(i * rev_c) AS s1,
                 sum(CASE WHEN 2 * i <= nn.n THEN rev_c
                          ELSE 0 END) AS bh
          FROM rn, nn GROUP BY nn.n)
        SELECT CAST(n AS BIGINT) AS n_customers,
               round(CAST(s AS DOUBLE) / 100, 2) AS total_revenue,
               CAST(2 * s1 - (n + 1) * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) AS gini,
               CAST(bh AS DOUBLE) / CAST(s AS DOUBLE)
                 AS bottom_half_rev_share
        FROM m
    """,
)
def q254_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime revenue + the Lorenz
    bottom-half share — the rank-based inequality read beside q248's
    HHI. Revenue stays exact integer cents; the global ascending rank
    comes from ``ranks.global_row_numbers`` (adaptive: plain window
    under the size probe, range-partitioned above — the q101-certified
    construction, so the customer-grain sort is never a single
    partition at scale). With x sorted ascending and i = 1..n,
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)): numerator and
    denominator are exact DECIMAL(38) (BIGINT in the fixture-bounded
    oracle), the quotient ONE IEEE divide — bit-identical
    cross-engine, emitted UNROUNDED. Rank ties cannot affect the sums
    (equal x within a tie group makes sum(i*x) tie-order invariant),
    but the (rev, custkey) order is total anyway. 100 TB: one
    customer-grain aggregate, one distributed rank, one scalar moment
    aggregate."""
    from .operators.ranks import global_row_numbers
    cat = Catalog(spark, sf_dir)
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    r = (cat.orders.select("o_custkey", cents.alias("c"))
         .groupBy("o_custkey")
         .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("rev_c")))
    rn = global_row_numbers(
        r, [F.col("rev_c").asc(), F.col("o_custkey").asc()], out_col="i")
    nfr = r.agg(F.count(F.lit(1)).alias("_n"))
    m = (rn.crossJoin(F.broadcast(nfr))
         .agg(F.max("_n").alias("n"),
              F.sum("rev_c").alias("s"),
              F.sum(F.col("i").cast("decimal(38,0)") * F.col("rev_c"))
              .alias("s1"),
              F.sum(F.when(2 * F.col("i") <= F.col("_n"),
                           F.col("rev_c")).otherwise(F.lit(0)))
              .alias("bh")))
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(s_d / 100, 2).alias("total_revenue"),
        ((2 * F.col("s1") - (F.col("n") + 1).cast("decimal(38,0)")
          * F.col("s")).cast("double") / (n_d * s_d)).alias("gini"),
        (F.col("bh").cast("double") / s_d).alias("bottom_half_rev_share"))


@_stage(
    "q257_degree_assortativity",
    survey="net-new graph degree audit + assortativity (degree-degree Pearson over interaction-graph edge endpoints from exact integer moment sums — the graph-health read beside q141's PageRank and q167's triangles; hub-hub vs hub-leaf wiring decides whether degree-keyed partitioning skews)",
    oracle="""
        WITH e AS (
          SELECT DISTINCT o_custkey AS u, l_partkey AS i
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        du AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
        di AS (SELECT i, count(*) AS d FROM e GROUP BY 1),
        ej AS (
          SELECT du.d AS x, di.d AS y
          FROM e JOIN du ON e.u = du.u JOIN di ON e.i = di.i),
        m AS (
          SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy, max(x) AS mx, max(y) AS my
          FROM ej)
        SELECT CAST(n AS BIGINT) AS n_edges,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
                 AS assortativity,
               CAST(mx AS BIGINT) AS max_user_degree,
               CAST(my AS BIGINT) AS max_item_degree
        FROM m
    """,
)
def q257_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the customer-part interaction graph:
    Pearson correlation between the user-side and item-side degrees
    across edges — positive means hubs wire to hubs (degree-keyed
    shuffles will skew together), negative means hub-leaf wiring (the
    salting target is one side only). All five moment sums (n, Σx, Σy,
    Σx², Σy², Σxy) accumulate as exact integers (DECIMAL(38) Spark /
    HUGEINT oracle); the coefficient is the fixed IEEE tree
    num/sqrt(a·b) over exact-valued casts — deterministic cross-engine
    (each int→double cast, the product, the sqrt, and the divide are
    all correctly rounded), emitted UNROUNDED. 100 TB: the edge
    relation shuffles once per degree join (hash on u, then on i — AQE
    handles the skewed-hub case this query measures); the moment
    aggregate is map-side combined."""
    cat = Catalog(spark, sf_dir)
    e = (cat.lineitem.select("l_orderkey", "l_partkey")
         .join(cat.orders.select("o_orderkey", "o_custkey"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .select(F.col("o_custkey").alias("u"),
                 F.col("l_partkey").alias("i")).distinct())
    du = e.groupBy("u").agg(F.count(F.lit(1)).alias("x"))
    di = e.groupBy("i").agg(F.count(F.lit(1)).alias("y"))
    ej = e.join(du, "u").join(di, "i")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ej.agg(F.count(F.lit(1)).alias("n"),
               F.sum(dec("x")).alias("sx"), F.sum(dec("y")).alias("sy"),
               F.sum(dec("x") * dec("x")).alias("sxx"),
               F.sum(dec("y") * dec("y")).alias("syy"),
               F.sum(dec("x") * dec("y")).alias("sxy"),
               F.max("x").alias("mx"), F.max("y").alias("my"))
    n = dec("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    va = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vb = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_edges"),
        (num / F.sqrt(va * vb)).alias("assortativity"),
        F.col("mx").cast("bigint").alias("max_user_degree"),
        F.col("my").cast("bigint").alias("max_item_degree"))


@_stage(
    "q258_cusum_changepoint",
    survey="net-new CUSUM change-point localization (per event type over daily counts: argmax |prefix(n*x_i - S)| in n-scaled integers — the q252 exact-comparison discipline applied to drift LOCALIZATION, where q175's PSI and q225's slopes only measure drift magnitude; F8: fixture daily counts are Poisson-flat, so the read is honestly 'peak consistent with noise')",
    oracle="""
        WITH d AS (
          SELECT event_type,
                 strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                 CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT event_type, day, x,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_days,
                 sum(x) OVER (PARTITION BY event_type) AS tot
          FROM d),
        c AS (
          SELECT event_type, day, n_days,
                 sum(n_days * x - tot) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS cusum
          FROM s),
        r AS (
          SELECT event_type, day, n_days, cusum,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY abs(cusum) DESC, day ASC)
                   AS rk
          FROM c)
        SELECT event_type, day AS change_day,
               CAST(abs(cusum) AS DOUBLE) / CAST(n_days AS DOUBLE)
                 AS cusum_peak,
               n_days
        FROM r WHERE rk = 1
        ORDER BY event_type
    """,
)
def q258_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point localization per event type: the day k
    maximizing |Σ_{i≤k}(x_i − x̄)| over the daily-count series — the
    standard level-shift locator. Computed without ever forming x̄:
    the prefix of n·x_i − S is exactly n·(P_k − k·x̄), so all
    accumulation is integer (n-scaled, the q252 discipline) and the
    single IEEE divide by n lands the classic CUSUM peak in count
    units. Tiebreak: earliest day. Days emitted as yyyy-MM-dd STRINGS
    (the q246 dtype-gate convention; ISO strings sort
    chronologically). 100 TB: both windows run over the (type × day)
    relation — horizon-bounded (the q244 exception class), never
    event-grain; the daily-count aggregate beneath is map-side
    combined."""
    cat = Catalog(spark, sf_dir)
    d = (cat.events.groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd")
            .alias("day"))
         .agg(F.count(F.lit(1)).alias("x")))
    wt = Window.partitionBy("event_type")
    wc = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    s = (d.withColumn("n_days", F.count(F.lit(1)).over(wt))
         .withColumn("tot", F.sum("x").over(wt)))
    c = s.withColumn(
        "cusum",
        F.sum(F.col("n_days") * F.col("x") - F.col("tot")).over(wc))
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day").asc())
    return (c.withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") == 1)
            .select("event_type", F.col("day").alias("change_day"),
                    (F.abs(F.col("cusum")).cast("double")
                     / F.col("n_days").cast("double")).alias("cusum_peak"),
                    "n_days")
            .orderBy("event_type"))


@_stage(
    "q259_ks_aa_test",
    survey="net-new two-sample Kolmogorov-Smirnov statistic (purchase-vs-view event values — the distributional A/A twin of q247's proportion z-test, F8: value is type-independent by construction so the honest read is null-calibration; exact cross-multiplied integer ECDF gap n_v*CP(v) - n_p*CV(v) prefix-summed over the near-unique value domain via the adaptive ranks machinery)",
    oracle="""
        WITH ev AS (
          SELECT event_type, value FROM events
          WHERE event_type IN ('purchase', 'view')),
        n AS (
          SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS np,
                 sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS nv
          FROM ev),
        pv AS (
          SELECT value,
                 sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS pc,
                 sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS vc
          FROM ev GROUP BY value),
        c AS (
          SELECT value,
                 sum(n.nv * pv.pc - n.np * pv.vc) OVER (
                   ORDER BY value ROWS UNBOUNDED PRECEDING) AS gap
          FROM pv, n),
        d AS (SELECT max(abs(gap)) AS dmax FROM c),
        at_v AS (
          SELECT min(value) AS ks_at_value
          FROM c, d WHERE abs(c.gap) = d.dmax)
        SELECT CAST(n.np AS BIGINT) AS n_purchase,
               CAST(n.nv AS BIGINT) AS n_view,
               CAST(d.dmax AS DOUBLE)
                 / (CAST(n.np AS DOUBLE) * CAST(n.nv AS DOUBLE)) AS ks_d,
               at_v.ks_at_value
        FROM n, d, at_v
    """,
)
def q259_ks_aa_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between purchase and view event values —
    framed as the distributional A/A companion to q247's proportion
    z-test (F8: ``value`` is type-independent by construction, so a
    large D here means the pipeline broke, not the data drifted).
    Exact: per distinct value the scaled ECDF gap
    n_v·CP(v) − n_p·CV(v) accumulates as the prefix sum of integer
    per-value deltas (one ``ranks.global_prefix_sum`` over the value
    order — adaptive: plain window under the size probe, the
    range-partitioned construction above it, because the value domain
    is NEAR-UNIQUE and therefore event-grain at 100 TB — exactly the
    q251 wall class, handled by the same machinery). D = max|gap| with
    the earliest attaining value, normalized by ONE IEEE divide by
    n_p·n_v. Build-time note: the adaptive size probe is a bounded
    metadata action (driver-metadata-probe class). 100 TB: per-value
    counts are map-side combined; the argmax is a 1-row frame
    semi-join, never a global order-by-|gap| window."""
    from .operators.ranks import RANKS_SMALL_INPUT_MAX, global_prefix_sum
    cat = Catalog(spark, sf_dir)
    ev = (cat.events.filter(F.col("event_type").isin("purchase", "view"))
          .select("event_type", "value"))
    nfr = ev.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("np"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .alias("nv"))
    pv = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("pc"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .alias("vc"))
    delta = (pv.crossJoin(F.broadcast(nfr))
             .select("value",
                     (F.col("nv").cast("decimal(38,0)") * F.col("pc")
                      - F.col("np").cast("decimal(38,0)") * F.col("vc"))
                     .alias("delta")))
    c = global_prefix_sum(delta, [F.col("value").asc()], "delta",
                          out_col="gap",
                          small_input_max=RANKS_SMALL_INPUT_MAX)
    dfr = c.agg(F.max(F.abs(F.col("gap"))).alias("dmax"))
    at_v = (c.join(F.broadcast(dfr),
                   F.abs(F.col("gap")) == F.col("dmax"))
            .agg(F.min("value").alias("ks_at_value")))
    return (nfr.crossJoin(F.broadcast(dfr)).crossJoin(F.broadcast(at_v))
            .select(F.col("np").cast("bigint").alias("n_purchase"),
                    F.col("nv").cast("bigint").alias("n_view"),
                    (F.col("dmax").cast("double")
                     / (F.col("np").cast("double")
                        * F.col("nv").cast("double"))).alias("ks_d"),
                    "ks_at_value"))


@_stage(
    "q260_knn_hubness",
    survey="net-new kNN-graph hubness audit (in-degree histogram of the exact int8-quantized top-k graph over a deterministic probe subset — the hub-vector concentration diagnosis that motivates q190's margin criterion; bounded-probe contract, integer dot ranking, zero-degree mass included)",
    oracle="""
        WITH qz AS (
          SELECT vec_id,
                 CASE WHEN list_max(list_transform(embedding,
                                                   x -> abs(x))) = 0
                      THEN list_transform(embedding,
                                          x -> CAST(0 AS BIGINT))
                      ELSE list_transform(embedding, x -> CAST(floor(
                           x::DOUBLE * 127.0 /
                           list_max(list_transform(embedding,
                                    y -> abs(y)))::DOUBLE)
                           AS BIGINT)) END AS q
          FROM embeddings),
        scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                      i -> a.q[i] * b.q[i])) AS BIGINT) AS qdot
          FROM qz a JOIN qz b
            ON a.vec_id % 16 = 0 AND b.vec_id <> a.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY qdot DESC, neighbor_id ASC)
                   AS rank
          FROM scored),
        indeg AS (
          SELECT neighbor_id, CAST(count(*) AS BIGINT) AS in_degree
          FROM ranked WHERE rank <= 5 GROUP BY 1),
        hist AS (
          SELECT in_degree, CAST(count(*) AS BIGINT) AS n_vectors
          FROM indeg GROUP BY 1),
        z AS (
          SELECT CAST(0 AS BIGINT) AS in_degree,
                 (SELECT count(*) FROM embeddings)
                   - (SELECT count(*) FROM indeg) AS n_vectors)
        SELECT in_degree, n_vectors FROM hist
        UNION ALL SELECT in_degree, n_vectors FROM z
        ORDER BY in_degree
    """,
)
def q260_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the embedding space: how unevenly do vectors
    appear in other vectors' top-k — the pathology (Radovanović et al.
    2010) that q190's margin criterion exists to suppress. The exact
    top-5 graph is built by ``similarity.quantized_topk`` (q117's
    int8 integer-dot ranking — exact, deterministic, oracle-certified)
    over the deterministic probe subset ``vec_id % 16 == 0`` (the
    bounded-probe contract every ANN tier certifies under); in-degrees
    roll into a histogram with the zero-degree mass included via one
    scalar subtraction, so "share of the corpus never retrieved" reads
    directly off the first row. 100 TB: probes broadcast, the corpus
    scan never shuffles (per-query top-k prunes map-side via the
    WindowGroupLimit partial), and the histogram is value-domain."""
    from .operators import similarity as sim
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    probes = emb.filter(F.col("vec_id") % 16 == 0)
    topk = sim.quantized_topk(emb, probes, k=5)
    indeg = (topk.groupBy("neighbor_id")
             .agg(F.count(F.lit(1)).alias("in_degree")))
    hist = (indeg.groupBy("in_degree")
            .agg(F.count(F.lit(1)).alias("n_vectors")))
    ntot = emb.agg(F.count(F.lit(1)).alias("_nt"))
    napp = indeg.agg(F.count(F.lit(1)).alias("_na"))
    zero = (ntot.crossJoin(napp)
            .select(F.lit(0).cast("bigint").alias("in_degree"),
                    (F.col("_nt") - F.col("_na")).alias("n_vectors")))
    return hist.unionByName(zero).orderBy("in_degree")


@_stage(
    "q261_cohort_ltv_curve",
    survey="net-new weekly-cohort LTV accumulation curve (per first-purchase-week cohort: cumulative revenue per user by cohort age in weeks — the revenue-accumulation read q137's retention counts, q237's state transitions, and q242's latency quantiles all miss; exact integer-cents cumulative sums over the horizon-bounded (cohort x age) grid)",
    oracle="""
        WITH p AS (
          SELECT user_id,
                 (date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  // 7) AS wk,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase'),
        f AS (SELECT user_id, min(wk) AS cw FROM p GROUP BY 1),
        cs AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_users
               FROM f GROUP BY 1),
        a AS (
          SELECT f.cw, p.wk - f.cw AS age, sum(p.c) AS rev_c
          FROM p JOIN f ON p.user_id = f.user_id
          GROUP BY 1, 2),
        cum AS (
          SELECT cw, age,
                 sum(rev_c) OVER (PARTITION BY cw ORDER BY age
                                  ROWS UNBOUNDED PRECEDING) AS cum_c
          FROM a)
        SELECT CAST(cum.cw AS BIGINT) AS cohort_week,
               CAST(cum.age AS BIGINT) AS age_weeks,
               cs.n_users,
               round(CAST(cum.cum_c AS DOUBLE) / 100, 2) AS cum_revenue,
               CAST(cum.cum_c AS DOUBLE)
                 / (100.0 * CAST(cs.n_users AS DOUBLE)) AS ltv_per_user
        FROM cum JOIN cs ON cum.cw = cs.cw
        ORDER BY cohort_week, age_weeks
    """,
)
def q261_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV accumulation: users cohorted by FIRST-purchase
    calendar week, revenue accumulated by cohort age — "how much has a
    week-w signup cohort spent per head by age k", the curve whose
    flattening point prices acquisition. Week indexes are integer day
    arithmetic from the q241 epoch (never date_trunc — engine week
    conventions differ); revenue accumulates as exact integer cents
    (DECIMAL(18,2)·100); the cumulative window runs per cohort over
    the AGE domain (horizon-bounded — the q244 exception class);
    per-user LTV is the fixed tree cents/(100·n_users), two
    correctly-rounded IEEE ops over exact operands, emitted UNROUNDED
    beside the q254-convention rounded total. Ages with zero purchases
    are simply absent (the cumulative is still correct at every
    observed age; a reporting layer can forward-fill). 100 TB: one
    row-grain first-purchase aggregate keyed by user, one
    (cohort, age) aggregate — both map-side combined; everything after
    is grid-sized."""
    cat = Catalog(spark, sf_dir)
    p = (cat.events.filter(F.col("event_type") == "purchase")
         .select("user_id",
                 F.floor(F.datediff(F.col("ts").cast("date"),
                                    F.lit("2024-01-01").cast("date")) / 7)
                 .alias("wk"),
                 F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100"
                        " AS BIGINT)").alias("c")))
    f = p.groupBy("user_id").agg(F.min("wk").alias("cw"))
    cs = f.groupBy("cw").agg(F.count(F.lit(1)).alias("n_users"))
    a = (p.join(f, "user_id")
         .groupBy("cw", (F.col("wk") - F.col("cw")).alias("age"))
         .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("rev_c")))
    wc = (Window.partitionBy("cw").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = a.withColumn("cum_c", F.sum("rev_c").over(wc))
    return (cum.join(cs, "cw")
            .select(F.col("cw").cast("bigint").alias("cohort_week"),
                    F.col("age").cast("bigint").alias("age_weeks"),
                    "n_users",
                    F.round(F.col("cum_c").cast("double") / 100, 2)
                    .alias("cum_revenue"),
                    (F.col("cum_c").cast("double")
                     / (F.lit(100.0) * F.col("n_users").cast("double")))
                    .alias("ltv_per_user"))
            .orderBy("cohort_week", "age_weeks"))
