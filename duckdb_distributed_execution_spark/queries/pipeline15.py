"""Fifteenth-wave operators — statistical data-audit analytics:
Benford leading-digit screening, Cramér's V association, decision-
stump Gini splits, two-sample Kolmogorov-Smirnov, HHI market
concentration, fixed-bin classifier calibration, PSI distribution
drift, and two-feature closed-form OLS.

Cross-engine float determinism follows the repo conventions
(see functions/__init__.py): every cross-row sum is integral
(counts, micro-scaled money, decimal power sums); doubles appear
only in per-row/per-group terms computed with an identical
expression tree on both engines; the irreducible float reductions
(chi-squared cells, PSI terms) are left folds over identically
ordered lists — the `chi_squared_independence` idiom.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

def _w_all():
    """Full-frame window spec, built lazily.

    Constructing a Window spec touches the active SparkSession, so a
    module-scope constant would make importing this module (and thus
    ``all_queries()`` / ``oracle_sql()``) require a running JVM — which
    breaks SparkSession-less consumers such as ``tools/bench_duckdb.py``.
    """
    return Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


# ---------------------------------------------------------------------------
# Benford leading-digit screening
# ---------------------------------------------------------------------------


@register(
    "benford_leading_digit",
    oracle="""
    WITH b AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) AS digit,
             COUNT(*) AS n_obs
      FROM orders GROUP BY 1)
    SELECT digit, n_obs,
           ROUND(CAST(n_obs AS DOUBLE) / SUM(n_obs) OVER (), 6)
             AS obs_share,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share
    FROM b
    """,
)
def benford_leading_digit(spark, sf_dir):
    """Benford's-law audit of order totals — the classic
    fabricated-data screen (synthetic/duplicated records distort the
    leading-digit curve). The corpus collapses to a 9-row digit
    histogram in one partial-agg'd shuffle; shares are one division
    from exact counts; the Benford expectation log10(1+1/d) is a
    per-row double both engines compute from the same integer.
    FLOOR before the string cast keeps digit extraction in integer
    space — no double-formatting divergence."""
    o = load(spark, sf_dir, "orders")["orders"]
    b = o.groupBy(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    return b.select(
        "digit",
        "n_obs",
        F.round(
            F.col("n_obs").cast("double") / F.sum("n_obs").over(_w_all()), 6
        ).alias("obs_share"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias(
            "benford_share"
        ),
    )


# ---------------------------------------------------------------------------
# Cramér's V association strength
# ---------------------------------------------------------------------------


@register(
    "cramers_v_association",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS o
      FROM lineitem GROUP BY 1, 2),
    m AS (
      SELECT rf, ls, o,
             SUM(o) OVER (PARTITION BY rf) AS rt,
             SUM(o) OVER (PARTITION BY ls) AS ct,
             SUM(o) OVER () AS n
      FROM cells),
    t AS (
      SELECT rf, ls, n,
             (CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct) AS d,
             CAST(rt AS DOUBLE) * ct * n AS denom
      FROM m),
    agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n_rows_total,
             CAST(LEAST(COUNT(DISTINCT rf) - 1, COUNT(DISTINCT ls) - 1)
                  AS INT) AS min_dim,
             list_reduce(list(d * d / denom ORDER BY rf, ls),
                         (a, b) -> a + b) AS chi2
      FROM t)
    SELECT n_rows_total, ROUND(chi2, 6) AS chi2,
           ROUND(SQRT(chi2 / (n_rows_total * min_dim)), 6) AS cramers_v
    FROM agg
    """,
)
def cramers_v_association(spark, sf_dir):
    """Cramér's V between return flag and line status — the [0,1]
    normalized effect size on top of the chi-squared statistic, the
    number an auditor actually compares across column pairs. Same
    bounded-cells shape as `chi_squared_independence` (the cross-cell
    float sum is a left fold over a (rf, ls)-sorted list); V adds one
    sqrt over exact-integer-derived doubles."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    cells = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
    ).agg(F.count(F.lit(1)).alias("o"))
    m = (
        cells.withColumn("rt", F.sum("o").over(Window.partitionBy("rf")))
        .withColumn("ct", F.sum("o").over(Window.partitionBy("ls")))
        .withColumn("n", F.sum("o").over(_w_all()))
    )
    t = m.select(
        "rf",
        "ls",
        "n",
        (
            F.col("o").cast("double") * F.col("n")
            - F.col("rt").cast("double") * F.col("ct")
        ).alias("d"),
        (F.col("rt").cast("double") * F.col("ct") * F.col("n")).alias(
            "denom"
        ),
    )
    agg = t.agg(
        F.max("n").cast("long").alias("n_rows_total"),
        F.least(
            F.countDistinct("rf") - 1, F.countDistinct("ls") - 1
        )
        .cast("int")
        .alias("min_dim"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "rf",
                        "ls",
                        (F.col("d") * F.col("d") / F.col("denom")).alias(
                            "term"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2"),
    )
    return agg.select(
        "n_rows_total",
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2") / (F.col("n_rows_total") * F.col("min_dim"))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Decision-stump best split by weighted Gini impurity
# ---------------------------------------------------------------------------


@register(
    "gini_best_split",
    oracle="""
    WITH h AS (
      SELECT CAST(l_quantity AS INT) AS q,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS p,
             SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS g
      FROM lineitem GROUP BY 1),
    c AS (
      SELECT q,
             SUM(p) OVER (ORDER BY q) AS pl,
             SUM(g) OVER (ORDER BY q) AS gl,
             SUM(p) OVER () AS tp,
             SUM(g) OVER () AS tg
      FROM h),
    s AS (
      SELECT q, pl + gl AS nl, (tp - pl) + (tg - gl) AS nr, tp + tg AS n,
             CAST(CAST(pl * pl + gl * gl AS DECIMAL(38,0))
                    * ((tp - pl) + (tg - gl))
                  + CAST((tp - pl) * (tp - pl) + (tg - gl) * (tg - gl)
                         AS DECIMAL(38,0)) * (pl + gl)
                  AS DOUBLE) AS num
      FROM c
      WHERE (tp - pl) + (tg - gl) > 0),
    ranked AS (
      SELECT q, nl, nr, n, num / (CAST(nl AS DOUBLE) * nr) AS purity
      FROM s)
    SELECT q AS split_at, CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right,
           ROUND((n - purity) / n, 6) AS weighted_gini
    FROM ranked
    ORDER BY purity DESC, q ASC
    LIMIT 1
    """,
)
def gini_best_split(spark, sf_dir):
    """Best decision-stump threshold on quantity predicting
    return-flag='R', by weighted Gini impurity — the inner loop of
    every tree/GBM trainer, run as ONE pass: the corpus collapses to
    a per-quantity class histogram (bounded by the feature domain,
    not the corpus), cumulative windows give every candidate split's
    left/right class counts, and minimizing weighted Gini is recast
    as maximizing S = (pl²+gl²)/nl + (pr²+gr²)/nr, whose numerator
    stays in exact DECIMAL(38,0) integer arithmetic — the only float
    op per candidate is one division, so the argmax ordering (purity
    DESC, threshold ASC tiebreak) is engine-exact."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    h = li.groupBy(F.col("l_quantity").cast("int").alias("q")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "p"
        ),
        F.sum(F.when(F.col("l_returnflag") == "R", 0).otherwise(1)).alias(
            "g"
        ),
    )
    wcum = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        "q",
        F.sum("p").over(wcum).alias("pl"),
        F.sum("g").over(wcum).alias("gl"),
        F.sum("p").over(_w_all()).alias("tp"),
        F.sum("g").over(_w_all()).alias("tg"),
    )
    pr = F.col("tp") - F.col("pl")
    gr = F.col("tg") - F.col("gl")
    s = c.where((pr + gr) > 0).select(
        "q",
        (F.col("pl") + F.col("gl")).alias("nl"),
        (pr + gr).alias("nr"),
        (F.col("tp") + F.col("tg")).alias("n"),
        (
            (F.col("pl") * F.col("pl") + F.col("gl") * F.col("gl")).cast(
                "decimal(38,0)"
            )
            * (pr + gr)
            + (pr * pr + gr * gr).cast("decimal(38,0)")
            * (F.col("pl") + F.col("gl"))
        )
        .cast("double")
        .alias("num"),
    )
    ranked = s.select(
        "q",
        "nl",
        "nr",
        "n",
        (F.col("num") / (F.col("nl").cast("double") * F.col("nr"))).alias(
            "purity"
        ),
    )
    return (
        ranked.orderBy(F.col("purity").desc(), F.col("q").asc())
        .limit(1)
        .select(
            F.col("q").alias("split_at"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            F.round((F.col("n") - F.col("purity")) / F.col("n"), 6).alias(
                "weighted_gini"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------


@register(
    "ks_two_sample",
    oracle="""
    WITH h AS (
      SELECT l_discount AS v,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS nb
      FROM lineitem GROUP BY 1),
    c AS (
      SELECT v,
             SUM(na) OVER (ORDER BY v) AS ca,
             SUM(nb) OVER (ORDER BY v) AS cb,
             SUM(na) OVER () AS ta,
             SUM(nb) OVER () AS tb
      FROM h),
    d AS (
      SELECT v, ta, tb,
             ABS(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)
               AS gap
      FROM c),
    mx AS (SELECT MAX(gap) AS ks FROM d)
    SELECT CAST(MAX(d.ta) AS BIGINT) AS n_a,
           CAST(MAX(d.tb) AS BIGINT) AS n_b,
           ROUND(MAX(mx.ks), 6) AS ks_stat,
           MIN(d.v) FILTER (WHERE d.gap = mx.ks) AS at_value
    FROM d, mx
    """,
)
def ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the discount
    distributions of returned vs kept lineitems — the standard
    distribution-shift gate between a data slice and its parent
    (train/serve drift, A/B sanity). ECDFs come from one bounded
    value-histogram plus cumulative windows; each gap is two
    divisions from exact integers (engine-exact doubles), so MAX and
    the argmax location (min value attaining it) are deterministic.
    No per-row ranking — the corpus never funnels through one task."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    h = li.groupBy(F.col("l_discount").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "na"
        ),
        F.sum(F.when(F.col("l_returnflag") == "R", 0).otherwise(1)).alias(
            "nb"
        ),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        "v",
        F.sum("na").over(wcum).alias("ca"),
        F.sum("nb").over(wcum).alias("cb"),
        F.sum("na").over(_w_all()).alias("ta"),
        F.sum("nb").over(_w_all()).alias("tb"),
    )
    d = c.select(
        "v",
        "ta",
        "tb",
        F.abs(
            F.col("ca").cast("double") / F.col("ta")
            - F.col("cb").cast("double") / F.col("tb")
        ).alias("gap"),
    ).withColumn("ks", F.max("gap").over(_w_all()))
    return d.agg(
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
        F.round(F.max("ks"), 6).alias("ks_stat"),
        F.min(F.when(F.col("gap") == F.col("ks"), F.col("v"))).alias(
            "at_value"
        ),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration
# ---------------------------------------------------------------------------


@register(
    "hhi_concentration",
    oracle="""
    WITH s AS (
      SELECT n_name, o_custkey,
             SUM(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
               AS sp
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2)
    SELECT n_name, COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(sp AS HUGEINT) * sp) AS DOUBLE)
                 / (CAST(SUM(sp) AS DOUBLE) * CAST(SUM(sp) AS DOUBLE)),
                 6) AS hhi
    FROM s GROUP BY 1
    """,
)
def hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman revenue-concentration index per customer
    nation — Σ share² where share = customer spend / nation spend; the
    regulator's concentration metric, and for a corpus, the 'is one
    source dominating this domain' audit. Spend is micro-scaled to
    exact longs (the exact_sum convention), squares accumulate in
    DECIMAL — Σsp² = Σ(sp·sp) stays exact for per-customer spend up to
    1e18 micros ($1e12, safe at any scale factor) — and HHI is a
    single double division, so per-nation values are engine-exact.
    Dims broadcast; the only corpus shuffle is the customer-keyed
    aggregate."""
    t = load(spark, sf_dir, "orders", "customer", "nation")
    s = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + 0.5).cast(
                    "bigint"
                )
            ).alias("sp")
        )
    )
    return s.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum(
                F.col("sp").cast("decimal(18,0)")
                * F.col("sp").cast("decimal(18,0)")
            ).cast("double")
            / (F.sum("sp").cast("double") * F.sum("sp").cast("double")),
            6,
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# Fixed-bin classifier calibration (reliability table)
# ---------------------------------------------------------------------------


@register(
    "calibration_fixed_bins",
    oracle="""
    SELECT LEAST(9, CAST(n_chars // 200 AS INT)) AS bin,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS en_rate,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6)
             AS avg_chars
    FROM documents GROUP BY 1
    """,
)
def calibration_fixed_bins(spark, sf_dir):
    """Reliability table for 'document length predicts lang=en':
    fixed-width 200-char score bins (capped at bin 9) vs the observed
    positive rate per bin — the table behind every calibration curve,
    and the fixed-bin form is the one that scales (quantile bins need
    a rank; width bins are a pure projection). Integer binning, exact
    integer counts/sums, one division per bin."""
    d = load(spark, sf_dir, "documents")["documents"]
    return d.groupBy(
        F.least(F.lit(9), F.floor(F.col("n_chars") / 200).cast("int")).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("en_rate"),
        F.round(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index drift
# ---------------------------------------------------------------------------


@register(
    "psi_priority_drift",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS pri,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                      THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                      THEN 0 ELSE 1 END) AS cb
      FROM orders GROUP BY 1),
    t AS (
      SELECT pri, ca, cb,
             SUM(ca) OVER () AS ta, SUM(cb) OVER () AS tb
      FROM c),
    terms AS (
      SELECT pri,
             (CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)
               * LN((CAST(ca AS DOUBLE) / ta)
                    / (CAST(cb AS DOUBLE) / tb)) AS term
      FROM t)
    SELECT CAST(COUNT(*) AS INT) AS n_bins,
           ROUND(list_reduce(list(term ORDER BY pri),
                             (a, b) -> a + b), 6) AS psi
    FROM terms
    """,
)
def psi_priority_drift(spark, sf_dir):
    """Population Stability Index of the order-priority mix, early
    period vs late — THE model-monitoring drift score (PSI > 0.2 =
    investigate). The corpus collapses to a per-category two-period
    count table; each term (pa−pb)·ln(pa/pb) is a fixed-op-order
    double from exact integers, and the cross-category float sum is a
    left fold over a priority-sorted list (the chi-squared idiom).
    Assumes every category occurs in both periods — true for bounded
    enum-like columns; a production wrapper would Laplace-smooth."""
    o = load(spark, sf_dir, "orders")["orders"]
    cutoff = F.lit("1998-01-01").cast("timestamp")
    c = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.sum(F.when(F.col("o_orderdate") < cutoff, 1).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("o_orderdate") < cutoff, 0).otherwise(1)).alias(
            "cb"
        ),
    )
    t = c.withColumn("ta", F.sum("ca").over(_w_all())).withColumn(
        "tb", F.sum("cb").over(_w_all())
    )
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    terms = t.select("pri", ((pa - pb) * F.log(pa / pb)).alias("term"))
    return terms.agg(
        F.count(F.lit(1)).cast("int").alias("n_bins"),
        F.round(
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("pri", "term"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ),
            6,
        ).alias("psi"),
    )


# ---------------------------------------------------------------------------
# Two-feature closed-form OLS
# ---------------------------------------------------------------------------


@register(
    "linreg_two_feature",
    oracle="""
    WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
                  AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
                  AS DOUBLE) AS s11,
             CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(28,6)))
                  AS DOUBLE) AS s12,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,6)))
                  AS DOUBLE) AS s22,
             CAST(SUM(CAST(l_quantity * l_extendedprice
                           AS DECIMAL(28,6))) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(l_discount * l_extendedprice
                           AS DECIMAL(28,6))) AS DOUBLE) AS s2y,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice
                           AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM lineitem),
    m AS (
      SELECT n,
             n * s11 - s1 * s1 AS c11,
             n * s12 - s1 * s2 AS c12,
             n * s22 - s2 * s2 AS c22,
             n * s1y - s1 * sy AS c1y,
             n * s2y - s2 * sy AS c2y,
             n * syy - sy * sy AS cyy,
             s1, s2, sy
      FROM s),
    b AS (
      SELECT n, s1, s2, sy, c1y, c2y, cyy,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
      FROM m)
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(b1, 6) AS beta_qty,
           ROUND(b2, 6) AS beta_disc,
           ROUND((sy - b1 * s1 - b2 * s2) / n, 6) AS intercept,
           ROUND((b1 * c1y + b2 * c2y) / cyy, 6) AS r2
    FROM b
    """,
)
def linreg_two_feature(spark, sf_dir):
    """Two-feature OLS (extendedprice ~ quantity + discount) solved
    in closed form from one aggregation pass — the distributed way to
    fit a small linear model: ship exact power sums, solve the 2×2
    normal equations on 10 numbers. All cross-row sums accumulate in
    DECIMAL (order-independent); the solve is a fixed expression tree
    over those exact sums, so coefficients, intercept, and R² are
    engine-exact. Single-feature sibling: `regr_aggregates`
    (queries/extras.py)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    dec = "decimal(28,6)"
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("s1"),
        F.sum(F.col("l_discount").cast(dec)).cast("double").alias("s2"),
        F.sum(F.col("l_extendedprice").cast(dec))
        .cast("double")
        .alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(dec))
        .cast("double")
        .alias("s11"),
        F.sum((F.col("l_quantity") * F.col("l_discount")).cast(dec))
        .cast("double")
        .alias("s12"),
        F.sum((F.col("l_discount") * F.col("l_discount")).cast(dec))
        .cast("double")
        .alias("s22"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast(dec))
        .cast("double")
        .alias("s1y"),
        F.sum((F.col("l_discount") * F.col("l_extendedprice")).cast(dec))
        .cast("double")
        .alias("s2y"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    m = s.select(
        n.alias("n"),
        "s1",
        "s2",
        "sy",
        (n * F.col("s11") - F.col("s1") * F.col("s1")).alias("c11"),
        (n * F.col("s12") - F.col("s1") * F.col("s2")).alias("c12"),
        (n * F.col("s22") - F.col("s2") * F.col("s2")).alias("c22"),
        (n * F.col("s1y") - F.col("s1") * F.col("sy")).alias("c1y"),
        (n * F.col("s2y") - F.col("s2") * F.col("sy")).alias("c2y"),
        (n * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b = m.select(
        "n",
        "s1",
        "s2",
        "sy",
        "c1y",
        "c2y",
        "cyy",
        (
            (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12"))
            / det
        ).alias("b1"),
        (
            (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12"))
            / det
        ).alias("b2"),
    )
    return b.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round("b1", 6).alias("beta_qty"),
        F.round("b2", 6).alias("beta_disc"),
        F.round(
            (
                F.col("sy")
                - F.col("b1") * F.col("s1")
                - F.col("b2") * F.col("s2")
            )
            / F.col("n"),
            6,
        ).alias("intercept"),
        F.round(
            (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y"))
            / F.col("cyy"),
            6,
        ).alias("r2"),
    )
