"""Fourteenth-wave operators — ML-evaluation and governance
analytics: ordered funnel conversion, cohort retention, rank-based
AUC, chi-squared independence, k-anonymity audit, stopword
normalization, weighted median, and an exact correlation matrix.

Cross-engine float determinism follows the repo conventions: integer
or decimal accumulation wherever a sum crosses rows (AUC's rank sum
is kept integral by working in half-units; the correlation matrix's
power sums are DECIMAL(38,0)/HUGEINT), and where a float sum is
irreducible (chi-squared cell terms) the terms are folded
left-to-right over an identically-ordered list on both engines — the
`text_token_entropy` data-ordered-fold idiom.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Ordered funnel conversion
# ---------------------------------------------------------------------------


@register(
    "funnel_steps_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS step1_view_users,
           (SELECT COUNT(*) FROM c) AS step2_click_users,
           (SELECT COUNT(*) FROM p) AS step3_purchase_users,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 6) AS full_funnel_rate
    """,
)
def funnel_steps_conversion(spark, sf_dir):
    """STRICTLY-ORDERED funnel: users whose first view precedes a
    click that precedes a purchase (view → click-after-view →
    purchase-after-that-click). This is the product-analytics funnel
    the transition matrix (`event_transition_matrix`) and path view
    (`session_path_topk`) don't give you: each step requires temporal
    order, not mere co-occurrence. Three per-user MIN aggregates
    chained by shuffle joins on user_id — every stage partial-aggs
    map-side and is keyed on the high-cardinality user, so the plan
    is three bounded shuffles at any corpus size; the final step
    counts come from ONE conditional aggregate over a tagged union of
    the per-step user sets (no scalar crossJoins, no BNLJ)."""
    e = load(spark, sf_dir, "events")["events"]
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    tagged = (
        v.select(F.lit(1).alias("step"))
        .unionByName(c.select(F.lit(2).alias("step")))
        .unionByName(p.select(F.lit(3).alias("step")))
    )
    return tagged.agg(
        F.count(F.when(F.col("step") == 1, 1)).alias("step1_view_users"),
        F.count(F.when(F.col("step") == 2, 1)).alias("step2_click_users"),
        F.count(F.when(F.col("step") == 3, 1)).alias("step3_purchase_users"),
        F.round(
            F.count(F.when(F.col("step") == 3, 1)).cast("double")
            / F.count(F.when(F.col("step") == 1, 1)),
            6,
        ).alias("full_funnel_rate"),
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS aweek
      FROM events)
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.aweek) / 7 AS INT)
             AS week_offset,
           COUNT(*) AS n_users
    FROM f JOIN a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention triangle: users grouped by the ISO week
    of their FIRST event, counted in every subsequent week they were
    active — the table behind every retention curve. Per-user first
    event is one keyed aggregate; (user, week) activity is a DISTINCT
    on the same key; the join is user-keyed (co-partitioned with both
    inputs' shuffles); offsets are exact day arithmetic on
    Monday-truncated dates (both engines truncate weeks to Monday, so
    the day gap is always a multiple of 7)."""
    e = load(spark, sf_dir, "events")["events"]
    f = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.date_trunc("week", "first_ts")
            .cast("date")
            .alias("cohort_week"),
        )
    )
    a = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("aweek")
    ).distinct()
    return (
        f.join(a, "user_id")
        .select(
            "cohort_week",
            (F.datediff("aweek", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Rank-based AUC (Mann-Whitney) classifier evaluation
# ---------------------------------------------------------------------------


@register(
    "classifier_auc_eval",
    oracle="""
    WITH s AS (
      SELECT n_chars AS score,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
             SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
      FROM documents GROUP BY n_chars),
    c AS (
      SELECT score, np, nn,
             COALESCE(SUM(nn) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM s)
    SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           CAST(SUM(nn) AS BIGINT) AS n_neg,
           ROUND(CAST(SUM(np * (2 * below + nn)) AS DOUBLE)
                 / (2.0 * SUM(np) * SUM(nn)), 6) AS auc
    FROM c
    """,
)
def classifier_auc_eval(spark, sf_dir):
    """ROC AUC of 'n_chars predicts lang=en' via the Mann-Whitney
    rank-sum identity — THE threshold-free metric for every quality /
    toxicity / language classifier gating a training corpus. No
    per-row ranking (a global rank window would funnel the corpus
    through one task): scores collapse to a distinct-value histogram
    (np, nn per score — bounded by the score domain, not the corpus),
    and AUC = Σ np·(below_nn + nn/2) / (NP·NN) over that histogram.
    The sum is kept INTEGRAL by working in half-units
    (np·(2·below + nn)), so the only float op is one final division —
    order-independent and engine-exact. Ties handled exactly (the
    nn/2 term IS the tie correction)."""
    d = load(spark, sf_dir, "documents")["documents"]
    s = d.groupBy(F.col("n_chars").alias("score")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("nn"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = s.withColumn("below", F.coalesce(F.sum("nn").over(w), F.lit(0)))
    return c.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.round(
            F.sum(F.col("np") * (2 * F.col("below") + F.col("nn"))).cast(
                "double"
            )
            / (2.0 * F.sum("np") * F.sum("nn")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Chi-squared test of independence
# ---------------------------------------------------------------------------


@register(
    "chi_squared_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type AS et, CAST(user_id % 4 AS INT) AS cohort,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT et, cohort, o,
             SUM(o) OVER (PARTITION BY et) AS rt,
             SUM(o) OVER (PARTITION BY cohort) AS ct,
             SUM(o) OVER () AS n
      FROM cells),
    t AS (
      SELECT et, cohort, n,
             (CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct) AS d,
             CAST(rt AS DOUBLE) * ct * n AS denom
      FROM m)
    SELECT CAST(MAX(n) AS BIGINT) AS n_events,
           CAST((COUNT(DISTINCT et) - 1) * (COUNT(DISTINCT cohort) - 1)
                AS INT) AS dof,
           ROUND(list_reduce(list(d * d / denom ORDER BY et, cohort),
                             (a, b) -> a + b), 6) AS chi2
    FROM t
    """,
)
def chi_squared_independence(spark, sf_dir):
    """Pearson chi-squared independence test of event_type × user
    cohort — the contingency-table sibling of the two-proportion
    z-test (`abtest_proportion_ztest`). The corpus collapses to a
    cells relation (one partial-agg'd shuffle, |rows| = |types| ×
    |cohorts|); marginals are windows over that tiny relation. Each
    cell's term (o·n − rt·ct)²/(rt·ct·n) is a fixed-op-order double
    from exact integers, and the cross-cell float sum — the one
    irreducible float reduction — is a LEFT FOLD over a (et, cohort)-
    sorted list, identical element order on both engines."""
    e = load(spark, sf_dir, "events")["events"]
    cells = e.groupBy(
        F.col("event_type").alias("et"),
        (F.col("user_id") % 4).cast("int").alias("cohort"),
    ).agg(F.count(F.lit(1)).alias("o"))
    m = (
        cells.withColumn(
            "rt", F.sum("o").over(Window.partitionBy("et"))
        )
        .withColumn("ct", F.sum("o").over(Window.partitionBy("cohort")))
        .withColumn(
            "n",
            F.sum("o").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    t = m.select(
        "et",
        "cohort",
        "n",
        (
            F.col("o").cast("double") * F.col("n")
            - F.col("rt").cast("double") * F.col("ct")
        ).alias("d"),
        (F.col("rt").cast("double") * F.col("ct") * F.col("n")).alias(
            "denom"
        ),
    )
    return t.agg(
        F.max("n").cast("long").alias("n_events"),
        (
            (F.countDistinct("et") - 1) * (F.countDistinct("cohort") - 1)
        )
        .cast("int")
        .alias("dof"),
        F.round(
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "et",
                            "cohort",
                            (
                                F.col("d") * F.col("d") / F.col("denom")
                            ).alias("term"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ),
            6,
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------


@register(
    "k_anonymity_audit",
    oracle="""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS INT) AS bal_band,
             COUNT(*) AS class_size
      FROM customer GROUP BY 1, 2, 3)
    SELECT COUNT(*) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_customers,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size,
           SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
             AS n_small_classes,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                AS BIGINT) AS n_at_risk,
           ROUND(CAST(SUM(CASE WHEN class_size < 5 THEN class_size
                              ELSE 0 END) AS DOUBLE)
                 / SUM(class_size), 6) AS pct_at_risk
    FROM q
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers (nation, market
    segment, account-balance band): how many equivalence classes have
    fewer than k=5 members, and what share of individuals sits in
    them — the privacy gate run before releasing or training on
    user-adjacent data. One grouped count (partial-agg'd shuffle
    bounded by the quasi-identifier domain) plus a scalar rollup;
    never materializes per-row risk."""
    c = load(spark, sf_dir, "customer")["customer"]
    q = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    small = F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(
        0
    )
    return q.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_customers"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("class_size") < 5, 1).otherwise(0)).alias(
            "n_small_classes"
        ),
        F.sum(small).cast("long").alias("n_at_risk"),
        F.round(
            F.sum(small).cast("double") / F.sum("class_size"), 6
        ).alias("pct_at_risk"),
    )


# ---------------------------------------------------------------------------
# Stopword scrub + normalization checksum
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in")


@register(
    "text_stopword_scrub",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_before,
             list_filter(string_split(text, ' '),
                         w -> w NOT IN {_STOPWORDS!r}) AS kept
      FROM documents),
    c AS (
      SELECT lang, n_before, len(kept) AS n_after,
             CAST('0x' || substr(md5(array_to_string(kept, ' ')), 1, 15)
                  AS BIGINT) % 1073741824 AS h
      FROM t)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_before) AS BIGINT) AS toks_before,
           CAST(SUM(n_after) AS BIGINT) AS toks_after,
           CAST(SUM(h) AS BIGINT) AS scrub_checksum
    FROM c GROUP BY lang
    """,
)
def text_stopword_scrub(spark, sf_dir):
    """Stopword scrubbing as a verified TRANSFORM, not just a stat:
    tokens dropped in-row (JVM higher-order filter — no explode, no
    shuffle of token occurrences), and the cleaned text itself is
    pinned by an order-independent md5 checksum per language (the
    `table_checksum` 30-bit-fold idiom), so the oracle proves the
    exact output strings, token counts AND grouping in one pass."""
    d = load(spark, sf_dir, "documents")["documents"]
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    toks = F.split(F.col("text"), " ")
    kept = F.filter(toks, lambda w: ~F.array_contains(stop_arr, w))
    t = d.select(
        "lang",
        F.size(toks).alias("n_before"),
        F.size(kept).alias("n_after"),
        (
            F.conv(
                F.substring(F.md5(F.array_join(kept, " ")), 1, 15), 16, 10
            ).cast("long")
            % 1073741824
        ).alias("h"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_before").cast("long").alias("toks_before"),
        F.sum("n_after").cast("long").alias("toks_after"),
        F.sum("h").cast("long").alias("scrub_checksum"),
    )


# ---------------------------------------------------------------------------
# Weighted median over a distinct-value histogram
# ---------------------------------------------------------------------------


@register(
    "weighted_median_discount",
    oracle="""
    WITH h AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
             CAST(SUM(l_quantity) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2),
    c AS (
      SELECT flag, disc_c, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY disc_c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM h)
    SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN disc_c END) AS BIGINT)
             AS wmedian_disc_c
    FROM c GROUP BY flag
    """,
)
def weighted_median_discount(spark, sf_dir):
    """Quantity-weighted LOWER median discount per return flag —
    the weighted-percentile shape (every unit of quantity votes, not
    every row) that plain percentile aggregates can't express. The
    corpus collapses to a (flag, discount)-histogram first (bounded
    by the discount domain — 11 values — times flags), so the
    cumulative-weight window runs over dozens of rows regardless of
    corpus size; the median is the smallest value whose cumulative
    weight reaches half the total (2·cw ≥ tw keeps it integral).
    Integer cents + integer quantities end-to-end."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
    ).agg(F.sum("l_quantity").cast("long").alias("w"))
    wf = Window.partitionBy("flag").orderBy("disc_c")
    c = h.withColumn(
        "cw",
        F.sum("w").over(wf.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn(
        "tw",
        F.sum("w").over(
            Window.partitionBy("flag").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    return c.groupBy("flag").agg(
        F.max("tw").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("disc_c"))
        )
        .cast("long")
        .alias("wmedian_disc_c"),
    )


# ---------------------------------------------------------------------------
# Exact correlation matrix from decimal power sums
# ---------------------------------------------------------------------------


@register(
    "corr_matrix_exact",
    oracle="""
    WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(q AS HUGEINT)) AS DOUBLE) AS sq,
             CAST(SUM(CAST(p AS HUGEINT)) AS DOUBLE) AS sp,
             CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE) AS sd,
             CAST(SUM(CAST(q * q AS HUGEINT)) AS DOUBLE) AS sqq,
             CAST(SUM(CAST(p * p AS HUGEINT)) AS DOUBLE) AS spp,
             CAST(SUM(CAST(d * d AS HUGEINT)) AS DOUBLE) AS sdd,
             CAST(SUM(CAST(q * p AS HUGEINT)) AS DOUBLE) AS sqp,
             CAST(SUM(CAST(q * d AS HUGEINT)) AS DOUBLE) AS sqd,
             CAST(SUM(CAST(p * d AS HUGEINT)) AS DOUBLE) AS spd
      FROM (
        SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS d
        FROM lineitem))
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sqp - sq * sp)
                 / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)),
                 6) AS corr_qty_price,
           ROUND((n * sqd - sq * sd)
                 / (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd)),
                 6) AS corr_qty_disc,
           ROUND((n * spd - sp * sd)
                 / (sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd)),
                 6) AS corr_price_disc
    FROM s
    """,
)
def corr_matrix_exact(spark, sf_dir):
    """Pairwise Pearson correlations (quantity, price, discount) from
    EXACT integer power sums — the feature-screening matrix, computed
    the way the engine's exact-aggregation convention demands: values
    snap to integer cents, all nine sums accumulate in
    DECIMAL(38,0)/HUGEINT (price² sums overflow int64 at sf0.1 — the
    TWAP lesson), and the correlation formula is a fixed sequence of
    double ops applied to identically-rounded casts of identical
    integers on both engines. One partial-agg'd scan, single-row
    output; builtin corr() would be order-dependent float
    accumulation and engine-divergent."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    v = li.select(
        F.round("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
    )
    dec = "decimal(38,0)"
    s = v.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("q").cast(dec)).cast("double").alias("sq"),
        F.sum(F.col("p").cast(dec)).cast("double").alias("sp"),
        F.sum(F.col("d").cast(dec)).cast("double").alias("sd"),
        F.sum((F.col("q") * F.col("q")).cast(dec)).cast("double").alias("sqq"),
        F.sum((F.col("p") * F.col("p")).cast(dec)).cast("double").alias("spp"),
        F.sum((F.col("d") * F.col("d")).cast(dec)).cast("double").alias("sdd"),
        F.sum((F.col("q") * F.col("p")).cast(dec)).cast("double").alias("sqp"),
        F.sum((F.col("q") * F.col("d")).cast(dec)).cast("double").alias("sqd"),
        F.sum((F.col("p") * F.col("d")).cast(dec)).cast("double").alias("spd"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        n = F.col("n")
        return F.round(
            (n * F.col(sxy) - F.col(sx) * F.col(sy))
            / (
                F.sqrt(n * F.col(sxx) - F.col(sx) * F.col(sx))
                * F.sqrt(n * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            6,
        )

    return s.select(
        F.col("n").cast("long").alias("n_rows"),
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )
