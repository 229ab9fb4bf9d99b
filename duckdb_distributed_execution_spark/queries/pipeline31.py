"""Thirty-first-wave operators — financial decomposition and
parametric retention: the price–volume–mix revenue bridge (why did
revenue move? volume at old prices, price on new volume, new parts,
dropped parts — with the float residual of the exact identity
reported honestly), and an exponential decay fit of cohort retention
(ln-linear OLS → decay rate and half-life).

North-star greenfield. Conventions: revenues in exact integer cents;
per-part bridge terms are fixed double expressions exact-decimal-
summed; OLS folds rank-ordered (the zipf idiom); the identity
residual is REPORTED, not hidden.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_sum,
    oracle_exact_sum,
)
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Price–volume–mix revenue bridge
# ---------------------------------------------------------------------------

_PVM_Y0 = 1995
_PVM_Y1 = 1996


@register(
    "revenue_bridge_pvm",
    oracle=f"""
    WITH base AS (
      SELECT l_partkey, year(l_shipdate) AS y,
             SUM(CAST(l_quantity AS BIGINT)) AS q,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                      AS BIGINT)) AS rev
      FROM lineitem
      WHERE year(l_shipdate) IN ({_PVM_Y0}, {_PVM_Y1})
      GROUP BY l_partkey, year(l_shipdate)),
    w AS (
      SELECT COALESCE(a.l_partkey, b.l_partkey) AS pk,
             a.q AS q0, a.rev AS r0, b.q AS q1, b.rev AS r1
      FROM (SELECT * FROM base WHERE y = {_PVM_Y0}) a
      FULL OUTER JOIN (SELECT * FROM base WHERE y = {_PVM_Y1}) b
        ON b.l_partkey = a.l_partkey),
    t AS (
      SELECT
        SUM(COALESCE(r0, 0)) AS rev0,
        SUM(COALESCE(r1, 0)) AS rev1,
        {oracle_exact_sum(
            "CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL THEN"
            " CAST(q1 - q0 AS DOUBLE) * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))"
            " ELSE 0.0 END")} AS volume_c,
        {oracle_exact_sum(
            "CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL THEN"
            " CAST(r1 AS DOUBLE)"
            " - CAST(q1 AS DOUBLE) * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))"
            " ELSE 0.0 END")} AS price_c,
        SUM(CASE WHEN q0 IS NULL THEN r1 ELSE 0 END) AS new_c,
        SUM(CASE WHEN q1 IS NULL THEN r0 ELSE 0 END) AS dropped_c
      FROM w)
    SELECT ROUND(rev0 / 100.0, 2) AS rev_y0,
           ROUND(rev1 / 100.0, 2) AS rev_y1,
           ROUND((rev1 - rev0) / 100.0, 2) AS delta,
           ROUND(volume_c / 100.0, 2) AS volume_effect,
           ROUND(price_c / 100.0, 2) AS price_effect,
           ROUND(new_c / 100.0, 2) AS new_parts_effect,
           ROUND(-dropped_c / 100.0, 2) AS dropped_parts_effect,
           ROUND((rev1 - rev0) / 100.0
                 - (volume_c / 100.0 + price_c / 100.0
                    + new_c / 100.0 - dropped_c / 100.0), 2) + 0.0
             AS residual
    FROM t
    """,
)
def revenue_bridge_pvm(spark, sf_dir):
    """The revenue BRIDGE from {y0} to {y1}, Laspeyres-decomposed per
    part: volume effect (quantity change at old unit price), price
    effect (new volume at the unit-price change), new-part and
    dropped-part effects — the waterfall chart every finance review
    opens with. Yearly (part, quantity, exact-cent revenue) is one
    aggregate; the bridge is a FULL OUTER self-alignment of the two
    years (one |parts|-sized join); each per-part term is a fixed
    double expression over exact integers, accumulated through the
    exact-decimal sum so partitioning never moves a cent. The bridge
    identity holds exactly in rationals; its float RESIDUAL is
    reported (≈0.00) rather than silently absorbed — the honesty
    column an auditor checks first.""".format(y0=_PVM_Y0, y1=_PVM_Y1)
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    base = (
        li.filter(F.year("l_shipdate").isin(_PVM_Y0, _PVM_Y1))
        .groupBy("l_partkey", F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                    + 0.5
                ).cast("long")
            ).alias("rev"),
        )
    )
    a = base.filter(F.col("y") == _PVM_Y0).select(
        F.col("l_partkey").alias("pk_a"),
        F.col("q").alias("q0"),
        F.col("rev").alias("r0"),
    )
    b = base.filter(F.col("y") == _PVM_Y1).select(
        F.col("l_partkey").alias("pk_b"),
        F.col("q").alias("q1"),
        F.col("rev").alias("r1"),
    )
    w = a.join(b, F.col("pk_a") == F.col("pk_b"), "full_outer")
    both = F.col("q0").isNotNull() & F.col("q1").isNotNull()
    p0 = F.col("r0").cast("double") / F.col("q0").cast("double")
    vol_term = F.when(
        both, (F.col("q1") - F.col("q0")).cast("double") * p0
    ).otherwise(F.lit(0.0))
    price_term = F.when(
        both, F.col("r1").cast("double") - F.col("q1").cast("double") * p0
    ).otherwise(F.lit(0.0))
    t = w.agg(
        F.sum(F.coalesce("r0", F.lit(0))).alias("rev0"),
        F.sum(F.coalesce("r1", F.lit(0))).alias("rev1"),
        exact_sum(vol_term).alias("volume_c"),
        exact_sum(price_term).alias("price_c"),
        F.sum(F.when(F.col("q0").isNull(), F.col("r1")).otherwise(0)).alias(
            "new_c"
        ),
        F.sum(F.when(F.col("q1").isNull(), F.col("r0")).otherwise(0)).alias(
            "dropped_c"
        ),
    )
    return t.select(
        F.round(F.col("rev0") / 100.0, 2).alias("rev_y0"),
        F.round(F.col("rev1") / 100.0, 2).alias("rev_y1"),
        F.round((F.col("rev1") - F.col("rev0")) / 100.0, 2).alias("delta"),
        F.round(F.col("volume_c") / 100.0, 2).alias("volume_effect"),
        F.round(F.col("price_c") / 100.0, 2).alias("price_effect"),
        F.round(F.col("new_c") / 100.0, 2).alias("new_parts_effect"),
        F.round(-F.col("dropped_c") / 100.0, 2).alias("dropped_parts_effect"),
        # + 0.0 canonicalizes IEEE negative zero (the residual is a
        # near-zero difference and lands on −0.0 on one engine).
        (
            F.round(
                (F.col("rev1") - F.col("rev0")) / 100.0
                - (
                    F.col("volume_c") / 100.0
                    + F.col("price_c") / 100.0
                    + F.col("new_c") / 100.0
                    - F.col("dropped_c") / 100.0
                ),
                2,
            )
            + F.lit(0.0)
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Exponential retention decay fit
# ---------------------------------------------------------------------------


@register(
    "retention_decay_fit",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             date_trunc('week', MIN(CAST(ts AS DATE))) AS cohort
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT f.user_id, f.cohort,
             CAST(date_diff('day', f.cohort,
                            date_trunc('week', CAST(e.ts AS DATE))) // 7
                  AS INTEGER) AS k
      FROM events e JOIN first_seen f ON f.user_id = e.user_id),
    sz AS (SELECT cohort, COUNT(*) AS n0 FROM first_seen GROUP BY cohort),
    ret AS (
      SELECT a.cohort, a.k, COUNT(*) AS alive, sz.n0
      FROM act a JOIN sz ON sz.cohort = a.cohort
      WHERE a.k >= 1 GROUP BY a.cohort, a.k, sz.n0),
    pts AS (
      SELECT cohort, k,
             CAST(k AS DOUBLE) AS x,
             ln(CAST(alive AS DOUBLE) / CAST(n0 AS DOUBLE)) AS y
      FROM ret WHERE alive > 0),
    le AS (
      SELECT cohort, k, x, y, x * y AS xy, x * x AS xx FROM pts),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             list_reduce(list(x ORDER BY cohort, k), (a, b) -> a + b) AS sx,
             list_reduce(list(y ORDER BY cohort, k), (a, b) -> a + b) AS sy,
             list_reduce(list(xy ORDER BY cohort, k), (a, b) -> a + b) AS sxy,
             list_reduce(list(xx ORDER BY cohort, k), (a, b) -> a + b) AS sxx
      FROM le)
    SELECT CAST(n AS BIGINT) AS n_points,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
             ROUND(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6) + 0.0
           END AS decay_rate,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
             ROUND(0.6931471805599453
                   / ((n * sxy - sx * sy) / (n * sxx - sx * sx) * -1.0), 6)
           END AS half_life_weeks
    FROM sums
    """,
)
def retention_decay_fit(spark, sf_dir):
    """Parametric retention: fit r_k ≈ e^(−λk) over all (cohort,
    weeks-since-signup) retention points by ln-linear OLS — λ and the
    half-life in weeks are the two numbers a growth model consumes
    where the raw cohort_retention matrix has dozens. Retention
    rates are exact integer ratios; ln terms are per-row doubles with
    identical trees; the four OLS sums are (cohort, k)-ordered left
    folds (the zipf_alpha_fit convention) so IEEE addition order
    matches DuckDB's list_reduce exactly; ln 2 is a shared literal.
    Everything after the distinct (user, cohort, week) aggregate runs
    on |cohorts|×|weeks| rows."""
    e = load(spark, sf_dir, "events")["events"]
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.col("ts").cast("date")))
        .cast("date")
        .alias("cohort")
    )
    act = (
        e.join(first_seen, on="user_id")
        .select(
            "user_id",
            "cohort",
            F.expr(
                "div(datediff(date_trunc('week', cast(ts as date)), cohort), 7)"
            )
            .cast("int")
            .alias("k"),
        )
        .distinct()
    )
    sz = first_seen.groupBy("cohort").agg(F.count(F.lit(1)).alias("n0"))
    ret = (
        act.filter(F.col("k") >= 1)
        .groupBy("cohort", "k")
        .agg(F.count(F.lit(1)).alias("alive"))
        .join(F.broadcast(sz), on="cohort")
    )
    x = F.col("k").cast("double")
    y = F.log(F.col("alive").cast("double") / F.col("n0").cast("double"))
    le = ret.filter(F.col("alive") > 0).select(
        "cohort",
        "k",
        x.alias("x"),
        y.alias("y"),
        (x * y).alias("xy"),
        (x * x).alias("xx"),
    )

    def _fold(field):
        lst = F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("cohort"), F.col("k"), F.col(field).alias("v"))
                )
            ),
            lambda s: s["v"],
        )
        return F.aggregate(lst, F.lit(0.0), lambda a, e2: a + e2)

    sums = le.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _fold("x").alias("sx"),
        _fold("y").alias("sy"),
        _fold("xy").alias("sxy"),
        _fold("xx").alias("sxx"),
    )
    # Degenerate fits (the sf0.001 corpus): all points at one k zeroes
    # the OLS denominator, and a perfectly flat fit zeroes the slope —
    # both must emit NULL instead of an ANSI divide-by-zero. DuckDB's
    # double x/0.0 is NULL natively, so only decay_rate's denominator
    # CASE needs mirroring in the oracle; Spark guards both.
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    half_life = F.when(
        slope != 0, F.lit(0.6931471805599453) / (slope * -1.0)
    )
    return sums.select(
        F.col("n").cast("long").alias("n_points"),
        # + 0.0 canonicalizes IEEE negative zero (a flat fit rounds
        # to -0.0 on one engine and 0.0 on the other).
        (F.round(-slope, 6) + F.lit(0.0)).alias("decay_rate"),
        F.round(half_life, 6).alias("half_life_weeks"),
    )
