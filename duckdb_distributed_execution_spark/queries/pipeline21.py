"""Twenty-first-wave operators — membership lattices and agreement:
an UpSet-style event-type intersection lattice over users (the
multi-set Venn read), Cohen's kappa between two document quality
screens (are two cheap filters measuring the same thing?), and the
DAU/WAU/MAU stickiness series (the product-analytics engagement
ratio).

North-star greenfield. Conventions as established: exact integer
reductions (kappa is computed entirely in integer space — one final
division), doubles only in final divisions with identical trees.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.text import tokens
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# UpSet intersection lattice: which event-type combos do users span?
# ---------------------------------------------------------------------------

# Fixed alphabetical bit assignment, shared literal with the oracle.
_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "upset_type_lattice",
    oracle=f"""
    WITH ut AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      FROM events),
    m AS (
      SELECT user_id, day,
             SUM(CASE event_type
                 {" ".join(f"WHEN '{t}' THEN {1 << i}" for i, t in enumerate(_TYPES))}
                 ELSE 0 END) AS mask
      FROM ut GROUP BY user_id, day),
    c AS (SELECT mask, COUNT(*) AS n_user_days FROM m GROUP BY mask)
    SELECT CAST(mask AS INTEGER) AS mask,
           concat_ws('+',
             {", ".join(f"CASE WHEN mask & {1 << i} > 0 THEN '{t}' END" for i, t in enumerate(_TYPES))})
             AS combo,
           CAST({"+".join(f"CASE WHEN mask & {1 << i} > 0 THEN 1 ELSE 0 END" for i in range(len(_TYPES)))}
                AS INTEGER) AS n_types,
           n_user_days
    FROM c
    """,
)
def upset_type_lattice(spark, sf_dir):
    """UpSet-style intersection lattice over DAILY behavior: each
    (user, day) maps to the exact SET of event types emitted that day
    (a 5-bit mask, alphabetical bit order shared as a literal with
    the oracle), and the lattice counts user-days per combination —
    the multi-set Venn diagram a pairwise overlap matrix cannot
    express (pairwise says click∩view is big; the lattice says how
    many days users click+view but never purchase). Two
    map-side-combined aggregates: distinct (user, day, type) —
    bounded at |users|×|days|×|types| — then a SUM of power-of-two
    literals per key; no joins, no windows. The combo label and type
    count derive from the mask by bit tests, identically on both
    engines."""
    e = load(spark, sf_dir, "events")["events"]
    ut = e.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).distinct()
    mask_expr = F.sum(
        sum(
            [
                F.when(F.col("event_type") == t, F.lit(1 << i)).otherwise(
                    F.lit(0)
                )
                for i, t in enumerate(_TYPES)
            ],
            F.lit(0),
        )
    ).alias("mask")
    m = ut.groupBy("user_id", "day").agg(mask_expr)
    c = m.groupBy("mask").agg(F.count(F.lit(1)).alias("n_user_days"))
    combo = F.concat_ws(
        "+",
        *[
            F.when(F.col("mask").bitwiseAND(F.lit(1 << i)) > 0, F.lit(t))
            for i, t in enumerate(_TYPES)
        ],
    )
    n_types = sum(
        [
            F.when(F.col("mask").bitwiseAND(F.lit(1 << i)) > 0, F.lit(1)).otherwise(
                F.lit(0)
            )
            for i in range(len(_TYPES))
        ],
        F.lit(0),
    )
    return c.select(
        F.col("mask").cast("int").alias("mask"),
        combo.alias("combo"),
        n_types.cast("int").alias("n_types"),
        "n_user_days",
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two quality screens
# ---------------------------------------------------------------------------


@register(
    "quality_screen_kappa",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             len(string_split(text, ' ')) >= 40 AS a,
             len(list_distinct(string_split(text, ' '))) * 2
               >= len(string_split(text, ' ')) AS b
      FROM documents),
    c AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
             SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
             SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
             SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
      FROM f)
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(n11 AS BIGINT) AS both_pass,
           CAST(n10 AS BIGINT) AS only_length,
           CAST(n01 AS BIGINT) AS only_diversity,
           CAST(n00 AS BIGINT) AS both_fail,
           ROUND(CAST(n * (n11 + n00)
                      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                      AS DOUBLE)
                 / CAST(n * n
                        - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                        AS DOUBLE), 6) AS kappa
    FROM c
    """,
)
def quality_screen_kappa(spark, sf_dir):
    """Cohen's kappa between two cheap document screens — a LENGTH
    screen (≥ 40 tokens) and a lexical-DIVERSITY screen (distinct
    tokens ≥ half of tokens, the repetition test): kappa ≈ 0 means
    the filters reject different documents (stack them), kappa ≈ 1
    means one is redundant — the measurement run before paying for
    both at corpus scale. The 2×2 confusion table is one
    map-side-combined aggregate of integer flags; kappa itself stays
    in INTEGER space via κ = (n·(n11+n00) − Σ marginal products) /
    (n² − Σ marginal products) — a single double division at the
    end, so the statistic is engine-exact to the rounding digit."""
    d = load(spark, sf_dir, "documents")["documents"]
    tk = tokens("text")
    f = d.select(
        (F.size(tk) >= 40).alias("a"),
        (F.size(F.array_distinct(tk)) * 2 >= F.size(tk)).alias("b"),
    )
    c = f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0)).alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0)).alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0)).alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0)).alias("n00"),
    )
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return c.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n11").cast("long").alias("both_pass"),
        F.col("n10").cast("long").alias("only_length"),
        F.col("n01").cast("long").alias("only_diversity"),
        F.col("n00").cast("long").alias("both_fail"),
        F.round(
            (
                F.col("n") * (F.col("n11") + F.col("n00")) - pe_num
            ).cast("double")
            / (F.col("n") * F.col("n") - pe_num).cast("double"),
            6,
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# DAU / WAU / MAU stickiness
# ---------------------------------------------------------------------------


@register(
    "dau_wau_mau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    w AS (
      SELECT d.day,
             COUNT(DISTINCT CASE WHEN ud.day = d.day
                                 THEN ud.user_id END) AS dau,
             COUNT(DISTINCT CASE WHEN ud.day >= d.day - 6
                                 THEN ud.user_id END) AS wau,
             COUNT(DISTINCT ud.user_id) AS mau
      FROM days d
      JOIN ud ON ud.day <= d.day AND ud.day >= d.day - 29
      GROUP BY d.day)
    SELECT day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           CAST(mau AS BIGINT) AS mau,
           ROUND(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS dau_wau,
           ROUND(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6) AS dau_mau
    FROM w
    """,
)
def dau_wau_mau_stickiness(spark, sf_dir):
    """The engagement stickiness series: per calendar day, distinct
    active users that day (DAU), over the trailing 7 days (WAU), and
    the trailing 30 days (MAU), with the DAU/WAU and DAU/MAU ratios
    product teams track. Rolling DISTINCT does not decompose into a
    window aggregate, so the plan pre-aggregates to the distinct
    (user, day) relation — |users|×|days| bounded, the 100 TB-safe
    move — then ONE interval join against the day spine at the
    widest (30-day) window with conditional distinct counts for the
    narrower ones; work is |days| × trailing-month actives, never
    touching raw events twice."""
    e = load(spark, sf_dir, "events")["events"]
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct().withColumnRenamed("day", "d")
    j = ud.join(
        days,
        (F.col("day") <= F.col("d"))
        & (F.col("day") >= F.date_sub(F.col("d"), 29)),
    )
    w = j.groupBy("d").agg(
        F.countDistinct(
            F.when(F.col("day") == F.col("d"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct(
            F.when(F.col("day") >= F.date_sub(F.col("d"), 6), F.col("user_id"))
        ).alias("wau"),
        F.countDistinct("user_id").alias("mau"),
    )
    return w.select(
        F.col("d").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.col("mau").cast("long").alias("mau"),
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 6
        ).alias("dau_wau"),
        F.round(
            F.col("dau").cast("double") / F.col("mau").cast("double"), 6
        ).alias("dau_mau"),
    )
