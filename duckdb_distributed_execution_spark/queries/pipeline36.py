"""Thirty-sixth-wave operators — hierarchical reporting and
goodness-of-fit: revenue shares at two hierarchy levels at once
(nation share of its region AND region share of total — the
percent-of-parent columns every drill-down report carries), and a
chi-square goodness-of-fit test of the JSON props key against the
uniform distribution it was generated from (the synthetic-data
sanity check, and the shape of any categorical-drift gate).

North-star greenfield. Conventions: revenue in exact integer cents;
shares are exact rationals with single divisions; the GOF statistic
reduces to exact integers — chi2 = (k·Σo² − n²)/n — with one final
division.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Hierarchical share rollup: nation → region → total
# ---------------------------------------------------------------------------


@register(
    "hierarchical_share_rollup",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY n.n_name, r.r_name),
    t AS (
      SELECT rev.*,
             SUM(cents) OVER (PARTITION BY region) AS region_cents,
             SUM(cents) OVER () AS total_cents
      FROM rev)
    SELECT region, nation,
           CAST(cents AS DOUBLE) / 100.0 AS nation_revenue,
           ROUND(CAST(cents AS DOUBLE) / CAST(region_cents AS DOUBLE), 6)
             AS share_of_region,
           ROUND(CAST(region_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 6)
             AS region_share_of_total
    FROM t
    """,
)
def hierarchical_share_rollup(spark, sf_dir):
    """Percent-of-parent at two hierarchy levels in one result:
    nation revenue, the nation's share of its REGION, and the
    region's share of the TOTAL — the drill-down columns a reporting
    layer otherwise computes with three round trips. Revenue is exact
    integer cents; both parent totals ride windows over the
    |nations|-row aggregate (region-partitioned and full-frame — the
    same sorted pass), so no re-aggregation or self-join; shares are
    exact rationals with single divisions. Dimension joins broadcast;
    one fact shuffle."""
    t = load(spark, sf_dir, "orders", "customer", "nation", "region")
    o, c, n, r = t["orders"], t["customer"], t["nation"], t["region"]
    rev = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey", "r_name")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
            ).alias("cents")
        )
    )
    wr = Window.partitionBy("region")
    wf = Window.orderBy("region", "nation").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tt = rev.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(wr).alias("region_cents"),
        F.sum("cents").over(wf).alias("total_cents"),
    )
    return tt.select(
        "region",
        "nation",
        (F.col("cents").cast("double") / 100.0).alias("nation_revenue"),
        F.round(
            F.col("cents").cast("double") / F.col("region_cents").cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.col("region_cents").cast("double")
            / F.col("total_cents").cast("double"),
            6,
        ).alias("region_share_of_total"),
    )


# ---------------------------------------------------------------------------
# Chi-square goodness-of-fit: props key vs uniform
# ---------------------------------------------------------------------------

_GOF_K = 100  # props k domain is 0..99
_GOF_CHI2_95_DF99 = 123.22522145336181  # chi2(99) 95% quantile, shared literal


@register(
    "uniformity_chisq_props",
    oracle=f"""
    WITH o AS (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             COUNT(*) AS c
      FROM events GROUP BY 1),
    s AS (
      SELECT COUNT(*) AS n_cells, SUM(c) AS n,
             SUM(CAST(c AS HUGEINT) * c) AS ss
      FROM o)
    SELECT CAST(n_cells AS BIGINT) AS n_observed_cells,
           CAST(n AS BIGINT) AS n_events,
           ROUND(CAST({_GOF_K} * ss - CAST(n AS HUGEINT) * n AS DOUBLE)
                 / CAST(n AS DOUBLE), 6) AS chi2,
           CAST({_GOF_K} * ss - CAST(n AS HUGEINT) * n AS DOUBLE)
             / CAST(n AS DOUBLE) < {_GOF_CHI2_95_DF99} AS uniform_pass
    FROM s
    """,
)
def uniformity_chisq_props(spark, sf_dir):
    """Chi-square GOODNESS-OF-FIT of the JSON props key against the
    uniform distribution over its {100}-value domain — the
    synthetic-data sanity gate, and the exact shape of a
    categorical-drift alarm (chi² against last week's distribution
    instead of uniform). With equal expected counts the statistic
    reduces EXACTLY to (k·Σo² − n²)/n — all integer until one final
    division (squares through HUGEINT/DECIMAL) — and the verdict
    compares against the chi-square(99) 95% quantile as a shared
    literal. One grouped count + a 1-row reduce; complements
    chi_squared_independence (two-way) and abtest_srm_check (2-cell)
    with the k-cell one-sample form."""
    e = load(spark, sf_dir, "events")["events"]
    o = e.groupBy(
        F.get_json_object("props", "$.k").cast("int").alias("k")
    ).agg(F.count(F.lit(1)).alias("c"))
    dec = "decimal(38,0)"
    s = o.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("decimal(18,0)") * F.col("c").cast("decimal(18,0)"))
        .cast(dec)
        .alias("ss"),
    )
    chi2 = (
        (F.lit(_GOF_K) * F.col("ss") - F.col("n").cast(dec) * F.col("n").cast(dec))
        .cast("double")
        / F.col("n").cast("double")
    )
    return s.select(
        F.col("n_cells").cast("long").alias("n_observed_cells"),
        F.col("n").cast("long").alias("n_events"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 < _GOF_CHI2_95_DF99).alias("uniform_pass"),
    )
