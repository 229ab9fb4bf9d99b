"""Twenty-sixth-wave operators — warehouse integrity and behavioral
association: a referential-integrity audit over the TPC-H foreign-key
graph (the ANALYZE-style health report a warehouse runs after every
load; the hash gate pins the zero-orphan state of this corpus), and
within-session event-type lift (the behavioral twin of the
order-basket association rules).

North-star greenfield. Conventions: counts exact, rates one final
division, session islands identical to the sessionize family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------

# (relationship, child table, child key, parent table, parent key)
_FKS = [
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


@register(
    "referential_integrity_audit",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{name}' AS relationship,
           (SELECT COUNT(*) FROM {child}) AS n_child_rows,
           (SELECT COUNT(*) FROM {child} c
            WHERE c.{ck} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent} p
                              WHERE p.{pk} = c.{ck})) AS n_orphans,
           (SELECT COUNT(*) FROM {child} WHERE {ck} IS NULL) AS n_null_keys,
           (SELECT COUNT(DISTINCT {pk}) FROM {parent}) AS n_parent_keys
    """
        for name, child, ck, parent, pk in _FKS
    ),
)
def referential_integrity_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema's foreign
    keys: per relationship, child row count, ORPHANS (non-null child
    keys with no parent — a left-anti join), null child keys, and
    distinct parent keys — the post-load health report every
    warehouse runs, and the read-side twin of `Engine.expect`'s
    write gates. The oracle hash PINS the audit result itself (this
    corpus is clean: zero orphans everywhere — a load that breaks a
    key breaks the gate). Each relationship is one anti-join on the
    key (broadcast where the parent is dimension-sized) plus counts;
    the five audits are independent and union at the end."""
    t = load(
        spark, sf_dir, "lineitem", "orders", "customer", "part",
        "supplier", "nation",
    )
    outs = []
    for name, child, ck, parent, pk in _FKS:
        c, p = t[child], t[parent]
        orphans = (
            c.filter(F.col(ck).isNotNull())
            .join(p.select(F.col(pk).alias(ck)), on=ck, how="left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        base = c.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(F.when(F.col(ck).isNull(), 1).otherwise(0)).alias(
                "n_null_keys"
            ),
        )
        pkeys = p.agg(F.countDistinct(pk).alias("n_parent_keys"))
        # Tagged union + pivot agg — three 1-row aggregates combine
        # without scalar cross joins (plancheck bnlj hygiene).
        u = (
            base.select(
                "n_child_rows",
                F.lit(None).cast("long").alias("n_orphans"),
                "n_null_keys",
                F.lit(None).cast("long").alias("n_parent_keys"),
            )
            .unionByName(
                orphans.select(
                    F.lit(None).cast("long").alias("n_child_rows"),
                    "n_orphans",
                    F.lit(None).cast("long").alias("n_null_keys"),
                    F.lit(None).cast("long").alias("n_parent_keys"),
                )
            )
            .unionByName(
                pkeys.select(
                    F.lit(None).cast("long").alias("n_child_rows"),
                    F.lit(None).cast("long").alias("n_orphans"),
                    F.lit(None).cast("long").alias("n_null_keys"),
                    "n_parent_keys",
                )
            )
        )
        outs.append(
            u.agg(
                F.max("n_child_rows").alias("n_child_rows"),
                F.max("n_orphans").alias("n_orphans"),
                F.max("n_null_keys").alias("n_null_keys"),
                F.max("n_parent_keys").alias("n_parent_keys"),
            ).select(
                F.lit(name).alias("relationship"),
                "n_child_rows",
                "n_orphans",
                "n_null_keys",
                "n_parent_keys",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Within-session event-type lift
# ---------------------------------------------------------------------------

_LIFT_GAP_US = 1800 * 1_000_000


@register(
    "session_type_lift",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > {_LIFT_GAP_US}
                  OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    s AS (
      SELECT user_id, event_type,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    st AS (SELECT DISTINCT user_id, sid, event_type FROM s),
    ns AS (SELECT COUNT(DISTINCT user_id || '#' || sid) AS n FROM st),
    m AS (SELECT event_type, COUNT(*) AS c FROM st GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS both_c
      FROM st a JOIN st b
        ON b.user_id = a.user_id AND b.sid = a.sid
       AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type)
    SELECT p.type_a, p.type_b,
           CAST(p.both_c AS BIGINT) AS n_cosessions,
           ROUND(CAST(p.both_c * ns.n AS DOUBLE)
                 / CAST(ma.c * mb.c AS DOUBLE), 6) AS lift
    FROM pairs p
    JOIN m ma ON ma.event_type = p.type_a
    JOIN m mb ON mb.event_type = p.type_b
    CROSS JOIN ns
    """,
)
def session_type_lift(spark, sf_dir):
    """Within-session association between event types: lift =
    P(A,B in one session)·N / (P(A)·P(B)) over the sessionize
    family's 30-minute islands — the behavioral twin of the
    order-basket rules (does an error in a session co-occur with a
    purchase more than chance?). Sessions-per-type and co-session
    pairs are grouped aggregates over the distinct (user, session,
    type) relation — bounded at |sessions|×|types|, and the pair join
    is keyed on the session so pair volume is |types|² per session,
    never |events|². The lift numerator/denominator are exact
    integer products with one final division. The session count
    rides a broadcast (1-row relation combining with the |types|²
    output — the tfidf_topk-style scalar pattern)."""
    e = load(spark, sf_dir, "events")["events"]
    us = F.expr("unix_micros(ts)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_type",
        us.alias("us"),
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > _LIFT_GAP_US)
            | F.lag(us).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    ws = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    st = (
        o.select(
            "user_id",
            "event_type",
            F.sum("is_start").over(ws).alias("sid"),
        )
        .distinct()
    )
    ns = st.select("user_id", "sid").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    m = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = st.select("user_id", "sid", F.col("event_type").alias("type_a"))
    b = st.select("user_id", "sid", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, on=["user_id", "sid"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both_c"))
    )
    return (
        pairs.join(
            F.broadcast(m.select(F.col("event_type").alias("type_a"),
                                 F.col("c").alias("ca"))),
            on="type_a",
        )
        .join(
            F.broadcast(m.select(F.col("event_type").alias("type_b"),
                                 F.col("c").alias("cb"))),
            on="type_b",
        )
        .crossJoin(F.broadcast(ns))
        .select(
            "type_a",
            "type_b",
            F.col("both_c").cast("long").alias("n_cosessions"),
            F.round(
                (F.col("both_c") * F.col("n")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
