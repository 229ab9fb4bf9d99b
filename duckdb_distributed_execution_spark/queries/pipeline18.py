"""Eighteenth-wave operators — retrieval fusion and behavioral shape:
reciprocal-rank-fusion hybrid retrieval (the BM25+ANN combiner every
RAG stack ships), embedding cluster quality (centroid compactness vs
separation — the label-health read before using labels as dedup
blocks or eval strata), inter-arrival burstiness (bot/power-user
screen from exact integer power sums), and a Gini/Lorenz read of user
activity concentration.

North-star greenfield (the reference has no retrieval/graph/stats
surface — BASELINE.json). Cross-engine conventions as established:
integer/exact-decimal reductions wherever a value crosses rows;
per-row doubles with identical expression trees; similarity scores
ROUND()ed to 4 decimals before any rank; rank ties broken on a unique
key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import local_rows_df
from duckdb_distributed_execution_spark.functions import (
    EXACT_DECIMAL,
    dot_product,
    exact_avg_rounded,
    l2_norm,
    oracle_exact_avg_rounded,
)
from duckdb_distributed_execution_spark.operators.text import (
    oracle_normalize,
)
from duckdb_distributed_execution_spark.queries import load, register

_WS = r"\s+"


def _tok_oracle(expr: str = "text") -> str:
    return f"regexp_split_to_array({oracle_normalize(expr)}, '{_WS}')"


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion of lexical + vector lists
# ---------------------------------------------------------------------------

# (query_id, term_a, term_b, query_vec_id): the lexical half scores
# tf-idf over the two terms; the vector half ranks by cosine to the
# designated query embedding (doc_id and vec_id share one id domain
# in the testdata). Exactly two terms per query keeps the per-doc
# lexical score a single commutative double add.
_RRF_QUERIES = [
    ("q1", "spark", "window", 7),
    ("q2", "hash", "merge", 123),
    ("q3", "customer", "vector", 321),
]
_RRF_K = 60     # standard RRF dampening constant
_RRF_DEPTH = 20  # depth of each source ranking
_RRF_TOPK = 10

_ORACLE_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "rag_hybrid_rrf",
    oracle=f"""
    WITH q(query_id, term) AS (
      VALUES {", ".join(f"('{q}', '{t}')" for q, a, b, _ in _RRF_QUERIES for t in (a, b))}),
    qv AS (
      {" UNION ALL ".join(
          f"SELECT '{q}' AS query_id, {v} AS qid, CAST(embedding AS DOUBLE[]) AS qv "
          f"FROM embeddings WHERE vec_id = {v}"
          for q, _, _, v in _RRF_QUERIES)}),
    tok AS (
      SELECT doc_id, unnest({_tok_oracle()}) AS term FROM documents),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term IN (SELECT DISTINCT term FROM q)
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    lexscore AS (
      SELECT q.query_id, tf.doc_id,
             ROUND(SUM(CAST(tf.tf AS DOUBLE)
                       * ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE))),
                   4) AS s
      FROM tf
      JOIN q ON q.term = tf.term
      JOIN dfreq d ON d.term = tf.term
      CROSS JOIN nd n
      GROUP BY q.query_id, tf.doc_id),
    lex AS (
      SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rank_lex
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY s DESC, doc_id) AS rn
            FROM lexscore)
      WHERE rn <= {_RRF_DEPTH}),
    sims AS (
      SELECT qv.query_id, e.vec_id AS doc_id,
             ROUND({_ORACLE_COS.format(a="qv.qv", b="CAST(e.embedding AS DOUBLE[])")},
                   4) AS sim
      FROM qv JOIN embeddings e ON e.vec_id <> qv.qid),
    vec AS (
      SELECT query_id, doc_id, CAST(rn AS INTEGER) AS rank_vec
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, doc_id) AS rn
            FROM sims)
      WHERE rn <= {_RRF_DEPTH}),
    fused AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.rank_lex, v.rank_vec,
             ROUND(COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + l.rank_lex), 0.0)
                   + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + v.rank_vec), 0.0),
                   6) AS rrf_score
      FROM lex l
      FULL OUTER JOIN vec v
        ON v.query_id = l.query_id AND v.doc_id = l.doc_id)
    SELECT query_id, CAST(rn AS INTEGER) AS rk, doc_id,
           rrf_score, rank_lex, rank_vec
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_score DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= {_RRF_TOPK}
    """,
)
def rag_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval via reciprocal rank fusion: a tf-idf lexical
    top-20 and a cosine vector top-20 per query are fused with the
    standard RRF formula sum(1/(60+rank)) — rank-based, so the two
    heterogeneous score scales never need calibration (why RRF is the
    default fuser in production RAG). The lexical side is
    postings-bounded (term semi-join before scoring, O(matching
    postings) like bm25_retrieval_topk); the vector side broadcasts
    the 3 query vectors against the partitioned corpus (the corpus
    never shuffles); fusion is a FULL OUTER join of two
    20-row-per-query rankings — driver-scale relations. Scores round
    to 4 decimals before each rank (libm ln / float cosine last-ulp
    drift), the fused score is two exact-rational doubles added in a
    fixed order, rounded to 6; all ranks tie-break on doc_id."""
    d, e = (lambda t: (t["documents"], t["embeddings"]))(
        load(spark, sf_dir, "documents", "embeddings")
    )
    q = local_rows_df(
        spark,
        [(qid, t) for qid, a, b, _ in _RRF_QUERIES for t in (a, b)],
        "query_id STRING, term STRING",
    )
    qvec = local_rows_df(
        spark, [(qid, v) for qid, _, _, v in _RRF_QUERIES], "query_id STRING, qid LONG"
    )
    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    # ONE Arrow pass emits the (doc, term, tf) postings for the six
    # constant query terms directly (r10, term_counts_arrow — the term
    # filter and per-doc count pushed inside the kernel, guide §2.3):
    # the old shape exploded the full token stream across the Arrow
    # boundary, semi-joined it and paid a (doc, term) exchange.
    # Pinned because tf feeds the dfreq broadcast AND the scoring join
    # (broadcast subtrees don't share exchange reuse — r6); the pin is
    # now O(matching postings), not the token stream.
    from duckdb_distributed_execution_spark.operators.text import (
        term_counts_arrow,
    )

    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = term_counts_arrow(
        d, "doc_id", "text",
        sorted({t for _, a, b, _ in _RRF_QUERIES for t in (a, b)}),
    ).localCheckpoint()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    lexscore = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nd))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.col("tf").cast("double")
                    * F.log(
                        F.col("n_docs").cast("double")
                        / F.col("df").cast("double")
                    )
                ),
                4,
            ).alias("s")
        )
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("s"), "doc_id")
    lex = (
        lexscore.withColumn("rank_lex", F.row_number().over(wl).cast("int"))
        .filter(F.col("rank_lex") <= _RRF_DEPTH)
        .select("query_id", "doc_id", "rank_lex")
    )
    qv = qvec.join(
        e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")),
        on="qid",
    ).select("query_id", "qid", "qv", l2_norm(F.col("qv")).alias("qn"))
    # corpus norm hoisted per ROW (was recomputed per (row, query)
    # pair — 3× redundant interpreted folds), corpus N-wide (r6)
    ec = ensure_min_parallelism(
        e.select(
            "vec_id", "embedding", l2_norm(F.col("embedding")).alias("cn")
        )
    )
    sims = ec.join(F.broadcast(qv), F.col("vec_id") != F.col("qid")).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(
            dot_product(F.col("qv"), F.col("embedding"))
            / (F.col("qn") * F.col("cn")),
            4,
        ).alias("sim"),
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("sim"), "doc_id")
    vec = (
        sims.withColumn("rank_vec", F.row_number().over(wv).cast("int"))
        .filter(F.col("rank_vec") <= _RRF_DEPTH)
        .select("query_id", "doc_id", "rank_vec")
    )
    fused = (
        lex.alias("l")
        .join(
            vec.alias("v"),
            (F.col("l.query_id") == F.col("v.query_id"))
            & (F.col("l.doc_id") == F.col("v.doc_id")),
            "full_outer",
        )
        .select(
            F.coalesce("l.query_id", "v.query_id").alias("query_id"),
            F.coalesce("l.doc_id", "v.doc_id").alias("doc_id"),
            F.col("l.rank_lex").alias("rank_lex"),
            F.col("v.rank_vec").alias("rank_vec"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("l.rank_lex")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("v.rank_vec")),
                    F.lit(0.0),
                ),
                6,
            ).alias("rrf_score"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rk", F.row_number().over(wf).cast("int"))
        .filter(F.col("rk") <= _RRF_TOPK)
        .select("query_id", "rk", "doc_id", "rrf_score", "rank_lex", "rank_vec")
    )


# ---------------------------------------------------------------------------
# Embedding cluster quality: centroid compactness vs separation
# ---------------------------------------------------------------------------


@register(
    "embedding_cluster_quality",
    oracle=f"""
    WITH p AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
             UNNEST(CAST(embedding AS DOUBLE[])) AS e
      FROM embeddings),
    cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(e AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS c
      FROM p GROUP BY label, pos),
    ca AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label),
    intra AS (
      SELECT e.label,
             COUNT(*) AS n_vecs,
             {oracle_exact_avg_rounded(
                 "ROUND(" + _ORACLE_COS.format(
                     a="CAST(e.embedding AS DOUBLE[])", b="ca.cv") + ", 4)")}
               AS mean_intra_cos
      FROM embeddings e JOIN ca ON ca.label = e.label
      GROUP BY e.label),
    inter AS (
      SELECT a.label,
             MAX(ROUND({_ORACLE_COS.format(a="a.cv", b="b.cv")}, 4))
               AS max_inter_cos
      FROM ca a JOIN ca b ON a.label <> b.label
      GROUP BY a.label)
    SELECT i.label, i.n_vecs, i.mean_intra_cos, x.max_inter_cos,
           ROUND(i.mean_intra_cos - x.max_inter_cos, 6) AS margin
    FROM intra i JOIN inter x ON x.label = i.label
    """,
)
def embedding_cluster_quality(spark, sf_dir):
    """Label-cluster health for an embedding corpus: per label, the
    exact per-dimension centroid, mean cosine of members to their own
    centroid (compactness), max cosine between this centroid and any
    other (separation), and the margin — the silhouette-style read
    run before trusting labels as dedup blocks, eval strata, or IVF
    seeds. Centroids are exact: per-dimension DECIMAL sums (the
    array_explode convention) with ONE double division, so both
    engines build bit-identical centroid arrays; member cosines are
    ordered left folds rounded to 4 before the exact-decimal mean
    (exact_avg_rounded — integer-space round-half decision). The
    explode shuffle carries |labels|×dim rows after map-side combine;
    centroids (k×dim doubles) broadcast back, so the corpus shuffles
    ZERO times — the same plan shape IVF training uses at 100 TB."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    p = e.select("label", F.posexplode("embedding").alias("pos", "ef")).select(
        "label", "pos", F.col("ef").cast("double").alias("e")
    )
    cent = p.groupBy("label", "pos").agg(
        (
            F.sum(F.col("e").cast(EXACT_DECIMAL)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("c")
    )
    ca = cent.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", F.col("c").alias("v")))),
            lambda s: s["v"],
        ).alias("cv")
    )
    intra = (
        e.join(F.broadcast(ca), on="label")
        .select(
            "label",
            F.round(
                dot_product(F.col("embedding"), F.col("cv"))
                / (l2_norm(F.col("embedding")) * l2_norm(F.col("cv"))),
                4,
            ).alias("cos"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            exact_avg_rounded("cos").alias("mean_intra_cos"),
        )
    )
    a = ca.select(F.col("label"), F.col("cv").alias("av"))
    b = ca.select(F.col("label").alias("lb"), F.col("cv").alias("bv"))
    inter = (
        a.join(F.broadcast(b), F.col("label") != F.col("lb"))
        .select(
            "label",
            F.round(
                dot_product(F.col("av"), F.col("bv"))
                / (l2_norm(F.col("av")) * l2_norm(F.col("bv"))),
                4,
            ).alias("cos"),
        )
        .groupBy("label")
        .agg(F.max("cos").alias("max_inter_cos"))
    )
    return intra.join(inter, on="label").select(
        "label",
        "n_vecs",
        "mean_intra_cos",
        "max_inter_cos",
        F.round(F.col("mean_intra_cos") - F.col("max_inter_cos"), 6).alias(
            "margin"
        ),
    )


# ---------------------------------------------------------------------------
# Inter-arrival burstiness (bot / power-user screen)
# ---------------------------------------------------------------------------


@register(
    "interarrival_burstiness",
    oracle="""
    WITH g AS (
      SELECT user_id,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS gap
      FROM events),
    s AS (
      SELECT user_id,
             COUNT(gap) AS n_gaps,
             SUM(gap) AS s,
             SUM(CAST(gap AS HUGEINT) * gap) AS ss
      FROM g WHERE gap IS NOT NULL
      GROUP BY user_id
      HAVING COUNT(gap) >= 2)
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST((2 * CAST(s AS HUGEINT) * 10000 + n_gaps)
                // (2 * CAST(n_gaps AS HUGEINT)) AS DOUBLE) / 10000.0
             AS mean_gap_us,
           ROUND((sqrt(CAST(CAST(n_gaps AS HUGEINT) * ss - CAST(s AS HUGEINT) * s
                            AS DOUBLE)) / CAST(n_gaps AS DOUBLE)
                  - CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                 / (sqrt(CAST(CAST(n_gaps AS HUGEINT) * ss - CAST(s AS HUGEINT) * s
                              AS DOUBLE)) / CAST(n_gaps AS DOUBLE)
                    + CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
                 6) AS burstiness
    FROM s
    """,
)
def interarrival_burstiness(spark, sf_dir):
    """Per-user burstiness of inter-event gaps: B = (σ−μ)/(σ+μ) over
    microsecond inter-arrival times (Goh-Barabási burstiness — B→1
    bursty, B≈0 Poisson, B→−1 metronomic; a metronomic high-volume
    user is bot-shaped). Gaps come from ONE keyed window (lead over
    user, ts — event_id tie-break makes equal timestamps
    deterministic); μ and σ derive from EXACT integer power sums —
    Σgap as int64, Σgap² as DECIMAL(38,0)/HUGEINT (a square of a
    µs-scale gap overflows int64), variance numerator n·Σg²−(Σg)² in
    exact integer space — so the only doubles are one sqrt and two
    divisions with identical trees both engines. Map-side combining
    aggregates; no global funnel; at 100 TB this is one shuffle on
    user_id."""
    e = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    g = e.select(
        "user_id", (F.lead(us).over(w) - us).alias("gap")
    ).filter(F.col("gap").isNotNull())
    dec = "decimal(38,0)"
    s = (
        g.groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.sum("gap").alias("s"),
            F.sum(F.col("gap").cast("decimal(18,0)") * F.col("gap").cast("decimal(18,0)"))
            .cast(dec)
            .alias("ss"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    num = (
        F.col("n_gaps").cast(dec) * F.col("ss")
        - F.col("s").cast(dec) * F.col("s").cast(dec)
    ).cast("double")
    sigma = F.sqrt(num) / F.col("n_gaps").cast("double")
    mu = F.col("s").cast("double") / F.col("n_gaps").cast("double")
    # mean_gap_us rounds in INTEGER space (the exact_avg_rounded
    # idiom): at sf0.1 the quotient has 15 significant digits, where
    # Spark's shortest-repr HALF_UP and DuckDB's binary ROUND diverge
    # at the 4th decimal. Gaps are nonnegative (ordered lead), so no
    # sign branch is needed; the ×10⁴ scale rides DECIMAL(38,0).
    mean4 = F.call_function(
        "div",
        F.lit(2) * F.col("s").cast(dec) * F.lit(10000) + F.col("n_gaps"),
        F.lit(2) * F.col("n_gaps").cast(dec),
    ).cast("double") / F.lit(10000.0)
    return s.select(
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        mean4.alias("mean_gap_us"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Activity concentration: Gini / Lorenz over events per user
# ---------------------------------------------------------------------------


@register(
    "activity_gini_lorenz",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id),
    r AS (
      SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM c),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS tot, SUM(i * x) AS ix FROM r),
    k AS (
      SELECT n, tot, ix, greatest(1, n // 10) AS k FROM s),
    top AS (
      SELECT SUM(x) AS topx FROM r, k WHERE r.i > k.n - k.k)
    SELECT CAST(k.n AS BIGINT) AS n_users,
           CAST(k.tot AS BIGINT) AS total_events,
           ROUND(CAST(2 * k.ix - (k.n + 1) * k.tot AS DOUBLE)
                 / CAST(k.n * k.tot AS DOUBLE), 6) AS gini,
           ROUND(CAST(top.topx AS DOUBLE) / CAST(k.tot AS DOUBLE), 6)
             AS top_decile_share
    FROM k, top
    """,
)
def activity_gini_lorenz(spark, sf_dir):
    """Concentration of event volume across users: the exact Gini
    coefficient from the sorted-rank identity
    G = (2·Σi·x_i − (n+1)·Σx) / (n·Σx) plus the top-decile share —
    the skew read that decides whether a per-user key needs salting
    and whether engagement is whale-dominated. Every reduction is an
    exact integer (rank·count products, sums), so the only doubles
    are two final divisions. The rank window runs over the per-user
    AGGREGATE (|users| rows, not |events|); at extreme user
    cardinality the same ranks come from the range-bucket
    keyed_row_number operator (operators/rowid.py) — the raw corpus
    itself never passes through a single-partition window."""
    e = load(spark, sf_dir, "events")["events"]
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    # Ranks AND full-frame totals come from the SAME ordered window
    # (one sort, no scalar cross joins — plancheck bnlj hygiene): the
    # full-frame count/sum ride the partition the rank already built.
    wo = Window.orderBy("x", "user_id")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    r = c.select(
        "x",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wf).alias("n"),
        F.sum("x").over(wf).alias("tot"),
    ).withColumn("k", F.greatest(F.lit(1), F.expr("n div 10")))
    s = r.agg(
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
        F.sum(F.col("i") * F.col("x")).alias("ix"),
        F.sum(F.when(F.col("i") > F.col("n") - F.col("k"), F.col("x"))).alias(
            "topx"
        ),
    )
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("tot").cast("long").alias("total_events"),
        F.round(
            (F.lit(2) * F.col("ix") - (F.col("n") + 1) * F.col("tot")).cast(
                "double"
            )
            / (F.col("n") * F.col("tot")).cast("double"),
            6,
        ).alias("gini"),
        F.round(
            F.col("topx").cast("double") / F.col("tot").cast("double"), 6
        ).alias("top_decile_share"),
    )
