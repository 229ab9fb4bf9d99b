"""Twenty-fifth-wave operators — corpus-growth law, lexical
burstiness, and session bounce: a Heaps'-law vocabulary-growth fit
from token FIRST OCCURRENCES (no sequential accumulation — the
prefix-distinct count collapses to a closed form), Church–Gale word
burstiness (does a word spread thin or clump into few documents?),
and the session bounce rate per entry event type.

North-star greenfield. Conventions as established: exact integer
reductions, ln terms per-row with identical trees, OLS folds
rank-ordered, gaps-and-islands sessionization matching the
sessionize family's 1800 s rule.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.rowid import (
    assign_running_sum,
)
from duckdb_distributed_execution_spark.operators.text import tokens
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# Heaps' law: vocabulary growth V(n) ≈ K · n^beta
# ---------------------------------------------------------------------------

_HEAPS_POINTS = 10  # deciles of the doc-id order


@register(
    "heaps_law_fit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    firsts AS (SELECT t, MIN(doc_id) AS fd FROM tok GROUP BY t),
    dtok AS (SELECT doc_id, COUNT(*) AS ntok FROM tok GROUP BY doc_id),
    ids AS (
      SELECT doc_id, ntok,
             row_number() OVER (ORDER BY doc_id) AS i,
             COUNT(*) OVER () AS nd
      FROM dtok),
    marks AS (
      SELECT doc_id AS cut, i, nd FROM ids
      WHERE i % greatest(1, nd // {_HEAPS_POINTS}) = 0 AND i >= 2),
    pts AS (
      SELECT m.cut,
             (SELECT SUM(ntok) FROM ids WHERE doc_id <= m.cut) AS n_tokens,
             (SELECT COUNT(*) FROM firsts WHERE fd <= m.cut) AS vocab
      FROM marks m),
    le AS (
      SELECT cut, n_tokens, vocab,
             ln(CAST(n_tokens AS DOUBLE)) AS x,
             ln(CAST(vocab AS DOUBLE)) AS y,
             ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(vocab AS DOUBLE)) AS xy,
             ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_tokens AS DOUBLE)) AS xx
      FROM pts),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             list_reduce(list(x ORDER BY cut), (a, b) -> a + b) AS sx,
             list_reduce(list(y ORDER BY cut), (a, b) -> a + b) AS sy,
             list_reduce(list(xy ORDER BY cut), (a, b) -> a + b) AS sxy,
             list_reduce(list(xx ORDER BY cut), (a, b) -> a + b) AS sxx
      FROM le)
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
           ROUND(exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n), 6) AS k_coeff
    FROM sums
    """,
)
def heaps_law_fit(spark, sf_dir):
    """Heaps'-law fit of vocabulary growth V(n) ≈ K·n^β — natural
    corpora sit near β ≈ 0.5; β near 0 means a closed template
    vocabulary (synthetic/boilerplate), near 1 means id-like noise
    tokens. The trick that makes this DISTRIBUTABLE: the running
    prefix-distinct count does not need sequential accumulation —
    each token's FIRST containing doc (one grouped MIN) makes
    V(cut) = |{{tokens: first_doc ≤ cut}}|, a closed-form count at
    each of {10} decile cuts; token prefix sums come from the same
    per-doc aggregate. The ln-ln OLS reuses the zipf_alpha_fit
    rank-ordered-fold convention for IEEE parity. Two corpus-wide
    grouped aggregates total; the cuts relation is decile-sized."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t"))
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    dtok = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ntok"))
    # The per-doc relation grows with the corpus, so the running token
    # prefix sum + dense index route through the range-bucketed
    # running-sum operator (operators/rowid.py) instead of an
    # unpartitioned global window (round-4 advisor note); the doc
    # count attaches as a broadcast 1-row scalar.
    nd1 = dtok.agg(F.count(F.lit(1)).alias("nd"))
    ids = (
        assign_running_sum(
            dtok, ["doc_id"], "ntok", out_col="cum_tokens", id_col="i"
        )
        .crossJoin(F.broadcast(nd1))
        .select("doc_id", "ntok", "i", "cum_tokens", "nd")
    )
    marks = ids.filter(
        (F.col("i") % F.greatest(F.lit(1), F.expr(f"nd div {_HEAPS_POINTS}")) == 0)
        & (F.col("i") >= 2)
    ).select(F.col("doc_id").alias("cut"), F.col("cum_tokens").alias("n_tokens"))
    # vocab at each cut: count tokens whose first doc <= cut — a
    # broadcast of the decile cuts against the firsts relation.
    vocab = (
        firsts.join(F.broadcast(marks.select("cut")), F.col("fd") <= F.col("cut"))
        .groupBy("cut")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    pts = marks.join(vocab, on="cut")
    x = F.log(F.col("n_tokens").cast("double"))
    y = F.log(F.col("vocab").cast("double"))
    le = pts.select(
        "cut", x.alias("x"), y.alias("y"), (x * y).alias("xy"), (x * x).alias("xx")
    )

    def _fold(field):
        lst = F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("cut"), F.col(field).alias("v")))
            ),
            lambda s: s["v"],
        )
        return F.aggregate(lst, F.lit(0.0), lambda a, e: a + e)

    sums = le.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _fold("x").alias("sx"),
        _fold("y").alias("sy"),
        _fold("xy").alias("sxy"),
        _fold("xx").alias("sxx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return sums.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(slope, 6).alias("beta"),
        F.round(
            F.exp((F.col("sy") - slope * F.col("sx")) / F.col("n")), 6
        ).alias("k_coeff"),
    )


# ---------------------------------------------------------------------------
# Church–Gale word burstiness
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 3
_BURST_TOPK = 25


@register(
    "word_burstiness_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    stats AS (
      SELECT t, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
      FROM tok GROUP BY t HAVING COUNT(DISTINCT doc_id) >= {_BURST_MIN_DF})
    SELECT t AS token, CAST(cf AS BIGINT) AS corpus_freq,
           CAST(df AS BIGINT) AS doc_freq,
           ROUND(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            ORDER BY CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) DESC, t) AS rn
          FROM stats)
    WHERE rn <= {_BURST_TOPK}
    """,
)
def word_burstiness_topk(spark, sf_dir):
    """Church–Gale word burstiness: corpus frequency over document
    frequency — how many times a word repeats per document that
    contains it at all. Function words spread thin (burstiness ≈ 1);
    topical/template words clump (high) — the lexical diagnostic
    behind adaptive language models and the repetition screens. One
    grouped aggregate over the token explode (cf and df map-side
    combine together); the ratio is one double division of exact
    integers; top-k is a distributed TakeOrdered with token
    tie-break, never a global vocab sort."""
    d = load(spark, sf_dir, "documents")["documents"]
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t"))
    stats = (
        tok.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("cf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("df") >= _BURST_MIN_DF)
    )
    b = F.col("cf").cast("double") / F.col("df").cast("double")
    ranked = stats.withColumn(
        "rank", F.row_number().over(Window.orderBy(b.desc(), "t"))
    ).filter(F.col("rank") <= _BURST_TOPK)
    return ranked.select(
        F.col("t").alias("token"),
        F.col("cf").cast("long").alias("corpus_freq"),
        F.col("df").cast("long").alias("doc_freq"),
        F.round(b, 6).alias("burstiness"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Session bounce rate by entry event type
# ---------------------------------------------------------------------------

_BOUNCE_GAP_US = 1800 * 1_000_000  # the sessionize family's 30-min rule


@register(
    "session_bounce_rate",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > {_BOUNCE_GAP_US}
                  OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start,
             event_id
      FROM events),
    s AS (
      SELECT user_id, event_type, is_start,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    per AS (
      SELECT user_id, sid,
             COUNT(*) AS n_events,
             MAX(CASE WHEN is_start = 1 THEN event_type END) AS entry_type
      FROM s GROUP BY user_id, sid)
    SELECT entry_type,
           COUNT(*) AS n_sessions,
           SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS bounces,
           ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
    FROM per GROUP BY entry_type
    """,
)
def session_bounce_rate(spark, sf_dir):
    """Bounce rate by session ENTRY event type: sessions are the same
    30-minute-gap islands as the sessionize family ((ts, event_id)
    tie-broken), a bounce is a single-event session, and sessions
    group by their first event's type — the landing-surface quality
    read. Gaps-and-islands is one keyed window; the per-session
    rollup reuses the same user partitioning; every reduction is an
    integer count with one final division."""
    e = load(spark, sf_dir, "events")["events"]
    us = F.expr("unix_micros(ts)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_type",
        us.alias("us"),
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > _BOUNCE_GAP_US)
            | F.lag(us).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    ws = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = o.select(
        "user_id",
        "event_type",
        "is_start",
        F.sum("is_start").over(ws).alias("sid"),
    )
    per = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("is_start") == 1, F.col("event_type"))
        ).alias("entry_type"),
    )
    n = F.count(F.lit(1))
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per.groupBy("entry_type").agg(
        n.alias("n_sessions"),
        bounces.alias("bounces"),
        F.round(bounces.cast("double") / n.cast("double"), 6).alias(
            "bounce_rate"
        ),
    )
