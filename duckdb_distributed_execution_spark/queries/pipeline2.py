"""Training-data pipeline operators, second wave: RAG-style document
chunking, n-gram (bigram) corpus statistics, length-bucketed batching,
gaps-and-islands sessionless streak analysis, and a grouped
Pandas-UDF OLS proving the Arrow-batch Python path against an exact
relational oracle.

All greenfield vs the reference (north-star scope in BASELINE.json);
each is designed scale-first: chunking and bucketing are pure
per-row/explode projections (no shuffle), bigrams shuffle once on the
gram key with map-side partial counts, and the Pandas UDF receives
Arrow record batches per group (never row-at-a-time Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.queries import load, register


@register(
    "doc_chunking",
    oracle="""
    WITH starts AS (
        SELECT doc_id, text,
               UNNEST(range(1, greatest(length(text), 1) + 1, 60)) AS i
        FROM documents
        WHERE doc_id % 11 = 0
    )
    SELECT doc_id,
           CAST((i - 1) / 60 AS BIGINT) AS chunk_idx,
           substr(text, CAST(i AS INTEGER), 80) AS chunk,
           length(substr(text, CAST(i AS INTEGER), 80)) AS chunk_len
    FROM starts
    """,
)
def doc_chunking(spark, sf_dir):
    """Sliding-window document chunking (size 80, stride 60 — 20-char
    overlap), the RAG / context-window prep step. Expressed as
    sequence() + explode: a narrow per-row transform with no shuffle
    and no Python; output row count scales with total corpus bytes /
    stride, each chunk carrying (doc_id, chunk_idx) lineage for
    join-back."""
    d = load(spark, sf_dir, "documents")["documents"]
    size, stride = 80, 60
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(stride)
    )
    return (
        d.filter(F.col("doc_id") % 11 == 0)
        .select("doc_id", "text", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            ((F.col("i") - 1) / stride).cast("bigint").alias("chunk_idx"),
            F.substring(F.col("text"), F.col("i"), size).alias("chunk"),
            F.length(F.substring(F.col("text"), F.col("i"), size)).alias(
                "chunk_len"
            ),
        )
    )


@register(
    "bigram_topk",
    oracle="""
    WITH words AS (
        SELECT doc_id, w.word, w.pos
        FROM documents d,
             LATERAL (SELECT UNNEST(string_split(d.text, ' ')) AS word,
                             generate_subscripts(
                                 string_split(d.text, ' '), 1) AS pos) w
        WHERE d.lang = 'en'
    )
    SELECT a.word || ' ' || b.word AS bigram, COUNT(*) AS n
    FROM words a
    JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1
    ORDER BY n DESC, bigram ASC
    LIMIT 25
    """,
)
def bigram_topk(spark, sf_dir):
    """Corpus bigram counts, top 25 — the n-gram statistics pass
    behind contamination screens and LM heuristics. Spark builds
    adjacent pairs INSIDE each row via a zip of the token array with
    itself shifted (pure higher-order functions — no positional
    self-join, no extra shuffle); only the final count shuffles, on
    the gram key with map-side partial aggregation. The oracle takes
    the relational route (positions + self-join) — two independent
    formulations agreeing on the result."""
    d = load(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.col("text"), " ", -1)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(
            toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))
        ),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.filter(F.col("lang") == "en")
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(25)
    )


@register(
    "length_bucket_batches",
    oracle="""
    SELECT CASE WHEN n_chars < 0 THEN 0
                WHEN n_chars >= 1000 THEN 11
                ELSE CAST(n_chars // 100 + 1 AS BIGINT) END AS bucket,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
           MIN(n_chars) AS shortest,
           MAX(n_chars) AS longest
    FROM documents
    GROUP BY 1
    """,
)
def length_bucket_batches(spark, sf_dir):
    """Length-bucketed batching stats: docs binned by size so a
    training loader can pack similar-length sequences together
    (padding waste ∝ in-batch length variance). Spark's width_bucket;
    the oracle mirrors its exact edge semantics (0 below range,
    nbuckets+1 at/above max) arithmetically, DuckDB having no
    width_bucket. One scan + one tiny shuffle on ≤12 bucket keys."""
    d = load(spark, sf_dir, "documents")["documents"]
    return d.groupBy(
        F.width_bucket("n_chars", F.lit(0), F.lit(1000), F.lit(10)).alias(
            "bucket"
        )
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("shortest"),
        F.max("n_chars").alias("longest"),
    )


@register(
    "gaps_islands",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
        FROM events
    )
    SELECT user_id, event_type, COUNT(*) AS streak_len,
           MIN(ts) AS streak_start
    FROM marked
    GROUP BY user_id, event_type, grp
    HAVING COUNT(*) >= 3
    ORDER BY user_id, streak_start
    """,
)
def gaps_islands(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (the row_number-difference trick), keeping streaks ≥ 3.
    One shuffle on user_id serves both window functions (Catalyst
    plans them in a single Window stage over the same partitioning);
    the island group-by reuses that clustering."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")["events"]
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    marked = e.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_type)
    )
    return (
        marked.groupBy("user_id", "event_type", "grp")
        .agg(
            F.count("*").alias("streak_len"),
            F.min("ts").alias("streak_start"),
        )
        .filter(F.col("streak_len") >= 3)
        .select("user_id", "event_type", "streak_len", "streak_start")
        .orderBy("user_id", "streak_start")
    )


@register(
    "groupwise_ols_pandas",
    oracle="""
    SELECT o_orderstatus,
           ROUND(regr_slope(o_totalprice, o_custkey), 6) AS slope,
           ROUND(regr_intercept(o_totalprice, o_custkey), 2) AS icept,
           regr_count(o_totalprice, o_custkey) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def groupwise_ols_pandas(spark, sf_dir):
    """Per-group OLS fit via applyInPandas — the Arrow-batched Python
    escape hatch, verified against DuckDB's regr_* closed form. Each
    group arrives as ONE pandas DataFrame (Arrow columnar transfer,
    never row-at-a-time); the computation uses the same
    sum-of-products closed form as the SQL aggregates so the only
    divergence is float summation order, absorbed by rounding. This is
    the template for custom per-entity model fitting where no SQL
    aggregate exists."""
    o = load(spark, sf_dir, "orders")["orders"]

    def fit(pdf):
        import pandas as pd

        x = pdf["o_custkey"].astype("float64")
        y = pdf["o_totalprice"].astype("float64")
        n = len(pdf)
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        denom = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / denom
        icept = (sy - slope * sx) / n
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "slope": [round(slope, 6)],
                "icept": [round(icept, 2)],
                "n": [n],
            }
        )

    return (
        o.select("o_orderstatus", "o_custkey", "o_totalprice")
        .groupBy("o_orderstatus")
        .applyInPandas(
            fit,
            "o_orderstatus string, slope double, icept double, n bigint",
        )
    )
