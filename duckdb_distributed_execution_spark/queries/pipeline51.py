"""Fifty-first wave — the ingestion FUNNEL: the FineWeb/CCNet-style
pipeline (domain quota → exact dedup → quality rules → LM perplexity
cut) as ONE declarative query emitting per-source stage-survival
counts — the yield dashboard a 100 TB ingest is operated by.

Every stage is an operator used standalone elsewhere
(keyed_row_number quota = domain_quota_sample; fingerprint keep-first
= dedup_exact; quality_score = text_quality; ppl cut =
streaming_ppl_screen's threshold); this query proves they compose in
one plan and accounts the attrition, not just the survivors
(pipeline_dedup_quality_filter emits the surviving rows — this emits
the funnel). Reference has no ingest surface (north-star greenfield,
BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators import text as X
from duckdb_distributed_execution_spark.operators.rowid import (
    keyed_kth_smallest,
)
from duckdb_distributed_execution_spark.queries import load, register
from duckdb_distributed_execution_spark.queries.pipeline42 import (
    PPL_ORACLE_CTES,
    doc_ppl_df,
)

_QUOTA = 20
_QMIN = 0.72


@register(
    "ingest_funnel_by_source",
    oracle=f"""
    WITH {PPL_ORACLE_CTES},
    nn AS (SELECT COUNT(*) AS n FROM docppl),
    thr AS (
      SELECT ppl AS cut
      FROM (SELECT ppl, ROW_NUMBER() OVER (ORDER BY ppl, doc_id) AS rn
            FROM docppl), nn
      WHERE rn = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1),
    base AS (
      SELECT doc_id, source, text,
             {X.oracle_quality_score('text')} AS quality,
             {X.oracle_fingerprint('text')} AS fp,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
               AS rn
      FROM documents),
    keepfp AS (
      SELECT fp, MIN(doc_id) AS keep_id
      FROM base WHERE rn <= {_QUOTA} GROUP BY fp),
    flags AS (
      SELECT b.source,
             CASE WHEN b.rn <= {_QUOTA} THEN 1 ELSE 0 END AS f_quota,
             CASE WHEN b.rn <= {_QUOTA} AND k.keep_id = b.doc_id
                  THEN 1 ELSE 0 END AS f_exact,
             CASE WHEN b.rn <= {_QUOTA} AND k.keep_id = b.doc_id
                       AND b.quality >= {_QMIN} THEN 1 ELSE 0 END
               AS f_quality,
             CASE WHEN b.rn <= {_QUOTA} AND k.keep_id = b.doc_id
                       AND b.quality >= {_QMIN}
                       AND COALESCE(p.ppl <= thr.cut, FALSE)
                  THEN 1 ELSE 0 END AS f_ppl,
             len(string_split(b.text, ' ')) AS n_words
      FROM base b
      LEFT JOIN keepfp k ON k.fp = b.fp
      LEFT JOIN docppl p ON p.doc_id = b.doc_id
      CROSS JOIN thr)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(f_quota) AS BIGINT) AS n_quota,
           CAST(SUM(f_exact) AS BIGINT) AS n_exact,
           CAST(SUM(f_quality) AS BIGINT) AS n_quality,
           CAST(SUM(f_ppl) AS BIGINT) AS n_ppl,
           CAST(SUM(CASE WHEN f_ppl = 1 THEN n_words ELSE 0 END)
                AS BIGINT) AS tokens_kept
    FROM flags GROUP BY source
    """,
)
def ingest_funnel_by_source(spark, sf_dir):
    """Per-source survival counts through the four-stage ingest:
    quota cap (first 20 per source — r7: a per-source k-th-smallest
    threshold broadcast, keyed_kth_smallest, replacing the full
    keyed_row_number rank), exact dedup (min-id per content
    fingerprint AMONG quota survivors — dedup order matters and is
    pinned), Gopher-ish quality floor, and the corpus-p90 perplexity
    cut, plus the surviving token mass. One corpus pass computes all
    flags; the LM relation joins per doc; every stage relation is
    reused from its standalone operator."""
    d = load(spark, sf_dir, "documents")["documents"]
    # r10 probe, REVERTED: running the (independent) features+quota
    # pin from a driver thread concurrently with the LM pin (guide
    # §2.6 overlap) measured NEUTRAL-to-worse at sf1 — bench A/B 1.00
    # (5.319 vs 5.305 s), warm-session runs slightly slower — the LM's
    # wide stages already saturate local[32], so the overlap only adds
    # scheduling contention. Worth re-probing on a real cluster where
    # the LM tail leaves executors idle.
    #
    # The bigram-LM relation is the expensive subtree and is consumed
    # THREE times (count, p90 probe, per-doc join) — pin it once.
    # Before the r6 localCheckpoint each consumer re-trained the LM
    # from scratch: 20.5 s at organic sf1, vs one training pass after.
    ppl = (
        doc_ppl_df(spark, sf_dir).select("doc_id", "ppl").localCheckpoint()
    )
    n_docs = ppl.count()
    cut = (
        ppl.orderBy("ppl", "doc_id")
        .offset(int(0.9 * (n_docs - 1)))
        .limit(1)
        .first()["ppl"]
    )
    # ONE fused Arrow pass for quality/fp/n_words (r7 — the JVM column
    # form re-ran normalize ~4× and tokenize ~3× per row with an
    # interpreted stopword filter; byte-identical outputs, see
    # doc_features_arrow). n_words is computed in the same pass so the
    # pinned relation below never materializes the text column (the r6
    # profile showed the checkpoint writing the full corpus text:
    # 10 s of the funnel's 20 s was this one phase).
    base = X.doc_features_arrow(d, "doc_id", "text", carry_cols=("source",))
    # Quota check WITHOUT per-row ranks (r7): "rn <= QUOTA by doc_id
    # within source" ⟺ "doc_id <= the source's QUOTA-th smallest
    # doc_id" (doc_id is unique), and the per-source thresholds are a
    # |sources|-row broadcast from one bounded partial-top-k pass —
    # keyed_row_number's 3 passes and its doc-keyed shuffle join were
    # ~2 s of the sf1 funnel wall serving only this boolean.
    thr = keyed_kth_smallest(
        d.select("source", "doc_id"), ["source"], "doc_id", _QUOTA
    )
    in_quota = F.col("kth").isNull() | (F.col("doc_id") <= F.col("kth"))
    # b feeds both keepfp and flags; pinning it avoids re-running the
    # quality/fingerprint pass over the whole corpus a second time.
    b = (
        base.join(F.broadcast(thr), "source", "left")
        .withColumn("in_quota", in_quota)
        .drop("kth")
        .localCheckpoint()
    )
    keepfp = (
        b.filter(F.col("in_quota"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    flags = (
        b.join(keepfp, "fp", "left")
        .join(ppl, "doc_id", "left")
        .select(
            "source",
            F.when(F.col("in_quota"), 1).otherwise(0).alias("f_quota"),
            F.when(
                F.col("in_quota")
                & (F.col("keep_id") == F.col("doc_id")),
                1,
            )
            .otherwise(0)
            .alias("f_exact"),
            F.when(
                F.col("in_quota")
                & (F.col("keep_id") == F.col("doc_id"))
                & (F.col("quality") >= _QMIN),
                1,
            )
            .otherwise(0)
            .alias("f_quality"),
            F.when(
                F.col("in_quota")
                & (F.col("keep_id") == F.col("doc_id"))
                & (F.col("quality") >= _QMIN)
                & F.coalesce(F.col("ppl") <= F.lit(cut), F.lit(False)),
                1,
            )
            .otherwise(0)
            .alias("f_ppl"),
            "n_words",
        )
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        F.sum("f_quota").cast("long").alias("n_quota"),
        F.sum("f_exact").cast("long").alias("n_exact"),
        F.sum("f_quality").cast("long").alias("n_quality"),
        F.sum("f_ppl").cast("long").alias("n_ppl"),
        F.sum(
            F.when(F.col("f_ppl") == 1, F.col("n_words")).otherwise(0)
        )
        .cast("long")
        .alias("tokens_kept"),
    )
