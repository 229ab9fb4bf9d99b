"""Round-2 widening: PQ-ADC similarity search, Bloom-filter
decontamination, exponential moving averages, ORC sink/source.

All greenfield LLM-pipeline / warehouse surface beyond the
reference's own operators (the reference delegates every scalar and
window computation to DuckDB and has no vector or corpus tooling —
SURVEY §0, §2.B). Each query keeps the repo's determinism
conventions: identical double op order on both engines, exact-decimal
accumulation for order-dependent sums, ROUND()ed similarity outputs,
unique-key ordering for any row subset.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import oracle_exact_sum
from duckdb_distributed_execution_spark.operators.dedup import oracle_word_shingles, word_shingles
from duckdb_distributed_execution_spark.queries import load, register
from duckdb_distributed_execution_spark.queries.extras import (
    _ROUNDTRIP_ORACLE,
    _roundtrip_agg,
)

# ---------------------------------------------------------------------------
# Product quantization — asymmetric distance top-k
# ---------------------------------------------------------------------------

_PQ_M = 8        # subspaces
_PQ_DSUB = 8     # dims per subspace (8 x 8 = the 64-dim embeddings)
_PQ_K = 16       # codes per subspace (seeded codebook)

_PQ_COMMON = f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    subs AS (SELECT CAST(i AS INTEGER) AS sub FROM range(0, {_PQ_M}) t(i)),
    cbv AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, e
            FROM v WHERE vec_id < {_PQ_K}),
    cb AS (SELECT code, sub,
                  list_slice(e, sub * {_PQ_DSUB} + 1, sub * {_PQ_DSUB} + {_PQ_DSUB}) AS cv
           FROM cbv CROSS JOIN subs),
    corp AS (SELECT vec_id, sub,
                    list_slice(e, sub * {_PQ_DSUB} + 1, sub * {_PQ_DSUB} + {_PQ_DSUB}) AS sv
             FROM v CROSS JOIN subs WHERE vec_id >= {_PQ_K}),
    encd AS (SELECT c.vec_id, c.sub, cb.code,
                    (list_dot_product(sv, sv) - 2.0 * list_dot_product(sv, cv))
                      + list_dot_product(cv, cv) AS dist
             FROM corp c JOIN cb ON cb.sub = c.sub),
    enc AS (SELECT vec_id, sub, code FROM (
              SELECT vec_id, sub, code,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                        ORDER BY dist, code) AS rn
              FROM encd) WHERE rn = 1)
"""


@register(
    "ann_pq_codes",
    oracle=f"""
    WITH {_PQ_COMMON}
    SELECT sub, code, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec
    FROM enc GROUP BY sub, code
    """,
)
def ann_pq_codes(spark, sf_dir):
    """PQ index build, checked at the code-assignment level: every
    corpus vector quantized to 8 sub-codes against a deterministic
    seeded codebook (the 16 lowest vec_ids' subvectors — one
    assignment step; `similarity.kmeans` refines codebooks when real
    training is wanted). The per-(sub, code) occupancy histogram is
    the index statistic an IVF-PQ deployment monitors for balance."""
    from duckdb_distributed_execution_spark.operators.similarity import (
        pq_encode,
        pq_subvectors,
    )

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    cb_src = e.filter(F.col("vec_id") < _PQ_K)
    w = Window.orderBy("vec_id")
    cb_ranked = cb_src.select(
        (F.row_number().over(w) - 1).cast("int").alias("code"), "embedding"
    )
    cb = pq_subvectors(cb_ranked, "code", "embedding", _PQ_M, _PQ_DSUB).select(
        F.col("__id").alias("code"), "sub", F.col("sv").alias("cv")
    )
    corpus = e.filter(F.col("vec_id") >= _PQ_K)
    codes = pq_encode(corpus, cb, m=_PQ_M, dsub=_PQ_DSUB)
    return codes.groupBy("sub", "code").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("vec_id").alias("min_vec"),
    )


@register(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH {_PQ_COMMON},
    qsub AS (SELECT vec_id AS query_id, sub,
                    list_slice(e, sub * {_PQ_DSUB} + 1, sub * {_PQ_DSUB} + {_PQ_DSUB}) AS qv
             FROM v CROSS JOIN subs
             WHERE vec_id >= {_PQ_K} AND vec_id < {_PQ_K + 5}),
    lut AS (SELECT query_id, q.sub, cb.code,
                   (list_dot_product(qv, qv) - 2.0 * list_dot_product(qv, cv))
                     + list_dot_product(cv, cv) AS pdist
            FROM qsub q JOIN cb ON cb.sub = q.sub),
    scored AS (SELECT l.query_id, e.vec_id AS neighbor_id,
                      {oracle_exact_sum('pdist')} AS adist
               FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
               GROUP BY l.query_id, e.vec_id)
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank,
           ROUND(adist, 4) AS adist
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adist, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def ann_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance top-k (Jegou et al. 2011): queries score
    the ENCODED corpus via a broadcast (sub, code) → partial-distance
    lookup table — m lookups + adds per corpus vector, the original
    floats never shuffle. This is the memory-bound ANN scale path: at
    100 TB the encoded corpus is 32× smaller than the float rows and
    the scoring plan is broadcast-join + grouped exact-sum, both
    map-side-combining. Partial distances are snapped to 6 fixed
    decimals before summing so the 8-term total is order-independent
    and engine-exact."""
    from duckdb_distributed_execution_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_subvectors,
    )

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    cb_src = e.filter(F.col("vec_id") < _PQ_K)
    w = Window.orderBy("vec_id")
    cb_ranked = cb_src.select(
        (F.row_number().over(w) - 1).cast("int").alias("code"), "embedding"
    )
    cb = pq_subvectors(cb_ranked, "code", "embedding", _PQ_M, _PQ_DSUB).select(
        F.col("__id").alias("code"), "sub", F.col("sv").alias("cv")
    )
    corpus = e.filter(F.col("vec_id") >= _PQ_K)
    queries = e.filter(
        (F.col("vec_id") >= _PQ_K) & (F.col("vec_id") < _PQ_K + 5)
    )
    codes = pq_encode(corpus, cb, m=_PQ_M, dsub=_PQ_DSUB)
    out = pq_adc_topk(codes, queries, cb, m=_PQ_M, dsub=_PQ_DSUB, k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("adist", 4).alias("adist")
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination screen
# ---------------------------------------------------------------------------

_BLOOM_BITS = 16384   # filter size in bit positions
_BLOOM_WORD = 62      # usable bits per int64 word (DuckDB errors on 1<<63)


# Shared by contamination_bloom and its streaming twin
# (pipeline16.streaming_contamination_screen) — identical semantics,
# identical oracle.
_BLOOM_ORACLE = f"""
    WITH grams AS (SELECT doc_id, UNNEST({oracle_word_shingles('text', 3)}) AS g
                   FROM documents),
    bpos AS (SELECT DISTINCT p FROM (
        SELECT CAST('0x' || substr(md5(g), 1, 7) AS BIGINT) % {_BLOOM_BITS} AS p
        FROM grams WHERE doc_id % 50 = 0
        UNION ALL
        SELECT CAST('0x' || substr(md5(g), 8, 7) AS BIGINT) % {_BLOOM_BITS} AS p
        FROM grams WHERE doc_id % 50 = 0)),
    bloom AS (SELECT CAST(p // {_BLOOM_WORD} AS INTEGER) AS w,
                     bit_or(1::BIGINT << CAST(p % {_BLOOM_WORD} AS INTEGER)) AS bits
              FROM bpos GROUP BY 1),
    cand AS (SELECT doc_id, g,
                    CAST('0x' || substr(md5(g), 1, 7) AS BIGINT) % {_BLOOM_BITS} AS p1,
                    CAST('0x' || substr(md5(g), 8, 7) AS BIGINT) % {_BLOOM_BITS} AS p2
             FROM grams WHERE doc_id % 50 <> 0),
    hits AS (SELECT c.doc_id,
                    CASE WHEN (COALESCE(b1.bits, 0) &
                               (1::BIGINT << CAST(c.p1 % {_BLOOM_WORD} AS INTEGER))) <> 0
                          AND (COALESCE(b2.bits, 0) &
                               (1::BIGINT << CAST(c.p2 % {_BLOOM_WORD} AS INTEGER))) <> 0
                         THEN 1 ELSE 0 END AS hit
             FROM cand c
             LEFT JOIN bloom b1 ON b1.w = CAST(c.p1 // {_BLOOM_WORD} AS INTEGER)
             LEFT JOIN bloom b2 ON b2.w = CAST(c.p2 // {_BLOOM_WORD} AS INTEGER)),
    agg AS (SELECT doc_id, COUNT(*) AS n_grams,
                   CAST(SUM(hit) AS BIGINT) AS n_hits
            FROM hits GROUP BY doc_id)
    SELECT doc_id, n_grams, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_grams, 4) AS hit_rate
    FROM agg WHERE n_hits * 5 >= n_grams
    """


@register("contamination_bloom", oracle=_BLOOM_ORACLE)
def contamination_bloom(spark, sf_dir):
    """Bloom-filter decontamination: benchmark 3-grams (docs with
    doc_id % 50 = 0 stand in for the eval set) are folded into a
    16384-bit filter (2 md5-derived probes per gram, 62 usable bits
    per int64 word), and every candidate doc's grams are screened
    against it. Docs with ≥20% possibly-benchmark grams are flagged.

    This is the O(1)-memory screen in front of the exact join
    (`contamination_ngram_overlap`): at 100 TB the benchmark gram SET
    may not broadcast, but its Bloom bitmap always does (the filter is
    ~260 longs regardless of corpus size; size it by target FP rate,
    not data volume). The bitmap is built with a bit_or grouped
    aggregate — map-side combining, one tiny shuffle — and screening
    is two broadcast joins, so nothing quadratic anywhere. False
    positives are inherent (and deterministic: both engines compute
    identical probe positions); the exact join then rescreens only
    flagged docs."""
    d = load(spark, sf_dir, "documents")["documents"]
    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("g")
    )
    p1 = F.conv(F.substring(F.md5(F.col("g")), 1, 7), 16, 10).cast("long") % _BLOOM_BITS
    p2 = F.conv(F.substring(F.md5(F.col("g")), 8, 7), 16, 10).cast("long") % _BLOOM_BITS

    bench = grams.filter(F.col("doc_id") % 50 == 0)
    bpos = (
        bench.select(p1.alias("p"))
        .unionAll(bench.select(p2.alias("p")))
        .distinct()
    )
    bloom = (
        bpos.select(
            (F.col("p") / _BLOOM_WORD).cast("int").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_BLOOM_WORD} AS INT))"
            ).alias("bv"),
        )
        .groupBy("w")
        .agg(F.bit_or("bv").alias("bits"))
    )

    cand = grams.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", p1.alias("p1"), p2.alias("p2")
    )
    bv1 = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p1 % {_BLOOM_WORD} AS INT))")
    bv2 = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p2 % {_BLOOM_WORD} AS INT))")
    hits = (
        cand.join(
            F.broadcast(bloom.select(F.col("w").alias("w1"), F.col("bits").alias("bits1"))),
            F.col("w1") == (F.col("p1") / _BLOOM_WORD).cast("int"),
            "left",
        )
        .join(
            F.broadcast(bloom.select(F.col("w").alias("w2"), F.col("bits").alias("bits2"))),
            F.col("w2") == (F.col("p2") / _BLOOM_WORD).cast("int"),
            "left",
        )
        .select(
            "doc_id",
            F.when(
                (F.coalesce(F.col("bits1"), F.lit(0)).bitwiseAND(bv1) != 0)
                & (F.coalesce(F.col("bits2"), F.lit(0)).bitwiseAND(bv2) != 0),
                1,
            ).otherwise(0).alias("hit"),
        )
    )
    agg = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("hit").cast("long").alias("n_hits"),
    )
    return agg.filter(F.col("n_hits") * 5 >= F.col("n_grams")).select(
        "doc_id",
        "n_grams",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("n_grams"), 4).alias(
            "hit_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Exponential moving average (bounded-window EWMA)
# ---------------------------------------------------------------------------


@register(
    "window_ewma",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id,
             list(CAST(floor(value * 1000000.0 + 0.5) AS DOUBLE))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS l
      FROM events WHERE event_type = 'view')
    SELECT user_id, event_id,
           ROUND(
             list_reduce(list_transform(l, (x, i) ->
                           x * pow(0.5, CAST(len(l) - i AS DOUBLE))),
                         (a, b) -> a + b)
             / list_reduce(list_transform(l, (x, i) ->
                             pow(0.5, CAST(len(l) - i AS DOUBLE))),
                           (a, b) -> a + b)
             / 1000000.0, 6) AS ewma
    FROM o
    """,
)
def window_ewma(spark, sf_dir):
    """Per-user exponential moving average (α=0.5) over the trailing
    11 events — the recurrence s_i = α·x_i + (1−α)·s_{i−1} unrolled to
    its truncated weighted-sum form, normalized by the weight sum
    (pandas ``ewm(adjust=True)`` over a bounded window). One keyed
    window shuffle; the per-row fold is over ≤11 elements.

    Engine-exact by construction: values snap to integer micros
    first, and α=0.5 makes every weight a power of two, so each
    product and the ≤11-term sums are EXACT in binary doubles — no
    libm/fold-order drift for ROUND to paper over. (DuckDB's lambda
    index is 1-based, Spark's 0-based; the exponents ``len−i`` and
    ``size−1−i`` line up.)"""
    ev = load(spark, sf_dir, "events")["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, Window.currentRow)
    )
    with_list = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "event_id",
        F.collect_list(
            F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("double")
        ).over(w).alias("l"),
    )
    weight = lambda i: F.pow(  # noqa: E731
        F.lit(0.5), (F.size(F.col("l")) - 1 - i).cast("double")
    )
    num = F.aggregate(
        F.transform("l", lambda x, i: x * weight(i)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(
        F.transform("l", lambda x, i: weight(i)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return with_list.select(
        "user_id",
        "event_id",
        F.round(num / den / F.lit(1000000.0), 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# ORC sink + source
# ---------------------------------------------------------------------------


@register("orc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def orc_roundtrip(spark, sf_dir):
    """ORC sink + source — Spark's second columnar format, same
    lossless-cycle contract as csv_roundtrip/json_roundtrip: write
    orders to ORC, read back with an explicit schema, aggregate, and
    hash-match the parquet-derived oracle. ORC stripes are splittable
    and predicate-pushdown-capable like parquet row groups, so the
    read path distributes identically at scale."""
    o = load(spark, sf_dir, "orders")["orders"]
    out = os.path.join(
        tempfile.gettempdir(),
        f"dde_orc_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    ).write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "o_orderkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE"
    ).orc(out)
    return _roundtrip_agg(back)


# ---------------------------------------------------------------------------
# Domain-mixture rebalancing
# ---------------------------------------------------------------------------


@register(
    "mix_rebalance_sample",
    oracle=r"""
    WITH t AS (SELECT doc_id, lang,
                      CAST(len(regexp_split_to_array(TRIM(text), '\s+')) AS BIGINT) AS toks
               FROM documents),
    pl AS (SELECT lang, COUNT(*) AS total_docs, SUM(toks) AS lang_toks
           FROM t GROUP BY lang),
    m AS (SELECT MIN(lang_toks) AS min_toks FROM pl),
    r AS (SELECT pl.lang, pl.total_docs, pl.lang_toks,
                 least(1.0, CAST(min_toks AS DOUBLE) / lang_toks) AS rate
          FROM pl CROSS JOIN m),
    acc AS (SELECT t.lang, COUNT(*) AS sampled_docs,
                   SUM(t.toks) AS sampled_tokens
            FROM t JOIN r ON t.lang = r.lang
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|mix'), 1, 15) AS BIGINT)
                    % 1000000
                  < CAST(floor(rate * 1000000.0) AS BIGINT)
            GROUP BY t.lang)
    SELECT r.lang, r.total_docs, CAST(r.lang_toks AS BIGINT) AS total_tokens,
           CAST(COALESCE(acc.sampled_docs, 0) AS BIGINT) AS sampled_docs,
           CAST(COALESCE(acc.sampled_tokens, 0) AS BIGINT) AS sampled_tokens,
           ROUND(r.rate, 6) AS rate
    FROM r LEFT JOIN acc ON acc.lang = r.lang
    """,
)
def mix_rebalance_sample(spark, sf_dir):
    """Domain-mixture rebalancing — the training-data op of
    downsampling over-represented languages to the SMALLEST language's
    token budget: rate(lang) = min_lang_tokens / lang_tokens, applied
    as a deterministic hash-Bernoulli per document (same salt-keyed
    bucket as the sampling family, so reruns and retries admit the
    same docs). Reports per-lang totals, sampled counts, and the rate.

    Scale shape: one grouped aggregate for the budgets (tiny result →
    broadcast back), then a pure filter — the corpus itself never
    shuffles to be sampled, so this composes with any downstream op at
    100 TB. Swapping the min-budget target for an arbitrary mixture
    weight vector is a one-line change to `rate`."""
    from duckdb_distributed_execution_spark.operators.sampling import (
        sample_bucket,
    )
    from duckdb_distributed_execution_spark.operators.text import token_count

    d = load(spark, sf_dir, "documents")["documents"]
    t = d.select("doc_id", "lang", token_count(F.col("text")).alias("toks"))
    pl = t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("toks").alias("lang_toks"),
    )
    # Global min via an empty-frame window over the TINY per-lang
    # aggregate (a handful of rows) — no scalar cross-join, and the
    # fact table is never touched twice.
    r = pl.select(
        "lang",
        "total_docs",
        "lang_toks",
        F.least(
            F.lit(1.0),
            F.min("lang_toks").over(Window.partitionBy()).cast("double")
            / F.col("lang_toks"),
        ).alias("rate"),
    )
    acc = (
        t.join(F.broadcast(r.select("lang", "rate")), on="lang")
        .filter(
            sample_bucket(F.col("doc_id"), "mix")
            < F.floor(F.col("rate") * 1000000.0).cast("long")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.sum("toks").alias("sampled_tokens"),
        )
    )
    return r.join(acc, on="lang", how="left").select(
        "lang",
        "total_docs",
        F.col("lang_toks").cast("long").alias("total_tokens"),
        F.coalesce("sampled_docs", F.lit(0)).cast("long").alias("sampled_docs"),
        F.coalesce("sampled_tokens", F.lit(0)).cast("long").alias("sampled_tokens"),
        F.round("rate", 6).alias("rate"),
    )


# ---------------------------------------------------------------------------
# Boilerplate detection
# ---------------------------------------------------------------------------


@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH grams AS (
      SELECT DISTINCT doc_id, source, g FROM (
        SELECT doc_id, source, UNNEST({oracle_word_shingles('text', 4)}) AS g
        FROM documents)),
    nd AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs
           FROM documents GROUP BY source),
    df AS (SELECT source, g, COUNT(*) AS doc_freq
           FROM grams GROUP BY source, g),
    flagged AS (
      SELECT df.source, df.g, df.doc_freq, nd.n_docs,
             ROUND(CAST(df.doc_freq AS DOUBLE) / nd.n_docs, 4) AS df_ratio
      FROM df JOIN nd ON nd.source = df.source
      WHERE df.doc_freq * 5 >= nd.n_docs AND df.doc_freq >= 3)
    SELECT source, g, doc_freq, n_docs, df_ratio,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY doc_freq DESC, g) AS rn
          FROM flagged)
    WHERE rn <= 20
    """,
)
def boilerplate_ngrams(spark, sf_dir):
    """Boilerplate detection, C4/RefinedWeb-style: 4-gram shingles
    whose document frequency within a SOURCE exceeds 20% (and ≥3
    docs) are headers/footers/navigation chrome, not content — the
    per-source top-20 is the removal list a cleaning pass would
    subtract. Two grouped aggregates (distinct doc-gram explode →
    per-source doc-frequency), both map-side combining; the shuffle
    carries |distinct grams| not |token occurrences|, so the plan
    holds at corpus scale. The tiny per-source doc-count aggregate
    broadcasts into the ratio join."""
    d = load(spark, sf_dir, "documents")["documents"]
    # r9 (guide §2.4): the oracle's global DISTINCT over
    # (doc_id, source, g) is exactly PER-DOCUMENT dedup — doc_id is
    # unique per row — so array_distinct before the explode computes
    # it row-locally and the distinct exchange vanishes (2 shuffles
    # → 1; the remaining shuffle carries per-doc-distinct grams keyed
    # (source, g) only — measured 3.71 → 2.46 s at sf0.1
    # same-session; the doc-freq relation is row-identical on the
    # 253k-row sf0.1 corpus, exceptAll 0/0 both ways, and
    # test_boilerplate_ngrams_array_distinct_matches_global pins a
    # NON-empty output on a synthetic boilerplate corpus — the
    # testdata corpora produce empty results for this query, so the
    # oracle pass alone would be vacuous).
    grams = d.select(
        "source",
        F.explode(
            F.array_distinct(word_shingles(F.col("text"), 4))
        ).alias("g"),
    )
    nd = d.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    df = grams.groupBy("source", "g").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    flagged = (
        df.join(F.broadcast(nd), on="source")
        .filter(
            (F.col("doc_freq") * 5 >= F.col("n_docs"))
            & (F.col("doc_freq") >= 3)
        )
        .select(
            "source", "g", "doc_freq", "n_docs",
            F.round(
                F.col("doc_freq").cast("double") / F.col("n_docs"), 4
            ).alias("df_ratio"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("doc_freq").desc(), F.col("g")
    )
    return (
        flagged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )
