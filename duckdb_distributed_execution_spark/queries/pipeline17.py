"""Seventeenth-wave operators — sketching, retrieval prep, and corpus
shape diagnostics: a relational HyperLogLog distinct sketch (the
mergeable-state cardinality estimator warehouses actually ship),
RAG chunking (overlapping token windows with content fingerprints),
a Zipf-law rank-frequency fit, cross-source vocabulary overlap, and
k-core decomposition of the user co-event graph.

North-star greenfield (the reference has no sketch/text/graph
surface — BASELINE.json). Cross-engine conventions as established in
pipeline15/16: every cross-row reduction is an exact integer
(register sums are scaled powers of two, vocab intersections are
counts); doubles appear only in per-row terms with an identical
expression tree on both engines; the irreducible float reductions in
the Zipf fit are left folds over rank-ordered lists — the
`chi_squared_independence` idiom.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.text import tokens
from duckdb_distributed_execution_spark.queries import load, register

# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch
# ---------------------------------------------------------------------------

_HLL_M = 64          # registers (b = 6 bits)
_HLL_W = 54          # payload bits after the register index (60 - 6)
# alpha_64 * m^2 * 2^(W+1): the numerator of the raw estimate, folded
# into ONE literal so both engines divide the same double by the same
# exact-integer register sum (0.709 * 4096 * 2^55).
_HLL_NUM = repr(0.709 * 4096.0 * 36028797018963968.0)


@register(
    "hll_distinct_sketch",
    oracle=f"""
    WITH h AS (
      SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM events),
    r AS (
      SELECT h % {_HLL_M} AS j,
             CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_W + 1}
                  ELSE {_HLL_W + 1} - length(bin(h // {_HLL_M}))
             END AS rank
      FROM h),
    regs AS (SELECT j, MAX(rank) AS mj FROM r GROUP BY j),
    s AS (
      SELECT COUNT(*) AS n_regs,
             SUM(CAST(power(2, {_HLL_W + 1} - mj) AS BIGINT)) AS s_pop
      FROM regs),
    est AS (
      SELECT {_HLL_M} - n_regs AS v_empty,
             {_HLL_NUM}
               / CAST(s_pop + ({_HLL_M} - n_regs)
                      * CAST(power(2, {_HLL_W + 1}) AS BIGINT)
                      AS DOUBLE) AS raw
      FROM s),
    x AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events)
    SELECT {_HLL_M} AS m,
           CAST(v_empty AS BIGINT) AS v_empty,
           ROUND(CASE WHEN v_empty > 0 AND raw <= {2.5 * _HLL_M}
                      THEN {_HLL_M}.0 * ln({_HLL_M}.0 / v_empty)
                      ELSE raw END, 4) AS estimate,
           exact_distinct
    FROM est, x
    """,
)
def hll_distinct_sketch(spark, sf_dir):
    """HyperLogLog cardinality sketch of distinct event users,
    computed RELATIONALLY so every piece is oracle-checkable: a 60-bit
    md5 hash splits into a 6-bit register index and a 54-bit payload
    whose leading-zero rank comes from the integer length of its
    binary string (no float log2 at power-of-two boundaries); the
    sketch state is one 64-row (register, max-rank) relation — a
    map-side-combinable MAX groupBy, which is the entire point at
    100 TB: the shuffle carries 64 rows per partition no matter the
    corpus size, and two sketches merge by element-wise MAX (the
    mergeability approx_count_distinct gives you opaquely, here as an
    inspectable relation). The register sum uses exact scaled powers
    of two (2^(55-Mj) as BIGINT — doubles represent powers of two
    exactly, the SUM is integer), so the only doubles are one
    division and the small-range linear-counting branch, identical
    expression trees both engines. Standard HLL small-range
    correction: V empty registers and raw ≤ 2.5m → m·ln(m/V).
    The exact distinct count rides along for the accuracy read
    (expected rel. error 1.04/√64 ≈ 13%)."""
    e = load(spark, sf_dir, "events")["events"]
    h = e.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    r = h.select(
        (F.col("h") % _HLL_M).alias("j"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, F.lit(_HLL_W + 1))
        .otherwise(
            F.lit(_HLL_W + 1) - F.length(F.bin(F.expr(f"h div {_HLL_M}")))
        )
        .alias("rank"),
    )
    regs = r.groupBy("j").agg(F.max("rank").alias("mj"))
    s = regs.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"CAST(power(2, {_HLL_W + 1} - mj) AS BIGINT)")
        ).alias("s_pop"),
    )
    est = s.select(
        (F.lit(_HLL_M) - F.col("n_regs")).alias("v_empty"),
        (
            F.lit(float(_HLL_NUM))
            / (
                F.col("s_pop")
                + (F.lit(_HLL_M) - F.col("n_regs"))
                * F.expr(f"CAST(power(2, {_HLL_W + 1}) AS BIGINT)")
            ).cast("double")
        ).alias("raw"),
    )
    x = e.agg(F.countDistinct("user_id").alias("exact_distinct"))
    # Tagged union + pivot agg instead of a 1-row × 1-row cross join
    # (plancheck bnlj hygiene — same pattern as minhash_lsh_selectivity).
    u = est.select(
        "v_empty", "raw", F.lit(None).cast("long").alias("exact_distinct")
    ).unionByName(
        x.select(
            F.lit(None).cast("long").alias("v_empty"),
            F.lit(None).cast("double").alias("raw"),
            "exact_distinct",
        )
    )
    merged = u.agg(
        F.max("v_empty").alias("v_empty"),
        F.max("raw").alias("raw"),
        F.max("exact_distinct").alias("exact_distinct"),
    )
    return merged.select(
        F.lit(_HLL_M).alias("m"),
        F.col("v_empty").cast("long").alias("v_empty"),
        F.round(
            F.when(
                (F.col("v_empty") > 0) & (F.col("raw") <= 2.5 * _HLL_M),
                float(_HLL_M) * F.log(float(_HLL_M) / F.col("v_empty")),
            ).otherwise(F.col("raw")),
            4,
        ).alias("estimate"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# RAG chunking: overlapping token windows
# ---------------------------------------------------------------------------

_CHUNK = 64   # tokens per chunk
_STRIDE = 48  # tokens between chunk starts (16-token overlap)


@register(
    "rag_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS tk
      FROM documents),
    n AS (
      SELECT doc_id, toks,
             1 + CASE WHEN tk > {_CHUNK}
                      THEN (tk - {_CHUNK + 1}) // {_STRIDE} + 1
                      ELSE 0 END AS n_chunks
      FROM t)
    SELECT n.doc_id,
           CAST(u.i AS INT) AS chunk_idx,
           CAST(len(list_slice(n.toks, u.i * {_STRIDE} + 1,
                               u.i * {_STRIDE} + {_CHUNK})) AS INT)
             AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(n.toks, u.i * {_STRIDE} + 1,
                            u.i * {_STRIDE} + {_CHUNK}), ' ')) AS chunk_md5
    FROM n, LATERAL UNNEST(range(0, n.n_chunks)) AS u(i)
    """,
)
def rag_chunk_overlap(spark, sf_dir):
    """RAG ingestion chunking: split each document into overlapping
    {64}-token windows on a {48}-token stride (16-token overlap keeps
    context across cuts — the standard retrieval-prep shape) and emit
    one row per chunk with its token count and an md5 content
    fingerprint (what the downstream embed step keys on, and what
    chunk-level dedup joins on). Chunk count is pure integer floor
    arithmetic on nonnegative operands — Spark `div` truncates toward
    zero while DuckDB `//` floors, so the formula is written to never
    go negative. The explode is sequence(0, n-1) per doc — narrow
    rows, no shuffle at all until a downstream op needs one; at
    100 TB chunking is embarrassingly parallel map work."""
    d = load(spark, sf_dir, "documents")["documents"]
    t = d.select(
        "doc_id",
        tokens("text").alias("toks"),
        F.size(tokens("text")).alias("tk"),
    )
    n = t.select(
        "doc_id",
        "toks",
        (
            F.lit(1)
            + F.when(
                F.col("tk") > _CHUNK,
                F.expr(f"(tk - {_CHUNK + 1}) div {_STRIDE}") + 1,
            ).otherwise(F.lit(0))
        ).alias("n_chunks"),
    )
    c = n.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("i"),
    )
    sl = F.slice(F.col("toks"), F.col("i") * _STRIDE + 1, _CHUNK)
    return c.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        F.size(sl).cast("int").alias("n_chunk_tokens"),
        F.md5(F.array_join(sl, " ")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------------

_ZIPF_TOPN = 100


@register(
    "zipf_alpha_fit",
    oracle=f"""
    WITH cnt AS (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents),
    freq AS (SELECT tok, COUNT(*) AS c FROM cnt GROUP BY tok),
    top AS (
      SELECT tok, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank
      FROM freq
      ORDER BY c DESC, tok LIMIT {_ZIPF_TOPN}),
    pts AS (
      SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y,
             ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE)) AS xy,
             ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)) AS xx
      FROM top),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             list_reduce(list(x ORDER BY rank), (a, b) -> a + b) AS sx,
             list_reduce(list(y ORDER BY rank), (a, b) -> a + b) AS sy,
             list_reduce(list(xy ORDER BY rank), (a, b) -> a + b) AS sxy,
             list_reduce(list(xx ORDER BY rank), (a, b) -> a + b) AS sxx
      FROM pts)
    SELECT CAST(n AS BIGINT) AS n_ranks,
           ROUND(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6) AS alpha,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept
    FROM sums
    """,
)
def zipf_alpha_fit(spark, sf_dir):
    """Zipf-law exponent of the corpus token distribution: closed-form
    OLS slope of ln(frequency) on ln(rank) over the top-{100} tokens
    (natural corpora sit near alpha ≈ 1; a synthetic or
    template-heavy corpus shows a flat head — a cheap fingerprint of
    corpus naturalness used when vetting pretraining mixes). The
    vocabulary histogram is one partial-agg'd shuffle; the top-k is a
    distributed TakeOrdered (count DESC, token tie-break — never a
    global sort of the vocab); ln() terms are per-row doubles with
    identical trees, and the four OLS sums are left folds over
    rank-ordered lists so IEEE addition order matches DuckDB's
    list_reduce exactly."""
    d = load(spark, sf_dir, "documents")["documents"]
    freq = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        freq.orderBy(F.desc("c"), F.asc("tok"))
        .limit(_ZIPF_TOPN)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("c"), F.asc("tok"))),
        )
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c").cast("double"))
    pts = top.select(
        "rank",
        x.alias("x"),
        y.alias("y"),
        (x * y).alias("xy"),
        (x * x).alias("xx"),
    )

    def _fold(field):
        lst = F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("rank"), F.col(field).alias("val")))
            ),
            lambda s: s["val"],
        )
        return F.aggregate(lst, F.lit(0.0), lambda a, e: a + e)

    sums = pts.agg(
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
        F.col("n").cast("long").alias("n_ranks"),
        F.round(-slope, 6).alias("alpha"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# Cross-source vocabulary overlap
# ---------------------------------------------------------------------------


@register(
    "source_vocab_overlap",
    oracle="""
    WITH v AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    sz AS (SELECT source, COUNT(*) AS vocab FROM v GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2)
    SELECT i.src_a, i.src_b,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b, i.n_common,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (sa.vocab + sb.vocab - i.n_common), 6) AS jaccard,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / least(sa.vocab, sb.vocab), 6) AS containment
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    """,
)
def source_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary overlap between data sources — the mixture
    diagnostic run before setting domain weights (two sources with
    containment ≈ 1 are near-redundant; disjoint vocabularies signal
    domain shift). The distinct (source, token) relation is one
    shuffle; the pair join is keyed on the token, so each token
    contributes at most |sources|² rows (a constant), keeping the
    join LINEAR in vocabulary size — never a corpus self-join. Sizes
    broadcast back onto the |sources|² output rows."""
    d = load(spark, sf_dir, "documents")["documents"]
    v = d.select(
        "source", F.explode(tokens("text")).alias("tok")
    ).distinct()
    sz = v.groupBy("source").agg(F.count(F.lit(1)).alias("vocab"))
    a = v.select(F.col("source").alias("src_a"), "tok")
    b = v.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, on="tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(
            F.broadcast(sz.select(F.col("source").alias("src_a"),
                                  F.col("vocab").alias("vocab_a"))),
            on="src_a",
        )
        .join(
            F.broadcast(sz.select(F.col("source").alias("src_b"),
                                  F.col("vocab").alias("vocab_b"))),
            on="src_b",
        )
    )
    return out.select(
        "src_a",
        "src_b",
        "vocab_a",
        "vocab_b",
        "n_common",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")),
            6,
        ).alias("jaccard"),
        F.round(
            F.col("n_common").cast("double")
            / F.least("vocab_a", "vocab_b"),
            6,
        ).alias("containment"),
    )


# ---------------------------------------------------------------------------
# k-core of the user co-event graph
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 8
_KCORE_BUCKET_US = 600_000_000  # 10-minute co-presence buckets

# und is AS MATERIALIZED: the peel rounds reference it 2× each and
# DuckDB would otherwise inline (recompute) the co-occurrence
# self-join at every reference — 17 evaluations for 8 rounds.
_KCORE_UND_CTE = f"""WITH ev AS MATERIALIZED (
      SELECT DISTINCT event_type AS et,
             epoch_us(ts) // {_KCORE_BUCKET_US} AS b,
             user_id AS u
      FROM events),
    e AS MATERIALIZED (
      SELECT DISTINCT a.u AS ua, b.u AS ub
      FROM ev a JOIN ev b ON a.et = b.et AND a.b = b.b AND a.u < b.u),
    und AS MATERIALIZED (SELECT ua AS u, ub AS v FROM e
            UNION ALL SELECT ub, ua FROM e)"""


def _kcore_oracle() -> str:
    from duckdb_distributed_execution_spark.operators.graph import (
        oracle_kcore_sql,
    )

    return oracle_kcore_sql(_KCORE_UND_CTE, _KCORE_K, _KCORE_ROUNDS)


@register("graph_kcore_users", oracle=_kcore_oracle())
def graph_kcore_users(spark, sf_dir):
    """3-core of the user co-presence graph (users who emitted the
    same event type in the same 10-minute bucket are linked): the
    dense sub-community that survives 8 rounds of degree-<3 peeling,
    with each survivor's within-core degree — the standard
    graph-cleaning step before community detection, and a bot-ring /
    power-user screen in behavioral data. Co-occurrence pairs are
    keyed on (event_type, bucket), so pair volume is bounded by the
    per-bucket co-presence width, never |users|²; each peel round is
    two semi-joins + one count (operators/graph.py::kcore). Rounds
    are fixed and mirrored in the unrolled-CTE oracle, so the
    relation is engine-identical even pre-convergence."""
    e = load(spark, sf_dir, "events")["events"]
    ev = e.select(
        F.col("event_type").alias("et"),
        F.expr(f"unix_micros(ts) div {_KCORE_BUCKET_US}").alias("b"),
        F.col("user_id").alias("u"),
    ).distinct()
    a = ev.select("et", "b", F.col("u").alias("ua"))
    bb = ev.select("et", "b", F.col("u").alias("ub"))
    pairs = (
        a.join(bb, on=["et", "b"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    und = pairs.select(
        F.col("ua").alias("u"), F.col("ub").alias("v")
    ).unionAll(pairs.select(F.col("ub").alias("u"), F.col("ua").alias("v")))
    from duckdb_distributed_execution_spark.operators.graph import kcore

    out = kcore(und, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return out.select(F.col("u").alias("user_id"), "core_degree")
