"""Training-data pipeline operators, third wave: corpus-wide
paragraph-level exact dedup (the CCNet-style "drop duplicated
paragraphs everywhere" pass), Johnson-Lindenstrauss random projection
of embeddings (dimensionality reduction before ANN), and a
deterministic output-shard manifest (the bookkeeping step before a
sharded training-data write).

All greenfield vs the reference (north-star scope in BASELINE.json).
Scale stance: paragraph dedup shuffles once on the chunk hash and
once on doc_id (both key-partitioned, no all-pairs anywhere); the
projection is a pure per-row expression (no shuffle, no Python, the
±1 sign matrix is baked into the plan as literals); the manifest is
one grouped aggregation on a 16-value key.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import (
    exact_avg_rounded,
    oracle_exact_avg_rounded,
)
from duckdb_distributed_execution_spark.operators.text import (
    lang_id,
    normalize_text,
    oracle_lang_id,
    oracle_normalize,
    oracle_quality_score,
    quality_score,
    tokens,
)
from duckdb_distributed_execution_spark.queries import load, register

_CHUNK_WORDS = 20


@register(
    "dedup_paragraph_exact",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    chunks AS (
      SELECT doc_id,
             UNNEST(range(0, GREATEST(CAST(ceil(len(w) / {_CHUNK_WORDS}.0) AS BIGINT), 1)))
               AS chunk_idx,
             w
      FROM toks),
    hashed AS (
      SELECT doc_id, chunk_idx,
             md5(array_to_string(
                 w[chunk_idx * {_CHUNK_WORDS} + 1 : chunk_idx * {_CHUNK_WORDS} + {_CHUNK_WORDS}],
                 ' ')) AS h
      FROM chunks),
    ranked AS (
      SELECT doc_id, chunk_idx,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
      FROM hashed)
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_chunks
    FROM ranked
    GROUP BY doc_id
    """,
)
def dedup_paragraph_exact(spark, sf_dir):
    """Corpus-wide paragraph-level exact dedup (CCNet-style): split
    every document into fixed 20-word chunks (the testdata corpus has
    no newline paragraph marks, so the chunk boundary is the
    deterministic stand-in), hash each chunk, and keep only the first
    occurrence of each chunk corpus-wide (first = lowest (doc_id,
    chunk_idx)). Reports per-document survival counts.

    Scale shape: explode is narrow; the keep-first decision is a
    window over the chunk-hash partition (one key-partitioned
    shuffle — never a self-join); the per-doc rollup is a second
    keyed shuffle. Both keys are high-cardinality, so no hot
    partitions at 100 TB.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.col("text"), " ", -1)
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(_CHUNK_WORDS)).cast("bigint"), F.lit(1)
    )
    chunks = d.select(
        "doc_id",
        toks.alias("w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    hashed = chunks.select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("w"),
                    (F.col("chunk_idx") * _CHUNK_WORDS + 1).cast("int"),
                    _CHUNK_WORDS,
                ),
                " ",
            )
        ).alias("h"),
    )
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("kept_chunks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("dropped_chunks"),
    )


_PROJ_IN_DIM = 64
_PROJ_OUT_DIM = 8


def _jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5 — computed once in Python and baked
    into BOTH engines' expressions as literals, so there is nothing to
    keep in sync at runtime."""
    return 1 if int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def _jl_oracle_expr(j: int) -> str:
    terms = []
    for i in range(_PROJ_IN_DIM):
        op = "+" if _jl_sign(i, j) > 0 else "-"
        terms.append((op, f"CAST(embedding[{i + 1}] AS DOUBLE)"))
    first_op, first = terms[0]
    expr = first if first_op == "+" else f"(0.0 - {first})"
    for op, t in terms[1:]:
        expr = f"({expr} {op} {t})"
    return f"ROUND({expr}, 4)"


@register(
    "embedding_random_projection",
    oracle="SELECT vec_id, "
    + ", ".join(f"{_jl_oracle_expr(j)} AS p{j}" for j in range(_PROJ_OUT_DIM))
    + " FROM embeddings",
)
def embedding_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64 → 8 dims with a
    deterministic ±1 sign matrix (Achlioptas-style sparse JL): the
    dimensionality-reduction step before ANN indexing or clustering at
    corpus scale. The sign matrix is derived from md5 in Python at
    plan-build time and embedded as add/subtract chains, so the whole
    projection is a shuffle-free, Python-free, whole-stage-codegen
    per-row expression — identical left-to-right IEEE evaluation order
    on both engines, rounded to 4 decimals.
    """
    e = load(spark, sf_dir, "embeddings")["embeddings"]

    # The add/subtract chain ships as ONE SQL string per output column
    # (r9 expression-twin discipline): the Column-by-Column build was
    # 8 × 64 = 512 py4j round trips ≈ 3 s of plan construction per
    # call at ANY scale, vs 0.3 s of execution at sf0.01. SQL +/- is
    # left-associative exactly like the Python reduce, so the parsed
    # tree — and the IEEE evaluation order — is identical; the 0.0D
    # suffix keeps the leading negation DOUBLE (a bare 0.0 parses as
    # DECIMAL and would retype the chain).
    def proj_sql(j: int) -> str:
        terms = [
            (_jl_sign(i, j), f"CAST(element_at(embedding, {i + 1}) AS DOUBLE)")
            for i in range(_PROJ_IN_DIM)
        ]
        sign0, t0 = terms[0]
        expr = t0 if sign0 > 0 else f"(0.0D - {t0})"
        for sg, t in terms[1:]:
            expr += f" {'+' if sg > 0 else '-'} {t}"
        return f"ROUND({expr}, 4) AS p{j}"

    return e.selectExpr(
        "vec_id", *[proj_sql(j) for j in range(_PROJ_OUT_DIM)]
    )


_N_SHARDS = 16


@register(
    "train_shard_manifest",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
             ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
               - CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) >= 97
                      THEN 87 ELSE 48 END
               AS shard
      FROM documents)
    SELECT shard,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM assigned
    GROUP BY shard
    """,
)
def train_shard_manifest(spark, sf_dir):
    """Deterministic output-shard manifest: every document is assigned
    to one of 16 shards by an md5-derived hash of its id (stable across
    engines, runs, and partitionings — NOT Spark's internal hash), and
    the manifest reports per-shard document counts, byte totals and
    language spread. This is the bookkeeping step before a sharded
    training-data write (the write itself is repartition(shard) +
    partitionBy, exercised by the COPY TO export operator). One grouped
    aggregation with map-side partials; the shard key is uniform by
    construction, so no skew at any scale.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    a = F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
    # Hex-digit value of the first md5 char: uniform over 0..15.
    shard = a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))
    return (
        d.select("doc_id", "lang", "n_chars", shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


_FUNNEL_REASON = f"""CASE WHEN n_chars < 120 THEN 'too_short'
         WHEN {oracle_quality_score('text')} < 0.70 THEN 'low_quality'
         WHEN {oracle_lang_id('text')} <> 'en' THEN 'non_english'
         ELSE 'keep' END"""


@register(
    "filter_funnel_report",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, n_chars, {_FUNNEL_REASON} AS reason,
             {oracle_quality_score('text')} AS quality
      FROM documents)
    SELECT reason,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
           {oracle_exact_avg_rounded('quality')} AS avg_quality
    FROM tagged
    GROUP BY reason
    """,
)
def filter_funnel_report(spark, sf_dir):
    """Corpus-cleaning funnel accounting: every document is tagged
    with the FIRST filter rule it trips — length floor, quality-score
    floor, predicted-language gate, in that order — and the report
    gives per-reason document counts, byte mass, and mean quality.
    This is the observability step every large-scale filtering
    pipeline runs before committing a rule set: it shows what each
    rule would discard. One narrow projection (all rules are per-row
    expressions shared with text_quality / text_lang_id) plus one
    4-key grouped aggregation — nothing here changes shape at 100 TB.
    """
    d = load(spark, sf_dir, "documents")["documents"]
    reason = (
        F.when(F.col("n_chars") < 120, F.lit("too_short"))
        .when(quality_score("text") < 0.70, F.lit("low_quality"))
        .when(lang_id("text") != "en", F.lit("non_english"))
        .otherwise(F.lit("keep"))
    )
    tagged = d.select(
        "doc_id",
        "n_chars",
        reason.alias("reason"),
        quality_score("text").alias("quality"),
    )
    return tagged.groupBy("reason").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        exact_avg_rounded("quality").alias("avg_quality"),
    )


@register(
    "streaming_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark, sf_dir):
    """Structured Streaming, oracle-checked: the watermarked
    tumbling-window plan from streaming/windowed_event_counts runs as
    a REAL stream over the events parquet (file source,
    ``availableNow`` trigger, complete-mode memory sink) and the
    drained sink table is returned — so the streaming execution path
    itself, not a batch stand-in, is verified against the DuckDB
    GROUP BY time_bucket oracle. ``availableNow`` processes the full
    backlog then terminates, which makes the run deterministic: no
    window is dropped (the watermark only ever advances between
    triggers) and complete mode emits every window. The same code
    with a live source and append mode is the production shape —
    bounded state via watermark eviction is proven separately in
    tests/test_streaming.py.
    """
    from duckdb_distributed_execution_spark.streaming import (
        read_events_stream,
        run_to_memory,
        windowed_event_counts,
    )

    stream = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = windowed_event_counts(stream, window="5 minutes", watermark="10 minutes")
    run_to_memory(agg, "streaming_tumbling_counts_sink", mode="complete")
    return spark.table("streaming_tumbling_counts_sink")


@register(
    "streaming_session_counts",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def streaming_session_counts(spark, sf_dir):
    """Structured Streaming session windows, oracle-checked: the
    keyed ``session_window`` plan from streaming/
    sessionized_event_counts runs as a real availableNow stream
    (complete-mode memory sink: session windows reject update mode,
    and complete emits every merged session's final state) and is
    compared against the DuckDB gaps-and-islands session oracle. Boundary semantics follow Spark's half-open
    session window: an event exactly ``gap`` after the previous one
    starts a NEW session, hence ``>=`` in the oracle's break
    condition, and session_end = last event + gap. State at
    production scale is bounded by the watermark (eviction proven in
    tests/test_streaming.py); the grouping key (user_id) partitions
    the state store, so session merging never funnels through one
    task.
    """
    from duckdb_distributed_execution_spark.streaming import (
        read_events_stream,
        run_to_memory,
        sessionized_event_counts,
    )

    stream = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = sessionized_event_counts(stream, gap="30 minutes", watermark="1 hour")
    run_to_memory(agg, "streaming_session_counts_sink", mode="complete")
    return spark.table("streaming_session_counts_sink").select(
        "session_start", "session_end", "user_id", "n_events"
    )


# One Engine per SparkSession for the DML query — the temp warehouse
# lives for the process (repeated harness calls drop/recreate the
# table, they don't leak directories).
_DML_ENGINES: dict[int, object] = {}


@register(
    "dml_lifecycle_state",
    oracle="""
    WITH base AS (
      SELECT n_nationkey, n_name, n_regionkey
      FROM nation WHERE n_regionkey < 3),
    after_delete AS (
      SELECT * FROM base WHERE NOT (n_nationkey % 3 = 0)),
    src AS (
      SELECT n_nationkey, upper(n_name) AS n_name,
             n_regionkey + 100 AS n_regionkey
      FROM nation WHERE n_regionkey IN (2, 3)),
    merged AS (
      SELECT * FROM after_delete
      WHERE n_nationkey NOT IN (SELECT n_nationkey FROM src)
      UNION ALL
      SELECT * FROM src)
    SELECT n_nationkey,
           CASE WHEN n_regionkey >= 100 THEN n_name || '!' ELSE n_name END
             AS n_name,
           n_regionkey
    FROM merged
    """,
)
def dml_lifecycle_state(spark, sf_dir):
    """The DML surface on the driver-checked path (previously
    pytest-only): CREATE TABLE → columnar INSERT (A3) → true-predicate
    DELETE (A4 — the reference rewrites the predicate as first-column
    IN, hazard #5; here the real predicate runs) → MERGE upsert
    (anti-join + union, the Delta MERGE plan) → conditional UPDATE,
    all through the Engine facade, returning the final table state.
    The oracle replays the same lifecycle as pure SQL over the source
    table. Copy-on-write rewrites land in a process-lifetime temp
    warehouse; every step is a distributed DataFrame plan (no VALUES
    strings, no row-at-a-time)."""
    from duckdb_distributed_execution_spark import Engine

    eng = _DML_ENGINES.get(id(spark))
    if eng is None:
        eng = Engine(spark)
        _DML_ENGINES[id(spark)] = eng
    nat = load(spark, sf_dir, "nation")["nation"]
    name = "dml_lifecycle_t"
    if eng.table_exists(name):
        eng.drop_table(name)
    eng.create_table(
        name, "n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT"
    )
    eng.insert_into(
        name,
        nat.filter(F.col("n_regionkey") < 3).select(
            "n_nationkey", "n_name", "n_regionkey"
        ),
    )
    eng.delete_from(name, "n_nationkey % 3 = 0")
    src = nat.filter(F.col("n_regionkey").isin(2, 3)).select(
        "n_nationkey",
        F.upper("n_name").alias("n_name"),
        (F.col("n_regionkey") + 100).alias("n_regionkey"),
    )
    eng.merge_upsert(name, src, on=["n_nationkey"])
    eng.update_table(name, {"n_name": "n_name || '!'"}, "n_regionkey >= 100")
    return eng.table(name)


# GPT-2-style pretokenizer regex, simplified to the corpus alphabet:
# optional-apostrophe letter runs, 1-3 digit runs, single punctuation.
# Same pattern string runs under Java regex (Spark) and RE2 (DuckDB).
_BPE_PAT = "'?[a-z]+|[0-9]{1,3}|[^a-z0-9 ]"
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")


@register(
    "text_bpe_token_stats",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len(regexp_split_to_array(trim(text), ' +')) AS ws_toks,
             regexp_extract_all(lower(text), '{_BPE_PAT_SQL}') AS bpe
      FROM documents),
    p AS (
      SELECT lang, ws_toks,
             len(bpe) AS bpe_toks,
             list_reduce(
               list_transform(
                 bpe, x -> CAST(floor((length(x) + 3) / 4) AS BIGINT)),
               (a, b) -> a + b) AS subword_est
      FROM t)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(ws_toks) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(bpe_toks) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(subword_est) AS BIGINT) AS total_subword_est,
           ROUND(CAST(SUM(bpe_toks) AS DOUBLE) / CAST(SUM(ws_toks) AS DOUBLE), 6)
             AS bpe_per_ws
    FROM p
    GROUP BY lang
    """,
)
def text_bpe_token_stats(spark, sf_dir):
    """Token counting with a BPE-ish pretokenizer regex (GPT-2-style
    pattern: apostrophe-letter runs, short digit runs, punctuation)
    alongside the whitespace count, plus a subword estimate
    (ceil(len/4) per pretoken — the classic chars-per-token prior).
    All integer arithmetic in-row (order-independent sums; the one
    double division happens once per group), same regex under Java
    regex and RE2. This is the cost-estimation pass before a real
    tokenizer run: corpus token budgets per language from one scan."""
    d = load(spark, sf_dir, "documents")["documents"]
    ws = F.size(F.split(F.trim(F.col("text")), " +", -1))
    bpe = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PAT), F.lit(0))
    sub = F.aggregate(
        bpe,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.floor((F.length(x) + F.lit(3)) / F.lit(4)).cast("bigint"),
    )
    p = d.select(
        "lang",
        ws.alias("ws_toks"),
        F.size(bpe).alias("bpe_toks"),
        sub.alias("subword_est"),
    )
    return p.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_toks").cast("bigint").alias("total_ws_tokens"),
        F.sum("bpe_toks").cast("bigint").alias("total_bpe_tokens"),
        F.sum("subword_est").cast("bigint").alias("total_subword_est"),
        F.round(
            F.sum("bpe_toks").cast("double") / F.sum("ws_toks").cast("double"), 6
        ).alias("bpe_per_ws"),
    )


_ENT_TOKS = f"regexp_split_to_array({oracle_normalize('text')}, '\\s+')"


@register(
    "text_token_entropy",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_ENT_TOKS} AS toks FROM documents
      WHERE doc_id % 7 = 0)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           ROUND(0.0 + list_reduce(
             list_transform(
               list_sort(list_distinct(toks)),
               w -> -(CAST(len(list_filter(toks, x -> x = w)) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE))
                    * ln(CAST(len(list_filter(toks, x -> x = w)) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE))),
             (a, b) -> a + b), 6) AS entropy
    FROM t
    """,
)
def text_token_entropy(spark, sf_dir):
    """Shannon entropy (nats) of each document's token distribution —
    the information-density heuristic behind repetition filters
    (low-entropy = template/boilerplate text). Computed entirely
    in-row: distinct tokens are sorted so the floating-point fold
    order is a property of the DATA, not the partitioning — both
    engines sum -(p·ln p) over the same sequence left-to-right (the
    leading 0.0 term normalizes DuckDB's init-free list_reduce,
    including the -0.0 single-token edge). No shuffle at any scale;
    per-row cost is O(distinct² ) on ~100-token documents."""
    d = load(spark, sf_dir, "documents")["documents"]
    toks = tokens(normalize_text("text"))
    n = F.size(toks).cast("double")

    def term(w):
        c = F.size(F.filter(toks, lambda x: x == w)).cast("double")
        return (F.lit(0.0) - (c / n)) * F.log(c / n)

    entropy = F.aggregate(
        F.array_sort(F.array_distinct(toks)),
        F.lit(0.0),
        lambda acc, w: acc + term(w),
    )
    return d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.round(entropy, 6).alias("entropy"),
    )
