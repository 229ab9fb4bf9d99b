"""Text analysis for training-data pipelines (north-star greenfield;
no counterpart in the reference — BASELINE.json mandate).

Everything is built-in-function column algebra (regexp, split,
aggregate over arrays) so the hot path stays in whole-stage codegen —
no Python UDFs. Each helper has an exact SQL mirror used by the
DuckDB oracles (``oracle_*`` functions), which doubles as the
documentation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately small, deterministic English stopword list (shared
# literal with the oracle SQL).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

_WS = r"\s+"
_NON_ALNUM = r"[^a-z0-9 ]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), _WS)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def tokens_exploded_arrow(df, id_col: str = "doc_id",
                          text_col: str = "text",
                          term_col: str = "term"):
    """The exploded (id, term) token relation — semantically IDENTICAL
    to ``df.select(id, explode(tokens(normalize_text(text))))`` but
    computed with Arrow compute kernels (RE2) in one mapInPandas pass
    instead of java.util.regex inside codegen. Measured at organic
    sf1: the JVM regex chain was ~2 s of bm25_retrieval_topk's 3.75 s
    wall; the Arrow pass cuts the tokenize stage ~3×.

    Parity argument (why RE2-vs-Java regex dialects cannot diverge):
    the first replacement maps every char outside [a-z0-9 ] to a
    space, so by the time the whitespace-collapse and split run, the
    string contains only [a-z0-9 ] — the ``\\s`` dialect difference
    (Java includes \\x0B, RE2 does not) is unreachable. Lowercasing
    goes through Python ``str.lower()`` (full Unicode case mapping,
    matching the JVM's — Arrow's utf8_lower uses SIMPLE mapping and
    visibly diverges on expanding lowercases like 'İ' → 'i̇', which
    contributes an extra 'i' token on the JVM path; pinned by
    tests/test_arrow_text.py). Null texts drop their row (explode
    semantics); empty/whitespace-only texts yield one empty term
    (split("") → [""]), matching both the JVM form and the DuckDB
    oracle's string_split."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    dt = dict(df.dtypes)

    def run(batches):
        for pdf in batches:
            pdf = pdf[pdf[text_col].notna()]
            if not len(pdf):
                continue
            x = pa.array(pdf[text_col].str.lower(), type=pa.string())
            x = pc.replace_substring_regex(x, "[^a-z0-9 ]", " ")
            x = pc.replace_substring_regex(x, " +", " ")
            x = pc.utf8_trim(x, " ")
            toks = pc.split_pattern(x, " ")
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ids = np.repeat(pdf[id_col].values, lens)
            yield pd.DataFrame(
                {id_col: ids, term_col: pc.list_flatten(toks).to_pandas()}
            )

    return ensure_min_parallelism(
        df.select(id_col, text_col)
    ).mapInPandas(run, schema=f"{id_col} {dt[id_col]}, {term_col} string")


def grouped_token_counts_arrow(df, group_col: str,
                               text_col: str = "text",
                               term_col: str = "term"):
    """PARTIAL (group, term, cnt) token counts, one Arrow pass —
    tokenize (same RE2 chain + parity argument as
    tokens_exploded_arrow) AND per-batch hash aggregation fused, so
    what crosses the Arrow→JVM boundary and the shuffle is the
    per-batch VOCABULARY (distinct (group, term) pairs), not the raw
    token stream (~200 tokens/doc). This is map-side combine done
    where it's cheapest: the token explosion never materializes
    outside the Arrow batch. Callers finish with
    ``groupBy(group, term).sum(cnt)`` — exact counts, order-free.

    r9 surgery for tokens_per_lang_topk (the r8 verdict's second
    compute-real >2× at sf0.1): the JVM plan exploded the full token
    stream into the partial agg. Measured warm, same session, 32
    threads: sf1 2.13 s → 0.78 s (2.7×); sf0.1 parity (0.63 vs
    0.69 s — both plans sit on Spark's ~0.5 s per-query stage floor
    there, which is the remaining sf0.1 gap vs DuckDB's 0.15 s)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    dt = dict(df.dtypes)

    def run(batches):
        for pdf in batches:
            pdf = pdf[pdf[text_col].notna()]
            if not len(pdf):
                continue
            x = pa.array(pdf[text_col].str.lower(), type=pa.string())
            x = pc.replace_substring_regex(x, "[^a-z0-9 ]", " ")
            x = pc.replace_substring_regex(x, " +", " ")
            x = pc.utf8_trim(x, " ")
            toks = pc.split_pattern(x, " ")
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            grp = np.repeat(pdf[group_col].values, lens)
            agg = pa.table(
                {group_col: pa.array(grp), term_col: pc.list_flatten(toks)}
            ).group_by([group_col, term_col]).aggregate([([], "count_all")])
            out = agg.to_pandas()
            out.columns = [group_col, term_col, "cnt"]
            yield out

    return ensure_min_parallelism(
        df.select(group_col, text_col)
    ).mapInPandas(
        run, schema=f"{group_col} {dt[group_col]}, {term_col} string, "
                    "cnt long",
    )


def term_counts_arrow(df, id_col: str, text_col: str, terms,
                      doclen_col: str | None = None,
                      term_col: str = "term", tf_col: str = "tf"):
    """Per-document occurrence counts of a FIXED driver-side term set
    (the retrieval queries' 6 constant terms), one Arrow pass — the
    same RE2 tokenize chain + parity argument as
    tokens_exploded_arrow, with the term filter and the per-doc count
    pushed INSIDE the kernel (guide §2.3: filter/aggregate before the
    boundary). The old shape exploded the full token stream (~130
    rows/doc) across the Arrow→JVM boundary, semi-joined it down to
    the query terms and paid a (doc, term) exchange; this emits ≤
    |terms| rows per doc and needs NO finishing aggregate (each doc is
    one input row, so its counts complete within one batch).

    Emits ``(id, term, tf)`` rows for each term present in a doc;
    with ``doclen_col`` additionally one ``(id, dl, NULL, NULL)`` row
    per non-null-text doc carrying the doc's total token count (BM25's
    length normalizer — including the single empty token an
    empty/whitespace-only text yields, exactly like the exploded
    form). Null texts contribute nothing (explode semantics).

    Measured (r10, warm, same session, local[32]): the rag/bm25
    lexical leg at sf1 drops from ~0.98 s (explode + semi-join +
    postings exchange) to ~0.5 s, and the localCheckpoint the
    consumers pin shrinks from the full postings relation to
    O(|docs|) narrow rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    dt = dict(df.dtypes)
    terms = list(terms)
    n_terms = len(terms)
    terms_np = np.asarray(terms, dtype=object)

    def run(batches):
        tarr = pa.array(terms, type=pa.string())
        for pdf in batches:
            pdf = pdf[pdf[text_col].notna()]
            if not len(pdf):
                continue
            x = pa.array(pdf[text_col].str.lower(), type=pa.string())
            x = pc.replace_substring_regex(x, "[^a-z0-9 ]", " ")
            x = pc.replace_substring_regex(x, " +", " ")
            x = pc.utf8_trim(x, " ")
            toks = pc.split_pattern(x, " ")
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            codes = pc.fill_null(
                pc.index_in(pc.list_flatten(toks), value_set=tarr), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            rows = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            sel = codes >= 0
            cnt = np.bincount(
                rows[sel] * n_terms + codes[sel],
                minlength=len(pdf) * n_terms,
            )
            nz = np.flatnonzero(cnt)
            ids = pdf[id_col].values
            tf_part = pd.DataFrame(
                {
                    id_col: ids[nz // n_terms],
                    term_col: terms_np[nz % n_terms],
                    tf_col: cnt[nz].astype(np.int64),
                }
            )
            if doclen_col is None:
                yield tf_part
                continue
            tf_part[doclen_col] = None
            dl_part = pd.DataFrame(
                {
                    id_col: ids,
                    term_col: None,
                    tf_col: None,
                    doclen_col: lens,
                }
            )
            yield pd.concat([dl_part, tf_part], ignore_index=True)[
                [id_col, doclen_col, term_col, tf_col]
            ]

    schema = (
        f"{id_col} {dt[id_col]}, {term_col} string, {tf_col} long"
        if doclen_col is None
        else f"{id_col} {dt[id_col]}, {doclen_col} long, "
             f"{term_col} string, {tf_col} long"
    )
    return ensure_min_parallelism(df.select(id_col, text_col)).mapInPandas(
        run, schema=schema
    )


def normalize_text(col: Column | str) -> Column:
    """lower → strip non-alphanumerics → collapse whitespace → trim.
    The canonical form used by fingerprints and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), _NON_ALNUM, " "), _WS, " "))


def oracle_normalize(expr: str) -> str:
    return (
        f"TRIM(regexp_replace(regexp_replace(LOWER({expr}), "
        f"'{_NON_ALNUM}', ' ', 'g'), '{_WS}', ' ', 'g'))"
    )


# --- Spark-SQL twin strings -------------------------------------------------
# Single-parse forms of the Column builders above, for hot query
# constructors: round-9 profiling measured Python-side plan building at
# ~25% of the sf0.1 bench wall, nearly all py4j socket latency — the
# quality/stopword Column chains alone are ~150 round trips. Each twin
# returns SQL TEXT building the IDENTICAL expression tree through the
# JVM parser (one round trip via F.expr). Literal conventions: \\s+
# escapes to \s+ in Spark's default string-literal mode; D-suffixed
# doubles keep arithmetic in DOUBLE exactly like F.lit(float).
# Equivalence is pinned in tests/test_arrow_text.py.

def spark_normalize_sql(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), "
        f"'[^a-z0-9 ]', ' '), '\\\\s+', ' '))"
    )


def spark_tokens_sql(expr: str) -> str:
    return f"split(trim({expr}), '\\\\s+')"


def _spark_stopword_array_sql() -> str:
    return "array(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


def spark_stopword_count_sql(expr: str) -> str:
    toks = spark_tokens_sql(spark_normalize_sql(expr))
    return (
        f"CAST(size(filter({toks}, "
        f"t -> array_contains({_spark_stopword_array_sql()}, t))) AS BIGINT)"
    )


def spark_quality_score_sql(expr: str) -> str:
    toks = spark_tokens_sql(spark_normalize_sql(expr))
    n = f"CAST(size({toks}) AS DOUBLE)"
    uniq = f"CAST(size(array_distinct({toks})) AS DOUBLE)"
    swc = f"CAST({spark_stopword_count_sql(expr)} AS DOUBLE)"
    return (
        f"0.4D * least(1.0D, {n} / 64.0D) + 0.3D * ({uniq} / {n}) "
        f"+ 0.3D * (1.0D - {swc} / {n})"
    )


def hashed_logit(col: Column | str) -> Column:
    """Hashed-feature linear score: every normalized token is a
    feature whose integer milli-weight derives deterministically from
    its md5 ((hash % 2001) - 1000 ∈ [-1000, 1000]); the document
    logit is the exact BIGINT sum — order-independent on any engine,
    no float accumulation. Stand-in for trained fastText-style
    weights; swap a broadcast weight map in and nothing else changes."""
    toks = tokens(normalize_text(col))
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + (F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long") % 2001)
        - 1000,
    )


def oracle_hashed_logit(expr: str) -> str:
    return (
        f"CAST(list_sum(list_transform("
        f"string_split({oracle_normalize(expr)}, ' '), "
        f"t -> (CAST('0x' || substr(md5(t), 1, 7) AS BIGINT) % 2001) - 1000"
        f")) AS BIGINT)"
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text. (A content
    hash over a canonical form — the batch analog of a rolling hash;
    stable across whitespace/punctuation/case noise.)"""
    return F.md5(normalize_text(col))


def oracle_fingerprint(expr: str) -> str:
    return f"md5({oracle_normalize(expr)})"


def fingerprint_kv_arrow(df, id_col: str = "doc_id",
                         text_col: str = "text"):
    """(id, dedup_key) via ONE Arrow-batched normalize+md5 pass —
    byte-identical to ``fingerprint`` (same regex chain through Arrow
    RE2 kernels + Python full-case lower; the JVM-equivalence argument
    is doc_features_arrow's, whose fp column is this exact kernel).
    The corpus-scale fast path for exact dedup: Java's interpreted
    regex replace chain dominates the JVM form's wall once documents
    are beyond toy scale (measured at organic sf1: 2.17 → 1.15 s),
    while below that the Python-worker fixed cost dominates — callers
    gate on input bytes (see queries/llm.py::dedup_exact)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    dt = dict(df.dtypes)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mask = pdf[text_col].notna()
            x = pa.array(pdf[text_col][mask].str.lower(), type=pa.string())
            x = pc.replace_substring_regex(x, "[^a-z0-9 ]", " ")
            x = pc.replace_substring_regex(x, " +", " ")
            x = pc.utf8_trim(x, " ")
            fp = [
                hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in x.to_pylist()
            ]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "dedup_key": pd.Series([None] * len(pdf), dtype=object),
                }
            )
            out.loc[mask.values, "dedup_key"] = fp
            yield out

    return ensure_min_parallelism(df.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} {dt[id_col]}, dedup_key string"
    )


def stopword_count(col: Column | str) -> Column:
    toks = tokens(normalize_text(col))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("long")


def oracle_stopword_count(expr: str) -> str:
    sw = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return (
        f"CAST(len(list_filter(regexp_split_to_array({oracle_normalize(expr)}, '{_WS}'), "
        f"t -> list_contains({sw}, t))) AS BIGINT)"
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.4·min(1, n_tokens/64) + 0.3·distinct-token ratio +
    0.3·(1 − stopword ratio). Pure double arithmetic with a fixed
    operation order — identical across engines."""
    toks = tokens(normalize_text(col))
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    sw = stopword_count(col).cast("double")
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(64.0))
        + F.lit(0.3) * (uniq / n)
        + F.lit(0.3) * (F.lit(1.0) - sw / n)
    )


def oracle_quality_score(expr: str) -> str:
    norm = oracle_normalize(expr)
    toks = f"regexp_split_to_array({norm}, '{_WS}')"
    sw = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    n = f"CAST(len({toks}) AS DOUBLE)"
    uniq = f"CAST(len(list_distinct({toks})) AS DOUBLE)"
    swc = f"CAST(len(list_filter({toks}, t -> list_contains({sw}, t))) AS DOUBLE)"
    return (
        f"(0.4 * least(1.0, {n} / 64.0) + 0.3 * ({uniq} / {n}) "
        f"+ 0.3 * (1.0 - {swc} / {n}))"
    )


def doc_features_arrow(df, id_col: str = "doc_id",
                       text_col: str = "text",
                       carry_cols: tuple[str, ...] = (),
                       emit_stopwords: bool = False):
    """One Arrow-batched pass computing the three per-doc features the
    ingest funnel consumes — ``quality`` (= quality_score), ``fp``
    (= fingerprint) and ``n_words`` (= size(split(text, ' '))) — with
    byte-identical results to the JVM column expressions:

    - normalization runs the same regex chain via Arrow kernels (the
      RE2-vs-Java dialect difference is unreachable — see
      tokens_exploded_arrow's parity argument);
    - quality is the same double arithmetic in the same operation
      order (IEEE-identical in numpy);
    - fp is md5 over the same normalized bytes (hashlib hexdigest ==
      Spark md5);
    - a NULL text yields NULL features (Spark null propagation).

    Why: the JVM form evaluates normalize_text ~4× and tokenize ~3×
    per row (quality_score and stopword_count each re-derive them)
    and the stopword filter is an interpreted higher-order function —
    measured at organic sf1 this single fused pass replaces ~6 s of
    the ingest funnel's base-stage wall (ADVICE-class hot path; the
    oracle-facing semantics are pinned by the funnel's own oracle and
    by test_operators' JVM-vs-Arrow equivalence test)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    sw = frozenset(STOPWORDS)
    dt = dict(df.dtypes)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mask = pdf[text_col].notna().values
            arr = pa.array(pdf[text_col][mask], type=pa.string())
            # Python str.lower == JVM full case mapping (see
            # tokens_exploded_arrow — Arrow's utf8_lower is the
            # SIMPLE mapping and diverges on 'İ' etc.)
            x = pa.array(
                pdf[text_col][mask].str.lower(), type=pa.string()
            )
            x = pc.replace_substring_regex(x, "[^a-z0-9 ]", " ")
            x = pc.replace_substring_regex(x, " +", " ")
            x = pc.utf8_trim(x, " ")
            toks = pc.split_pattern(x, " ")
            n = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            uniq = np.empty(len(n))
            swc = np.empty(len(n))
            for i, lst in enumerate(toks.to_pylist()):
                uniq[i] = len(set(lst))
                swc[i] = sum(1 for t in lst if t in sw)
            q = (
                0.4 * np.minimum(1.0, n / 64.0)
                + 0.3 * (uniq / n)
                + 0.3 * (1.0 - swc / n)
            )
            fp = [
                hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in x.to_pylist()
            ]
            nw = pc.count_substring(arr, " ").to_numpy(
                zero_copy_only=False
            ).astype(np.int64) + 1
            out = {id_col: pdf[id_col].values}
            for c in carry_cols:
                out[c] = pdf[c].values
            # object-dtype with None in the null slots → Arrow emits
            # SQL NULLs (a float NaN would survive as NaN, which is
            # not what Spark's null propagation produces)
            quality = np.full(len(pdf), None, dtype=object)
            quality[mask] = q
            fpcol = np.full(len(pdf), None, dtype=object)
            fpcol[mask] = fp
            nwords = np.full(len(pdf), None, dtype=object)
            nwords[mask] = nw
            out["quality"] = quality
            out["fp"] = fpcol
            out["n_words"] = nwords
            if emit_stopwords:
                # Same swc the quality term consumed, surfaced as the
                # JVM stopword_count's bigint (null on null text).
                swl = np.full(len(pdf), None, dtype=object)
                swl[mask] = swc.astype(np.int64)
                out["n_stopwords"] = swl
            yield pd.DataFrame(out)

    carry = "".join(f", {c} {dt[c]}" for c in carry_cols)
    sw_field = ", n_stopwords long" if emit_stopwords else ""
    return ensure_min_parallelism(
        df.select(id_col, *carry_cols, text_col)
    ).mapInPandas(
        run,
        schema=(
            f"{id_col} {dt[id_col]}{carry}, "
            f"quality double, fp string, n_words long{sw_field}"
        ),
    )


def lang_id(col: Column | str) -> Column:
    """N-gram/stopword language heuristic: English if the stopword
    ratio clears a threshold, else bucketed by mean token length
    (CJK-like scripts → short 'tokens' after normalization)."""
    toks = tokens(normalize_text(col))
    n = F.size(toks).cast("double")
    sw_ratio = stopword_count(col).cast("double") / n
    mean_len = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")) / n
    )
    return (
        F.when(sw_ratio >= 0.08, F.lit("en"))
        .when(mean_len < 3.5, F.lit("cjk-like"))
        .otherwise(F.lit("other"))
    )


def oracle_lang_id(expr: str) -> str:
    norm = oracle_normalize(expr)
    toks = f"regexp_split_to_array({norm}, '{_WS}')"
    sw = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    n = f"CAST(len({toks}) AS DOUBLE)"
    swr = f"(CAST(len(list_filter({toks}, t -> list_contains({sw}, t))) AS DOUBLE) / {n})"
    mean_len = (
        f"(list_reduce(list_transform({toks}, t -> CAST(length(t) AS DOUBLE)), "
        f"(a, b) -> a + b) / {n})"
    )
    return (
        f"CASE WHEN {swr} >= 0.08 THEN 'en' "
        f"WHEN {mean_len} < 3.5 THEN 'cjk-like' ELSE 'other' END"
    )


# Broadcast budget for the per-bigram logprob relation. An explicit
# F.broadcast bypasses autoBroadcastJoinThreshold entirely, so the gate
# must bound BYTES, not rows (VERDICT r8 What's-wrong #2: 10M rows of
# (string a, string b, long) is 300 MB-1 GB on-heap at wide-token
# vocabularies — an OOM on a default-sized real-cluster executor). 64 MB
# sits in Spark's own broadcast sanity range (8x the 8 MB default
# autoBroadcast threshold, well under executor overheads).
_LM_BROADCAST_MAX_BYTES = 64 << 20


def _lm_logprob_broadcastable(cnt) -> bool:
    """Estimate the broadcastable footprint of the distinct-bigram
    logprob relation from the PINNED count relation (one cheap agg —
    cnt is localCheckpointed, so this re-reads the pin, not the
    corpus): UTF-8 payload bytes of both tokens plus ~48 bytes/row of
    UnsafeRow structure (two 8-byte offset+size words, the 8-byte
    quantized logprob, null bitmap + padding). Returns True only when
    the estimate fits _LM_BROADCAST_MAX_BYTES; above it the caller
    keeps the shuffle join — the right 100 TB shape when the
    distinct-bigram relation itself is corpus-sized."""
    from pyspark.sql import functions as F

    est = cnt.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.octet_length("a") + F.coalesce(F.octet_length("b"), F.lit(0))
        ).alias("chars"),
    ).collect()[0]
    rows = int(est["rows"] or 0)
    est_bytes = int(est["chars"] or 0) + 48 * rows
    return est_bytes <= _LM_BROADCAST_MAX_BYTES


def bigram_ppl_scores(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
):
    """Per-document interpolated bigram-LM scores — (id, n_bigrams,
    avg_nll, ppl) — trained on the corpus itself (CCNet-style quality
    signal; the oracle mirror lives in queries/pipeline42.py).
    Documents with <2 whitespace tokens have no bigrams and emit NO
    row (ADVICE r5 — documented, mirrored by the oracle twins). Plan
    notes there: slice-zip bigrams (no window), vocabulary-bounded
    unigram broadcasts, AQE-planned bigram-count join, per-bigram
    logprobs quantized to scaled longs so sums are order-free."""
    from pyspark.sql import functions as F

    scale = 1000000000.0
    ws = df.select(F.col(id_col).alias("__id"),
                   F.split(text_col, " ").alias("w"))
    # The tokenize/explode/partial-agg stages inherit the SCAN's
    # partitioning; a single-row-group parquet file maps to 1-2 tasks
    # and serializes the corpus-heavy LM counting on 2 of N cores
    # (measured r6: the sf1 ingest funnel spent most of its 20 s
    # here). ensure_min_parallelism restores N-way compute; no-op on
    # well-partitioned inputs.
    from duckdb_distributed_execution_spark.functions import (
        ensure_min_parallelism,
    )

    ws = ensure_min_parallelism(ws)
    # r8 funnel surgery, part 1 — ONE counting pass instead of two.
    # The corpus used to be tokenized+exploded once for unigram counts
    # and again for bigram counts (each re-pays scan+split: measured
    # ~1.4 s and ~1.2 s at organic sf1, the r7 uni localCheckpoint
    # pinned the result but not the second pass). Emitting
    # (token, next-or-NULL) per POSITION folds both into one explode +
    # one grouped shuffle: c(a) = Σ_b c(a,b) where NULL b marks "a was
    # a document's last token", so the unigram relation derives from
    # the pinned grouped result (distinct-bigrams + vocab rows —
    # bounded) instead of a second corpus pass. try_element_at is the
    # ANSI-safe out-of-bounds → NULL next-token probe.
    cnt = (
        ws.select(
            F.expr(
                "explode(transform(w, (x, i) -> "
                "struct(x AS a, try_element_at(w, i + 2) AS b)))"
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .localCheckpoint()
    )
    uni = cnt.groupBy("a").agg(F.sum("cab").alias("cu")).withColumnRenamed(
        "a", "t"
    )
    tot = uni.agg(F.sum("cu").alias("n"))
    bgc = cnt.filter(F.col("b").isNotNull())
    bg = (
        ws.filter(F.size("w") >= 2)
        .select(
            "__id",
            F.expr(
                "explode(transform(slice(w, 2, size(w) - 1),"
                " (b, i) -> struct(w[i] AS a, b AS b)))"
            ).alias("p"),
        )
        .select("__id", "p.a", "p.b")
    )
    # r8 funnel surgery, part 2 — the scoring join used to shuffle the
    # FULL corpus bigram stream on its (a,b) string key — the single
    # largest exchange in the LM subtree. The per-bigram logprob
    # relation lp is DISTINCT-bigram-bounded (≪ the stream for
    # natural text, vocab²-capped), so when the pinned count relation
    # is broadcastable, ship lp to the stream side instead of
    # shuffling the stream to lp — the kmeans-centroid / IVF-LUT
    # pattern (the corpus never crosses an exchange it doesn't need).
    # Above the gate the plan falls back to the shuffle join, which is
    # the right 100 TB shape when the distinct-bigram relation itself
    # is corpus-sized. The quantized integer results are identical on
    # both paths (same lpq per (a,b)).
    ua = F.broadcast(uni.select(F.col("t").alias("a"), F.col("cu").alias("ca")))
    ub = F.broadcast(uni.select(F.col("t").alias("b"), F.col("cu").alias("cb")))
    p = F.lit(lam) * (
        F.col("cab").cast("double") / F.col("ca").cast("double")
    ) + F.lit(1.0 - lam) * (
        F.col("cb").cast("double") / F.col("n").cast("double")
    )
    lp = (
        bgc.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.round(F.log(p) * F.lit(scale)).cast("long").alias("lpq"),
        )
    )
    if _lm_logprob_broadcastable(cnt):  # cnt is pinned — the probe is free
        lp = F.broadcast(lp)
    scored = bg.join(lp, ["a", "b"]).select("__id", "lpq")
    nll = -(F.sum("lpq") / F.lit(scale)) / F.count(F.lit(1))
    return scored.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(nll, 4).alias("avg_nll"),
        F.round(F.exp(nll), 3).alias("ppl"),
    ).withColumnRenamed("__id", id_col)
