"""Byte-pair-encoding merge training as a relational program.

The BPE trainer (Sennrich et al. 2016) is the canonical tokenizer-
induction loop: count adjacent symbol pairs over a word-frequency
table, merge the most frequent pair everywhere, repeat. Libraries
implement it imperatively over Python dicts; at corpus scale the
state is a relation and every step is a keyed window/aggregate:

- state: one row per (word, position, symbol) — never an opaque
  array, so the merge step is window algebra instead of per-row
  string surgery;
- pair counts: lead() + grouped SUM(word_freq) — counts every
  adjacency, like the reference implementation's get_stats ("aaa"
  contributes ("a","a") twice);
- best pair: (count DESC, pair) order — deterministic tiebreak;
- merge: left-to-right non-overlapping, the subtle part. A run of
  consecutive candidate positions ("aaaa" merging ("a","a")) may
  only merge its 1st, 3rd, ... members. Runs are found with the
  gaps-and-islands trick (sequence index minus candidate rank),
  parity inside the island picks the merge sites, and a lag() drops
  the consumed right-hand rows.

Everything is expressible identically in DuckDB SQL, so
``oracle_bpe_sql`` generates the K-iteration unrolled-CTE mirror and
the whole training loop — not just one step — is hash-checked
cross-engine. Scale: state rows = Σ word lengths (bounded by the
vocabulary kept), every shuffle is keyed by word id; the per-
iteration reduction is the pair-count aggregate, exactly the shape
of the other mergeable-state operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.functions import persist_tracked
from duckdb_distributed_execution_spark.operators.text import (
    normalize_text,
    oracle_normalize,
    tokens,
)


def _merge_round(state: DataFrame, words: DataFrame, it: int):
    """One BPE iteration: returns (best_df[it, a, b, c], next_state)."""
    ws = Window.partitionBy("w").orderBy("p")
    pairs = state.withColumn("ns", F.lead("s").over(ws))
    cnt = (
        pairs.filter(F.col("ns").isNotNull())
        .join(words.select("w", "f"), "w")
        .groupBy("s", "ns")
        .agg(F.sum("f").alias("c"))
    )
    best = (
        cnt.orderBy(F.desc("c"), "s", "ns")
        .limit(1)
        .select(
            F.lit(it).alias("it"),
            F.col("s").alias("a"),
            F.col("ns").alias("b"),
            "c",
        )
    )
    cand = pairs.crossJoin(
        F.broadcast(best.select("a", "b"))
    ).withColumn(
        "is_cand",
        F.when(
            F.col("ns").isNotNull()
            & (F.col("s") == F.col("a"))
            & (F.col("ns") == F.col("b")),
            1,
        ).otherwise(0),
    )
    idx = cand.withColumn("idx", F.row_number().over(ws))
    isl = idx.withColumn(
        "island",
        F.when(
            F.col("is_cand") == 1,
            F.col("idx")
            - F.row_number().over(
                Window.partitionBy("w", "is_cand").orderBy("p")
            ),
        ),
    )
    mrg = isl.withColumn(
        "do_merge",
        F.when(
            (F.col("is_cand") == 1)
            & (
                F.row_number().over(
                    Window.partitionBy("w", "island").orderBy("p")
                )
                % 2
                == 1
            ),
            1,
        ).otherwise(0),
    )
    nxt = (
        mrg.withColumn("pm", F.lag("do_merge").over(ws))
        .filter(F.coalesce(F.col("pm"), F.lit(0)) == 0)
        .select(
            "w",
            "p",
            F.when(
                F.col("do_merge") == 1, F.concat(F.col("s"), F.col("ns"))
            )
            .otherwise(F.col("s"))
            .alias("s"),
        )
    )
    return best, nxt


def bpe_train_merges(
    df: DataFrame,
    text_col: str,
    iterations: int = 4,
    top_words: int = 60,
) -> DataFrame:
    """Learn the first ``iterations`` BPE merges from the corpus;
    returns (it, a, b, c) — merge rank, left/right symbol, weighted
    count. The state relation is persisted between rounds (it is
    |vocab|·avg-word-length rows, tiny next to the corpus) so the
    plan does not deepen across iterations."""
    tok = df.select(F.explode(tokens(normalize_text(text_col))).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("f"))
    words = (
        freq.orderBy(F.desc("f"), "t")
        .limit(top_words)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("f"), "t"))
            .alias("w"),
            F.col("t").alias("word"),
            "f",
        )
    )
    words = persist_tracked(words)
    state = words.select(
        "w",
        "word",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("p"),
    ).select("w", "p", F.expr("substr(word, p, 1)").alias("s"))
    bests = []
    for it in range(1, iterations + 1):
        state = persist_tracked(state)
        best, state = _merge_round(state, words, it)
        bests.append(best)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out


def oracle_bpe_sql(
    text_expr: str = "text",
    iterations: int = 4,
    top_words: int = 60,
) -> str:
    """DuckDB mirror of ``bpe_train_merges`` — the full K-iteration
    loop unrolled into CTEs (windows, islands, parity, lag — the
    identical algorithm, so the training trajectory itself is
    oracle-checked)."""
    toks = f"regexp_split_to_array({oracle_normalize(text_expr)}, '\\s+')"
    parts = [
        f"""
    tok AS (SELECT unnest({toks}) AS t FROM documents),
    freq AS (SELECT t, COUNT(*) AS f FROM tok GROUP BY t),
    words AS (
      SELECT row_number() OVER (ORDER BY f DESC, t) AS w, t AS word, f
      FROM freq ORDER BY f DESC, t LIMIT {top_words}),
    state1 AS (
      SELECT w, i AS p, substr(word, CAST(i AS INT), 1) AS s
      FROM (SELECT w, word,
                   unnest(range(1, CAST(length(word) AS BIGINT) + 1)) AS i
            FROM words))"""
    ]
    for k in range(1, iterations + 1):
        parts.append(f"""
    pairs{k} AS (
      SELECT w, p, s, lead(s) OVER (PARTITION BY w ORDER BY p) AS ns
      FROM state{k}),
    cnt{k} AS (
      SELECT pr.s, pr.ns, SUM(f) AS c
      FROM pairs{k} pr JOIN words USING (w)
      WHERE pr.ns IS NOT NULL GROUP BY pr.s, pr.ns),
    best{k} AS (
      SELECT {k} AS it, s AS a, ns AS b, c
      FROM cnt{k} ORDER BY c DESC, s, ns LIMIT 1),
    cand{k} AS (
      SELECT pr.w, pr.p, pr.s, pr.ns,
             CASE WHEN pr.ns IS NOT NULL AND pr.s = bt.a AND pr.ns = bt.b
                  THEN 1 ELSE 0 END AS is_cand
      FROM pairs{k} pr CROSS JOIN best{k} bt),
    idx{k} AS (
      SELECT *, row_number() OVER (PARTITION BY w ORDER BY p) AS idx
      FROM cand{k}),
    isl{k} AS (
      SELECT *, CASE WHEN is_cand = 1 THEN idx - row_number()
                     OVER (PARTITION BY w, is_cand ORDER BY p) END AS island
      FROM idx{k}),
    mrg{k} AS (
      SELECT *, CASE WHEN is_cand = 1 AND (row_number()
                     OVER (PARTITION BY w, island ORDER BY p) % 2) = 1
                     THEN 1 ELSE 0 END AS do_merge
      FROM isl{k}),
    state{k + 1} AS (
      SELECT w, p, CASE WHEN do_merge = 1 THEN s || ns ELSE s END AS s
      FROM (SELECT *, lag(do_merge) OVER (PARTITION BY w ORDER BY p) AS pm
            FROM mrg{k})
      WHERE COALESCE(pm, 0) = 0)""")
    union = "\n    UNION ALL\n".join(
        f"    SELECT it, a, b, c FROM best{k}"
        for k in range(1, iterations + 1)
    )
    return "WITH" + ",".join(parts) + "\n" + union


# ---------------------------------------------------------------------------
# BPE APPLICATION (the inference half: encode a corpus with a trained
# merge table). The trainer above learns merges; production pipelines
# apply a FIXED pretrained merge table to count tokens / cost a corpus
# (the reference has no tokenizer surface — north-star greenfield).
#
# Algorithm: Sennrich-ordered application — each merge (a, b) -> ab is
# applied to exhaustion, in rank order, with leftmost-non-overlapping
# scans. A word is carried as a separator-delimited token string
# ("|t|a|b|l|e|"); one merge pass is a single codegen'd
# replace('|a|b|', '|ab|') — a scan merges the leftmost occurrence and
# everything non-overlapping to its right, and because a match consumes
# its trailing separator, a pattern repeated back-to-back needs another
# pass; `passes` scans reach the scan fixpoint for adjacency runs up
# to 2^passes. Scan-to-fixpoint equals strict one-occurrence-at-a-time
# BPE everywhere EXCEPT inside a self-merge run of length >= 5 (merge
# (a,a) over 'aaaaa'): the scan's leftover singleton lands mid-run
# ([aa,a,aa]) where strict BPE leaves it last ([aa,aa,a]) — and a
# chained self-merge ((aa,aa)) can then see different adjacencies.
# This is exactly the semantics of str.replace-loop tokenizer
# implementations; natural-language merge tables don't self-merge, so
# real corpora encode identically (exact sequence equality on the
# whole corpus vocabulary, plus the divergence example itself, is
# pinned against a strict Python reference in tests/test_wave42.py).
# The whole encoder is a static
# chain of merges*passes built-in replace() calls — fully inside
# whole-stage codegen, zero Python in the hot path, and identical
# semantics in the DuckDB oracle (replace() is leftmost-non-overlapping
# in both engines).
# ---------------------------------------------------------------------------


def bpe_apply_expr(word_col, merges, passes: int = 3, sep: str = "|"):
    """Column: the BPE token string for a word — ``|t|a|ble|`` — after
    applying ``merges`` (rank-ordered (a, b) pairs) Sennrich-style.
    ``sep`` must not occur in the input words."""
    from pyspark.sql import Column

    c = word_col if isinstance(word_col, Column) else F.col(word_col)
    s = F.concat(F.lit(sep), F.regexp_replace(c, "(.)", "$1" + sep))
    for a, b in merges:
        pat = F.lit(sep + a + sep + b + sep)
        rep = F.lit(sep + a + b + sep)
        for _ in range(passes):
            s = F.replace(s, pat, rep)
    return s


def bpe_apply_py(merges, passes: int = 3, sep: str = "|"):
    """Python mirror of :func:`bpe_apply_expr` — a callable
    text → encoded string with BYTE-IDENTICAL semantics: the same
    per-char split regex ("(.)" excludes newlines in java.util.regex,
    RE2 and Python's re alike), the same rank-ordered literal
    replace-all chain (both String.replace and str.replace scan
    left-to-right over non-overlapping occurrences), the same pass
    count. Used by the fused Arrow MinHash kernel's token-shingle
    path (r9) so the Python side reproduces the JVM encoder exactly;
    tests pin kernel == JVM row equality on the real corpus."""
    import re

    char_split = re.compile("(.)")

    def apply(text: str) -> str:
        s = sep + char_split.sub("\\1" + sep, text)
        for a, b in merges:
            pat, rep = sep + a + sep + b + sep, sep + a + b + sep
            for _ in range(passes):
                s = s.replace(pat, rep)
        return s

    return apply


def bpe_token_count_expr(encoded_col, sep: str = "|"):
    """Token count of a ``bpe_apply_expr`` string: separator count − 1
    (the empty word encodes to a single separator → 0 tokens)."""
    from pyspark.sql import Column

    c = encoded_col if isinstance(encoded_col, Column) else F.col(encoded_col)
    return (
        F.length(c) - F.length(F.replace(c, F.lit(sep), F.lit(""))) - 1
    ).cast("long")


def oracle_bpe_apply(expr: str, merges, passes: int = 3, sep: str = "|") -> str:
    """DuckDB mirror of ``bpe_apply_expr`` (same scan semantics)."""
    s = f"'{sep}' || regexp_replace({expr}, '(.)', '\\1{sep}', 'g')"
    for a, b in merges:
        for _ in range(passes):
            s = f"replace({s}, '{sep}{a}{sep}{b}{sep}', '{sep}{a}{b}{sep}')"
    return s


def oracle_bpe_token_count(expr: str, sep: str = "|") -> str:
    """DuckDB mirror of ``bpe_token_count_expr`` over an encoded
    column reference (pass a column NAME, not the whole encoder
    expression — it is evaluated twice)."""
    return (
        f"CAST(length({expr}) - length(replace({expr}, '{sep}', '')) - 1"
        " AS BIGINT)"
    )
