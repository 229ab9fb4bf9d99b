"""Unit tests for the sixth-wave operators: skyline frontier vs a
brute-force check, triangle counting on a hand-built graph, count-min
overestimate property, positional pairing, and the nearest-direction
as-of contract — all on small constructed inputs with known answers.
(Engine-vs-DuckDB parity for the same operators is covered by
tools/selfcheck.py / the driver gate; these pin the algorithms.)
"""

from __future__ import annotations

import itertools

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.asof import asof_join
from duckdb_distributed_execution_spark.operators.rowid import (
    assign_stable_row_ids,
)


def _skyline_frontier(df, part_cols):
    # Mirror of queries/pipeline6.skyline_pareto's window pass.
    base = Window.partitionBy(*part_cols).orderBy(F.col("x").asc())
    a = F.max("y").over(base.rangeBetween(1, Window.unboundedFollowing))
    b = F.max("y").over(base.rangeBetween(0, Window.unboundedFollowing))
    dominated = (a.isNotNull() & (a >= F.col("y"))) | (b > F.col("y"))
    return df.withColumn("__dom", dominated).filter(~F.col("__dom")).drop("__dom")


def test_skyline_window_pass_matches_bruteforce(spark):
    pts = [(1, 9), (2, 8), (3, 7), (3, 9), (5, 5), (5, 5), (4, 6), (9, 1),
           (0, 10), (9, 1), (2, 2), (7, 7)]
    distinct = sorted(set(pts))
    brute = {
        p for p in distinct
        if not any(
            q[0] >= p[0] and q[1] >= p[1] and q != p for q in distinct
        )
    }
    df = spark.createDataFrame(distinct, "x LONG, y LONG")
    # single-pass (one partition) and bucketed two-pass must agree
    single = _skyline_frontier(df.withColumn("__p", F.lit(0)), ["__p"]).drop("__p")
    got_single = {(r.x, r.y) for r in single.collect()}
    assert got_single == brute

    bucketed = df.withColumn("__b", F.pmod(F.col("x") + F.col("y"), F.lit(3)))
    local = _skyline_frontier(bucketed, ["__b"]).drop("__b")
    merged = _skyline_frontier(local.withColumn("__p", F.lit(0)), ["__p"]).drop("__p")
    got = {(r.x, r.y) for r in merged.collect()}
    assert got == brute


def test_skyline_duplicate_points_survive_together(spark):
    # Two identical maximal points: neither strictly dominates the
    # other, so the (deduplicated) point stays on the frontier.
    df = spark.createDataFrame([(5, 5), (1, 1)], "x LONG, y LONG").distinct()
    out = _skyline_frontier(df.withColumn("__p", F.lit(0)), ["__p"]).drop("__p")
    assert {(r.x, r.y) for r in out.collect()} == {(5, 5)}


def _count_triangles(spark, edge_pairs):
    edges = spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in edge_pairs if a != b}),
        "a LONG, b LONG",
    )
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        edges.join(da, "a").join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    wedges = oriented.join(
        oriented.select(F.col("src").alias("dst"), F.col("dst").alias("w")),
        on="dst",
    )
    closing = oriented.select("src", F.col("dst").alias("w"))
    return (
        wedges.join(closing, on=["src", "w"], how="left_semi").count()
    )


def test_triangle_count_known_graphs(spark):
    # K4 has C(4,3)=4 triangles; counted once each (no /6 correction).
    k4 = list(itertools.combinations(range(4), 2))
    assert _count_triangles(spark, k4) == 4
    # Two triangles sharing an edge: 1-2-3 and 2-3-4.
    g = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]
    assert _count_triangles(spark, g) == 2
    # A path has none.
    assert _count_triangles(spark, [(1, 2), (2, 3), (3, 4)]) == 0


def test_cms_never_underestimates(spark):
    # The MIN-over-hash-rows estimate is >= the exact count for EVERY
    # key, not just heavy ones — collisions only add.
    from duckdb_distributed_execution_spark.queries.pipeline6 import (
        _CMS_W, _h,
    )
    items = spark.range(2000).select((F.col("id") % 37).alias("k"))
    js = F.array(*[F.lit(j) for j in range(4)])
    salt = F.concat(F.lit("cms"), F.col("j").cast("string"))
    ex = items.select("k", F.explode(js).alias("j"))
    sketch = (
        ex.withColumn("bucket", _h(F.col("k"), salt, _CMS_W))
        .groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = items.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probe = exact.select("k", "exact_cnt", F.explode(js).alias("j")).withColumn(
        "bucket", _h(F.col("k"), salt, _CMS_W)
    )
    est = (
        probe.join(sketch, on=["j", "bucket"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    rows = est.collect()
    assert len(rows) == 37
    assert all(r.est >= r.exact_cnt for r in rows)


def test_positional_pairing_via_stable_ids(spark):
    left = spark.createDataFrame([(k,) for k in [30, 10, 20, 40]], "k LONG")
    right = spark.createDataFrame(
        [("d", 4), ("b", 2), ("a", 1), ("c", 3)], "s STRING, r LONG"
    )
    a = assign_stable_row_ids(left, ["k"], id_col="pos")
    b = assign_stable_row_ids(right, ["r"], id_col="pos")
    got = {(r.pos, r.k, r.s) for r in a.join(b, "pos").collect()}
    assert got == {(0, 10, "a"), (1, 20, "b"), (2, 30, "c"), (3, 40, "d")}


def test_asof_nearest_prefers_smaller_gap_and_backward_ties(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 999)],
        "event_id LONG, user_id STRING, ts LONG",
    )
    right = spark.createDataFrame(
        [(11, "u", 90), (12, "u", 210), (13, "u", 300)],
        "pid LONG, user_id STRING, pts LONG",
    )
    b = asof_join(left, right, on="user_id", left_ts="ts", right_ts="pts",
                  right_cols=["pid"], direction="backward").select(
        "event_id", F.col("pid").alias("bpid"),
        (F.col("ts") - F.col("asof_pts")).alias("bgap"))
    f = asof_join(left, right, on="user_id", left_ts="ts", right_ts="pts",
                  right_cols=["pid"], direction="forward").select(
        F.col("event_id").alias("eid2"), F.col("pid").alias("fpid"),
        (F.col("asof_pts") - F.col("ts")).alias("fgap"))
    j = b.join(f, b.event_id == f.eid2)
    pick_b = F.col("fpid").isNull() | (
        F.col("bpid").isNotNull() & (F.col("bgap") <= F.col("fgap")))
    out = {
        r.event_id: r.m
        for r in j.select(
            "event_id",
            F.when(pick_b, F.col("bpid")).otherwise(F.col("fpid")).alias("m"),
        ).collect()
    }
    assert out[1] == 11   # gap 10 back vs 110 fwd
    assert out[2] == 12   # gap 15 back(90@205? no: 205-90=115) vs 5 fwd
    assert out[3] == 13   # nothing forward; backward 300


def test_bm25_topk_is_query_scoped(spark):
    from duckdb_distributed_execution_spark.queries.pipeline6 import (
        bm25_retrieval_topk,
    )
    out = bm25_retrieval_topk(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {"q1", "q2", "q3"}
    for q, rows in by_q.items():
        assert [r.rk for r in sorted(rows, key=lambda r: r.rk)] == [1, 2, 3, 4, 5]
        scores = [r.score for r in sorted(rows, key=lambda r: r.rk)]
        assert scores == sorted(scores, reverse=True)


def test_setsim_prefix_join_matches_bruteforce(spark):
    """Prefix filtering must lose NOTHING: exact equality with the
    brute-force all-pairs Jaccard on a corpus with knowable overlaps
    (and on a threshold low enough that prefixes barely prune)."""
    from itertools import combinations

    from duckdb_distributed_execution_spark.operators.dedup import (
        setsim_prefix_join, word_shingles, jaccard,
    )
    from pyspark.sql import functions as F

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different sentence with other words"),
        (4, "the quick brown fox leaps over the lazy dog"),
        (5, "a completely different sentence with other phrasing"),
        (6, "quick brown fox jumps over lazy dog"),
        (7, "unrelated text entirely about spark and shuffles"),
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    for t in (0.2, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 4)
            for r in setsim_prefix_join(
                df, "doc_id", "text", shingle_n=2, threshold=t
            ).collect()
        }
        sh = {
            r.doc_id: set(r.s)
            for r in df.select(
                "doc_id", word_shingles(F.col("text"), 2).alias("s")
            ).collect()
        }
        want = {}
        for a, b in combinations(sorted(sh), 2):
            inter = len(sh[a] & sh[b])
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= t:
                want[(a, b)] = round(j, 4)
        assert got == want, f"threshold {t}: {got} != {want}"


def test_bpe_merges_classic_corpus(spark):
    """BPE on the classic toy distribution: with words weighted by
    frequency the merge sequence is fully determined; also pins the
    left-to-right non-overlap rule on runs ('aaaa' merges twice, not
    three times)."""
    from duckdb_distributed_execution_spark.operators.bpe import (
        bpe_train_merges,
    )

    # corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3  (the
    # Sennrich example distribution, expressed as repeated text)
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(" ".join(words),)], "text STRING")
    out = {r.it: (r.a, r.b, r.c) for r in
           bpe_train_merges(df, "text", iterations=4, top_words=10).collect()}
    # es(9) -> est(9) -> lo(7) -> low(7)  (classic trajectory; ties
    # broken lexicographically)
    assert out[1] == ("e", "s", 9)
    assert out[2] == ("es", "t", 9)
    assert out[3] == ("l", "o", 7)
    assert out[4] == ("lo", "w", 7)

    # run-merge parity: 'aaaa' x3 -> ('a','a') counted 3x per word;
    # first merge produces 'aa','aa' (two merges, not three)
    df2 = spark.createDataFrame([("aaaa aaaa aaaa",)], "text STRING")
    out2 = {r.it: (r.a, r.b, r.c) for r in
            bpe_train_merges(df2, "text", iterations=2, top_words=5).collect()}
    assert out2[1] == ("a", "a", 9)      # 3 adjacencies x 3 words
    assert out2[2] == ("aa", "aa", 3)    # after the non-overlap merge


def test_bfs_distances_handcrafted(spark):
    """Chain with a shortcut and a cycle: 0-1-2-3 plus 0-3 edge and an
    unreachable node pair 8-9. Distances must take the shortcut and
    ignore the cycle; unreachable nodes are absent."""
    from pyspark.sql import functions as F

    from duckdb_distributed_execution_spark.operators.graph import bfs_distances

    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (3, 0), (8, 9)]
    e = spark.createDataFrame(pairs, "src LONG, dst LONG")
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([(0,)], "n LONG")
    got = {r.n: r.dist for r in bfs_distances(edges, seeds).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_distances_max_hops_truncates(spark):
    from duckdb_distributed_execution_spark.operators.graph import bfs_distances

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(0,)], "n LONG")
    got = bfs_distances(chain, seeds, max_hops=3)
    assert {r.n: r.dist for r in got.collect()} == {0: 0, 1: 1, 2: 2, 3: 3}
