"""Cross-query consistency: independent operators computed by
different plans must agree on shared invariants. Each test runs two
(or more) registered queries on the same corpus and checks an
identity that holds by construction — a disagreement means one of
the plans is wrong in a way its own oracle might not catch (both
sides of an oracle pair can share a bug; two independent operators
cannot share it by accident)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _q(name):
    from duckdb_distributed_execution_spark.queries import all_queries

    return all_queries()[name].fn


def test_session_counts_agree_across_three_operators(spark):
    """sessionize_window_sql (per-user rollup), session_bounce_rate
    (per-entry-type), and bounce_rate_wilson_ci must all see the SAME
    total number of sessions — three different plans over the same
    30-minute-gap islands."""
    sess = _q("sessionize_window_sql")(spark, SF)
    total_sessions = sess.agg(F.sum("n_sessions")).first()[0]
    bounce = _q("session_bounce_rate")(spark, SF)
    assert bounce.agg(F.sum("n_sessions")).first()[0] == total_sessions
    wilson = _q("bounce_rate_wilson_ci")(spark, SF)
    assert wilson.agg(F.sum("n_sessions")).first()[0] == total_sessions
    # And the bounce counts of the two bounce queries are identical
    # per entry type.
    b1 = {r["entry_type"]: r["bounces"] for r in bounce.collect()}
    b2 = {r["entry_type"]: r["bounces"] for r in wilson.collect()}
    assert b1 == b2


def test_growth_ledger_conserves_active_users(spark):
    """Per week: new + retained + resurrected must equal that week's
    distinct active users (dau_wau_mau's weekly twin computed
    independently), and the ledger's own columns must balance."""
    ga = {
        str(r["week"]): r
        for r in _q("growth_accounting_weekly")(spark, SF).collect()
    }
    from duckdb_distributed_execution_spark.queries import load

    e = load(spark, SF, "events")["events"]
    actives = {
        str(r["week"]): r["n"]
        for r in e.select(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("week"),
        )
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(ga) == set(actives)
    for wk, r in ga.items():
        assert (
            r["new_users"] + r["retained"] + r["resurrected"] == actives[wk]
        ), wk


def test_upset_lattice_masses_match_userday_count(spark):
    """The lattice's user-day masses must sum to the distinct
    (user, day) count, and every mask's n_types must equal its
    popcount."""
    rows = _q("upset_type_lattice")(spark, SF).collect()
    from duckdb_distributed_execution_spark.queries import load

    e = load(spark, SF, "events")["events"]
    userdays = (
        e.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["n_user_days"] for r in rows) == userdays
    for r in rows:
        assert r["n_types"] == bin(r["mask"]).count("1")


def test_gini_and_activity_totals_match_corpus(spark):
    """activity_gini_lorenz's totals must equal raw corpus counts,
    and user_event_entropy's per-user totals must sum to the same."""
    g = _q("activity_gini_lorenz")(spark, SF).collect()[0]
    from duckdb_distributed_execution_spark.queries import load

    e = load(spark, SF, "events")["events"]
    assert g["total_events"] == e.count()
    assert g["n_users"] == e.select("user_id").distinct().count()
    ent = _q("user_event_entropy")(spark, SF)
    assert ent.agg(F.sum("n_events")).first()[0] == g["total_events"]
    assert ent.count() == g["n_users"]


def test_threshold_curve_monotone_and_anchored_to_minhash(spark):
    """dedup_threshold_curve at its loosest theta must reproduce
    dedup_minhash_lsh's pair count exactly (same machinery), and both
    pair and removal counts must be monotone non-increasing in
    theta."""
    curve = sorted(
        _q("dedup_threshold_curve")(spark, SF).collect(),
        key=lambda r: r["theta"],
    )
    pairs = _q("dedup_minhash_lsh")(spark, SF).count()
    assert curve[0]["n_pairs"] == pairs
    for a, b in zip(curve, curve[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["docs_removed"] >= b["docs_removed"]
        assert a["retention"] <= b["retention"]


def test_dau_wau_mau_ordering_and_first_day_identity(spark):
    """DAU ≤ WAU ≤ MAU everywhere; on the corpus's first day all
    three coincide (no trailing history yet)."""
    rows = sorted(
        _q("dau_wau_mau_stickiness")(spark, SF).collect(),
        key=lambda r: str(r["day"]),
    )
    for r in rows:
        assert r["dau"] <= r["wau"] <= r["mau"], str(r["day"])
    first = rows[0]
    assert first["dau"] == first["wau"] == first["mau"]


def test_pareto_classes_partition_revenue(spark):
    """ABC classes must partition the part set and their revenue
    shares must sum to 1 (within rounding)."""
    rows = _q("pareto_abc_classification")(spark, SF).collect()
    from duckdb_distributed_execution_spark.queries import load

    li = load(spark, SF, "lineitem")["lineitem"]
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["revenue_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_sketch_quantiles_certified_and_exact_matches_percentile_disc(spark):
    """quantile_sketch_bound must certify every row (within_bound),
    and its exact column must be internally consistent: p50 ≤ p90 ≤
    p99."""
    rows = {r["p_name"]: r for r in _q("quantile_sketch_bound")(spark, SF).collect()}
    assert all(r["within_bound"] for r in rows.values())
    assert (
        rows["p50"]["exact_value"]
        <= rows["p90"]["exact_value"]
        <= rows["p99"]["exact_value"]
    )
    for r in rows.values():
        assert r["sketch_estimate"] >= r["exact_value"]


def test_attribution_models_conserve_purchases(spark):
    """Credit must be conserved across attribution models: U-shaped
    per-purchase weights sum to exactly 1, so total credited
    purchases equals the attributed-purchase count that first- and
    last-touch both report (every attributed purchase has exactly one
    first and one last click)."""
    fl = _q("attribution_first_last")(spark, SF)
    ft_total = fl.agg(F.sum("first_touch_purchases")).first()[0]
    lt_total = fl.agg(F.sum("last_touch_purchases")).first()[0]
    assert ft_total == lt_total
    u = _q("attribution_u_shaped")(spark, SF)
    credited = u.agg(F.sum("credited_purchases")).first()[0]
    assert credited == pytest.approx(float(lt_total), abs=1e-3)


def test_bigram_and_bpe_word_accounting_agree(spark):
    """lm_bigram_perplexity counts n-1 bigrams per doc; bpe_apply_fixed
    counts n words per doc by a different plan (explode + distinct-vocab
    join vs array-slice zip). n_bigrams == n_words - 1 everywhere."""
    bg = {
        r["doc_id"]: r["n_bigrams"]
        for r in _q("lm_bigram_perplexity")(spark, SF).collect()
    }
    words = {
        r["doc_id"]: r["n_words"]
        for r in _q("bpe_apply_fixed")(spark, SF).collect()
    }
    assert set(bg) == set(words)
    for doc, nb in bg.items():
        assert nb == words[doc] - 1


def test_tercile_docs_partition_language_counts(spark):
    """ppl_tercile_buckets' per-lang bucket sizes must sum to the
    language histogram of the raw documents table (every scored doc
    lands in exactly one bucket)."""
    terc = _q("ppl_tercile_buckets")(spark, SF)
    got = {
        r["lang"]: r["total"]
        for r in terc.groupBy("lang")
        .agg(F.sum("n_docs").alias("total"))
        .collect()
    }
    from duckdb_distributed_execution_spark.queries import load

    docs = load(spark, SF, "documents")["documents"]
    want = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    assert got == want


def test_pass_at_k_and_self_consistency_sample_counts_agree(spark):
    """Both eval estimators group the same samples by problem through
    different plans; their per-problem n must agree (pass@k filters
    n >= 10, so compare on its problems), and pass@k's total samples
    must equal the raw event count."""
    pk = {r["problem_id"]: r for r in _q("eval_pass_at_k")(spark, SF).collect()}
    sc = {
        r["problem_id"]: r["n"]
        for r in _q("eval_self_consistency")(spark, SF).collect()
    }
    assert set(pk) <= set(sc)
    for pid, r in pk.items():
        assert r["n"] == sc[pid]
    from duckdb_distributed_execution_spark.queries import load

    events = load(spark, SF, "events")["events"]
    n_small = events.groupBy("user_id").count().filter("count < 10").count()
    assert len(pk) + n_small == events.select("user_id").distinct().count()


def test_concurrency_sweep_agrees_with_sessionizer(spark):
    """session_concurrency_sweep's session count must equal the
    sessionize_window_sql rollup's total (same 30-min gap rule, very
    different plans: sweep-line + distributed prefix sum vs per-user
    window rollup); the peak is bounded by the distinct-user count
    (a user can hold only one open session at a time)."""
    sweep = _q("session_concurrency_sweep")(spark, SF).collect()[0]
    sess = _q("sessionize_window_sql")(spark, SF)
    assert sweep["n_sessions"] == sess.agg(F.sum("n_sessions")).first()[0]
    assert 1 <= sweep["peak_concurrency"] <= sess.count()
