"""Plan-quality sweep: summarize the physical plan of every query in
the inventory and flag scale smells — cartesian products,
broadcast-nested-loop joins outside the documented allowlist,
excessive shuffle exchanges, excessive sort-merge joins.

Static mode (default) parses the unexecuted formatted plan; shuffle
counts are real under AQE since round 6 (the round-5 verdict found
the old counter matched only the non-AQE single-line rendering, so
every AQE plan reported 0 shuffles and the shuffle budget never
fired). Codegen is NOT knowable statically for AQE-wrapped plans, so
the static sweep prints ``cg=?`` there; ``--execute`` runs each
query's own QueryExecution at the given sf and reports the FINAL
adaptive plan's shuffle count and whole-stage-codegen stage count —
flagging executed plans that run with zero codegen stages despite
having aggregates/joins.

    python tools/plancheck.py [--sf /root/testdata/sf0.01] [--execute] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default per-query shuffle-exchange budget for the static sweep.
# Chosen from the measured round-6 distribution over all registered
# queries (73 at 0, 141 at 1, 86 at 2; everything ≤12 except the five
# documented multi-branch pipelines below). Overrides PIN each at its
# measured round-6 count, so any growth flags as a regression.
SHUFFLE_BUDGET = 12
SHUFFLE_BUDGET_OVERRIDES: dict[str, int] = {
    # Iterative trainer: driver merge loop, shuffles = O(iterations)
    # by design (operators/bpe.py docstring).
    "bpe_train_merges": 18,
    # Multi-relation graph joins + per-step count combines.
    "graph_triangle_count": 28,
    # Sketch pass + THREE certified-exact percentile branches (each a
    # two-level scale-safe refinement) — the certificate is the point;
    # production would ship the 129-count sketch alone (1 shuffle).
    "quantile_sketch_bound": 40,
    # One audit branch per FK constraint, unioned.
    "referential_integrity_audit": 20,
    # One drift branch per audited column, unioned.
    "table_drift_audit": 20,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--execute",
        action="store_true",
        help="execute each query and audit the FINAL adaptive plan "
        "(honest post-AQE shuffles + real codegen stage counts)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from duckdb_distributed_execution_spark.plans import (
        formatted_plan,
        summarize,
        summarize_executed,
    )
    from duckdb_distributed_execution_spark.queries import all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plancheck")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    names = args.names or sorted(specs)
    flagged = 0
    for name in names:
        try:
            df = specs[name].fn(spark, args.sf)
            plan = formatted_plan(df)
            s = summarize_executed(df) if args.execute else summarize(df)
        except Exception as e:
            print(f"ERROR {name}: {e}")
            flagged += 1
            continue
        # BNLJ is the *correct* plan for genuinely non-equi joins and
        # 1-row scalar broadcasts — only flag it elsewhere.
        bnlj_expected = name in (
            "join_cross", "join_inequality",      # theta joins
            "subquery_scalar", "cte_revenue",     # 1-row scalar threshold
            "tpch_q11_important_parts",           # 1-row scalar threshold
            "tpch_q22_global_sales_opportunity",  # 1-row scalar threshold
            "tfidf_topk",                         # 1-row corpus-size broadcast
            "quality_quantile_filter",            # 1-row percentile broadcast
            "histogram_bins",                     # 1-row min/max broadcast
            "zorder_clustering",                  # 1-row bounds broadcast
            "text_unigram_logprob",               # 1-row corpus-total broadcast
            "hll_sketch_mergeable",               # 1-row merged-sketch + total
            "semantic_dedup_seeded",              # r5: numpy assignment —
                                                  # kept for older plans
            "session_duration_quantiles",         # 1-row session-count
                                                  # broadcast (r5: global
                                                  # rank routed through
                                                  # assign_stable_row_ids)
            "contamination_embedding_cosine",     # benchmark-slice broadcast
            "rag_retrieval_topk",                 # 8-centroid broadcast (IVF
                                                  # assign); per-query corpus
                                                  # scan BNLJ removed in r2
            "tpch_q2_partsupp",                   # 1-row supplier-count
            "tpch_q9_partsupp",                   # broadcast feeding the
            "tpch_q11_partsupp",                  # synthetic-partsupp
            "tpch_q16_partsupp",                  # derivation (see
            "tpch_q20_partsupp",                  # queries/tpch.py r2 section)
            "bm25_retrieval_topk",                # 1-row n_docs/avgdl broadcast
            "graph_triangle_count",               # 1-row count combines
            "minhash_candidate_recall",           # 1-row count combines
            "pmi_cooccurrence_topk",              # 1-row corpus-total broadcasts
            "bpe_train_merges",                   # 1-row best-pair broadcast/iter
            "streaming_join_left_outer",          # 1-row watermark-cutoff bcast
            "basket_lift_topk",                   # 1-row basket-count broadcast
            "dedup_threshold_curve",              # 1-row corpus-count broadcast
            "embedding_cluster_quality",          # k×k centroid pairs (k=10)
            "rag_hybrid_rrf",                     # 3-query-vector broadcast ×
                                                  # corpus (ann_* shape)
            "dau_wau_mau_stickiness",             # 30-row day-spine interval
                                                  # join (non-equi by design)
            "heaps_law_fit",                      # 10-row decile-cut broadcast
                                                  # × first-occurrence relation
            "session_type_lift",                  # 1-row session-count bcast
                                                  # × |types|² lift rows
            "quantile_sketch_bound",              # 1-row min/max/width bcast
                                                  # (histogram_bins pattern)
            "sampled_topk_quality",               # two 5-row top-k sets +
                                                  # 1-row overlap combine
            "lm_bigram_perplexity",               # 1-row corpus-total bcast
                                                  # (text_unigram pattern)
            "ppl_tercile_buckets",                # same 1-row total bcast
                                                  # via doc_ppl_df
            "ingest_funnel_by_source",            # same 1-row total bcast
                                                  # via doc_ppl_df
            "loso_source_influence",              # 1-row corpus-total bcast
                                                  # × |sources| rows
            "abtest_quantile_effects",            # 4-row percentile spine
                                                  # bcast × ranked relation
            "session_concurrency_sweep",          # 1-row peak + n_sessions
                                                  # scalar broadcasts
            "embedding_covariance_topvar",        # 1-row n broadcast ×
                                                  # D²-bounded entries
            "abtest_cuped_adjustment",            # 1-row pooled-θ bcast
                                                  # × 2-row arm relation
            "abtest_poststratified_ate",          # 1-row total bcast ×
                                                  # |strata| rows
            # quantile-spine (r6): disc_percentiles_by_group attaches
            # its |ps|-row percentile spine to the BUCKET-HISTOGRAM
            # relation (thousands of rows, never the corpus) —
            # operators/quantiles.py
            "winsorize_clamp",
            "histogram_equidepth",
            "preference_margin_quantiles",
            "reward_calibration_bins",
            "cluster_safe_split",                 # 1-row leak-count bcast
                                                  # × 2-row split summary
        ) or name.startswith("ann_")              # tiny-broadcast × corpus

        smells = []
        if "CartesianProduct" in plan:
            smells.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan and not bnlj_expected:
            smells.append("bnlj")
        # Real shuffle counts (AQE-aware since r6). The budget is per
        # COMPILED plan: >SHUFFLE_BUDGET distinct shuffle exchanges in
        # one query is a smell unless the query is a documented
        # multi-stage pipeline (iterative/multi-relation by design).
        budget = SHUFFLE_BUDGET_OVERRIDES.get(name, SHUFFLE_BUDGET)
        if s.n_shuffle_exchanges > budget:
            smells.append(f"shuffles={s.n_shuffle_exchanges}>{budget}")
        if s.n_sortmerge_joins > 2:
            smells.append(f"smj={s.n_sortmerge_joins}")
        if (args.execute and s.n_codegen_stages == 0
                and s.n_joins + int(s.has_partial_agg) > 0
                and not s.has_empty_relation):
            # empty-relation-collapsed plans (AQE propagates an empty
            # join side at tiny sf) legitimately run zero codegen
            smells.append("no-codegen")
        cg = "?" if s.wholestage_codegen is None else str(s.n_codegen_stages)
        line = (
            f"{name:30s} shuf={s.n_shuffle_exchanges} bc={s.n_broadcast_joins} "
            f"smj={s.n_sortmerge_joins} shj={s.n_shuffle_hash_joins} "
            f"push={int(s.has_pushed_filters)} cg={cg}"
        )
        if smells:
            flagged += 1
            print(f"FLAG  {line}  <-- {','.join(smells)}")
        else:
            print(f"ok    {line}")
    print(f"\n{flagged} flagged / {len(names)}")


if __name__ == "__main__":
    main()
