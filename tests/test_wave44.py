"""Wave-44 pins: pass@k against exact math.comb combinatorics, and
majority-vote agreement invariants (oracle parity is the harness's
job; these pin engine-vs-ALGORITHM)."""

from __future__ import annotations

import math

import pytest

from duckdb_distributed_execution_spark.queries.pipeline44 import (
    eval_pass_at_k,
    eval_self_consistency,
)

SF = "/root/testdata/sf0.001"


def _exact_pass_at_k(n, c, k):
    if n - c < k:
        return 1.0
    return 1.0 - math.comb(n - c, k) / math.comb(n, k)


def test_pass_at_k_matches_comb(spark):
    rows = eval_pass_at_k(spark, SF).collect()
    assert rows
    for r in rows:
        n, c = r["n"], r["c"]
        assert 0 <= c <= n and n >= 10
        assert r["pass_at_5"] == pytest.approx(
            _exact_pass_at_k(n, c, 5), abs=1e-6
        )
        assert r["pass_at_10"] == pytest.approx(
            _exact_pass_at_k(n, c, 10), abs=1e-6
        )
        # more draws can only help: pass@10 >= pass@5
        assert r["pass_at_10"] >= r["pass_at_5"] - 1e-9
        if c == 0:
            assert r["pass_at_5"] == 0.0 and r["pass_at_10"] == 0.0


def test_self_consistency_invariants(spark):
    rows = eval_self_consistency(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["majority_answer"] <= 9
        assert 1 <= r["votes"] <= r["n"]
        assert r["agreement"] == pytest.approx(
            r["votes"] / r["n"], abs=6e-7
        )
        # majority by definition: votes >= n / #buckets
        assert r["votes"] * 10 >= r["n"]


def test_ppl_tercile_buckets_invariants(spark):
    """CCNet split: per lang, three buckets with sizes differing by
    at most one, and the perplexity ranges are ordered —
    max_ppl(head) <= min_ppl(middle) <= ... (rank-cut property)."""
    from duckdb_distributed_execution_spark.queries.pipeline45 import (
        ppl_tercile_buckets,
    )

    rows = ppl_tercile_buckets(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, bks in by_lang.items():
        assert set(bks) == {0, 1, 2}
        sizes = [bks[b]["n_docs"] for b in (0, 1, 2)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        for b in (0, 1):
            assert bks[b]["max_ppl"] <= bks[b + 1]["min_ppl"] + 1e-9
        for b in (0, 1, 2):
            assert bks[b]["min_ppl"] <= bks[b]["avg_ppl"] <= bks[b]["max_ppl"] + 1e-9
