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
