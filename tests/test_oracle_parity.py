"""Fast oracle-parity smoke: a representative query per family,
checked against DuckDB at sf0.01 with the same canonicalization the
selfcheck harness uses. The full 62-query sweep runs via
``python tools/selfcheck.py`` (and per-round by the driver)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tools.selfcheck import table_hash

REPRESENTATIVE = [
    "agg_pricing_summary",
    "join_multi_star",
    "join_asof",
    "window_rownum_latest",
    "rollup_agg",
    "ann_bruteforce_topk",
    "dedup_minhash_sigs",
    "text_quality",
    "events_tumbling_window",
    "bool_bit_aggregates",
    "csv_roundtrip",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_matches_oracle(spark, duck, name):
    from duckdb_distributed_execution_spark.queries import all_queries

    spec = all_queries()[name]
    sdf = spec.fn(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert len(srows) == len(drows)
    assert sorted(sdf.columns) == sorted(dcols)
    sh, _ = table_hash(srows, sdf.columns)
    dh, _ = table_hash(drows, dcols)
    assert sh == dh
    assert len(srows) > 0
