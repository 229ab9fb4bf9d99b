"""Planted-signal tests for the round-4 wave operators — each test
constructs data with a KNOWN property and asserts the operator
recovers it (the oracle harness proves cross-engine equality; these
prove the math measures what it claims)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# k-core vs brute-force peeling on a fixed graph
# ---------------------------------------------------------------------------


def _brute_kcore(adj: dict[int, set[int]], k: int) -> dict[int, int]:
    """Reference k-core: peel to a fixpoint in plain Python, return
    surviving node -> within-core degree."""
    alive = set(adj)
    while True:
        drop = {u for u in alive if len(adj[u] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {u: len(adj[u] & alive) for u in alive}


def test_kcore_matches_bruteforce(spark):
    from duckdb_distributed_execution_spark.operators.graph import kcore

    # A 4-clique (core-3), a triangle hung off it (core-2), and a
    # pendant chain (core-1).
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # K4
        (4, 5), (5, 6), (6, 4),                            # triangle at 4
        (6, 7), (7, 8),                                    # chain
    ]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    und = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges], "u LONG, v LONG"
    )
    for k in (1, 2, 3):
        got = {
            r["u"]: r["core_degree"]
            for r in kcore(und, k=k, rounds=8).collect()
        }
        assert got == _brute_kcore(adj, k), f"k={k}"
    # k=4: K4 has within-degree 3 — everything peels.
    assert kcore(und, k=4, rounds=8).count() == 0


# ---------------------------------------------------------------------------
# CUSUM recovers a planted level shift
# ---------------------------------------------------------------------------


def test_cusum_changepoint_detects_planted_shift(spark, tmp_path):
    import datetime

    # 20 days at 100 events/day, then 10 days at 200 — the CUSUM
    # |D_t| peak must land exactly on the last low day (day 20).
    rows = []
    eid = 0
    for d in range(30):
        n = 100 if d < 20 else 200
        day = datetime.datetime(2024, 3, 1) + datetime.timedelta(days=d)
        for i in range(n):
            rows.append((eid, day + datetime.timedelta(seconds=i), 1, "shift", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline19 import (
        cusum_changepoint,
    )

    out = cusum_changepoint(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["changepoint_day"]) == "2024-03-20"  # last low day
    # First segment runs BELOW the mean -> cumulative deficit -> D<0.
    assert r["direction"] == -1
    # Peak |D|/n = 20 days x (mean - 100) = 20 x (400/3) = 2666.67
    assert r["cusum_peak"] == pytest.approx(20 * (100 * 30 + 100 * 10) / 30 - 20 * 100, abs=0.01)


# ---------------------------------------------------------------------------
# Theil–Sen shrugs off the spike that wrecks OLS
# ---------------------------------------------------------------------------


def test_theil_sen_robust_to_spike(spark, tmp_path):
    import datetime

    # Flat 100/day for 14 days with ONE 1000-event spike day. The
    # Theil–Sen slope stays ~0; an OLS fit would tilt hard.
    rows = []
    eid = 0
    for d in range(14):
        n = 1000 if d == 7 else 100
        day = datetime.datetime(2024, 3, 1) + datetime.timedelta(days=d)
        for i in range(n):
            rows.append((eid, day + datetime.timedelta(seconds=i), 1, "flat", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline20 import (
        theil_sen_trend,
    )

    r = theil_sen_trend(spark, sf).collect()[0]
    assert r["theil_sen_slope"] == 0.0
    assert r["trend"] == "flat"


# ---------------------------------------------------------------------------
# Burstiness signs: metronome vs burst-train
# ---------------------------------------------------------------------------


def test_burstiness_sign_separates_regimes(spark, tmp_path):
    import datetime

    base = datetime.datetime(2024, 3, 1)
    rows = []
    # User 1: metronomic — identical 60s gaps => sigma=0 => B = -1.
    for i in range(50):
        rows.append((i, base + datetime.timedelta(seconds=60 * i), 1, "x", 0.0, "{}"))
    # User 2: bursty — tight 1s bursts separated by hour-long silences
    # => sigma >> mu => B -> +1.
    t = base
    eid = 1000
    for burst in range(10):
        for i in range(5):
            t += datetime.timedelta(seconds=1)
            rows.append((eid, t, 2, "x", 0.0, "{}"))
            eid += 1
        t += datetime.timedelta(hours=1)
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline18 import (
        interarrival_burstiness,
    )

    got = {r["user_id"]: r["burstiness"] for r in interarrival_burstiness(spark, sf).collect()}
    assert got[1] == -1.0
    # Closed form for user 2: gaps are 40×1s + 9×3601s → μ≈662s,
    # σ≈1394s → B = (σ−μ)/(σ+μ) ≈ 0.356 — clearly positive (bursty)
    # where the metronome pins at exactly −1.
    assert got[2] == pytest.approx(0.355878, abs=1e-6)
    assert got[2] > 0.3


# ---------------------------------------------------------------------------
# Gini extremes: uniform -> 0, single whale -> (n-1)/n-ish
# ---------------------------------------------------------------------------


def _write_user_events(spark, sf, counts):
    import datetime

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u, n in counts.items():
        for i in range(n):
            rows.append((eid, base + datetime.timedelta(seconds=eid), u, "x", 0.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")


def test_gini_uniform_is_zero(spark, tmp_path):
    from duckdb_distributed_execution_spark.queries.pipeline18 import (
        activity_gini_lorenz,
    )

    sf = str(tmp_path)
    _write_user_events(spark, sf, {u: 10 for u in range(1, 11)})
    r = activity_gini_lorenz(spark, sf).collect()[0]
    assert r["gini"] == 0.0
    assert r["top_decile_share"] == pytest.approx(0.1)


def test_gini_whale_dominated(spark, tmp_path):
    from duckdb_distributed_execution_spark.queries.pipeline18 import (
        activity_gini_lorenz,
    )

    sf = str(tmp_path)
    # 9 users x 1 event + 1 user x 991 events: G = (2*Σi·x −(n+1)Σx)/(nΣx)
    _write_user_events(spark, sf, {**{u: 1 for u in range(1, 10)}, 10: 991})
    r = activity_gini_lorenz(spark, sf).collect()[0]
    ix = sum(i * 1 for i in range(1, 10)) + 10 * 991
    expected = (2 * ix - 11 * 1000) / (10 * 1000)
    assert r["gini"] == pytest.approx(expected, abs=1e-6)
    assert r["top_decile_share"] == pytest.approx(0.991)


# ---------------------------------------------------------------------------
# RRF: agreement wins
# ---------------------------------------------------------------------------


def test_rrf_consensus_doc_outranks_single_list_winners(spark):
    """A doc ranked #2 in BOTH lists must outrank docs ranked #1 in
    only one list (1/62+1/62 > 1/61 + 1/80-ish tail) — the defining
    property of reciprocal rank fusion. Checked on the real testdata
    output shape instead of synthetic lists: for every query, any doc
    present in BOTH source rankings with ranks (a, b) scores exactly
    round(1/(60+a) + 1/(60+b), 6)."""
    from duckdb_distributed_execution_spark.queries.pipeline18 import (
        rag_hybrid_rrf,
    )

    rows = rag_hybrid_rrf(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        expected = 0.0
        if r["rank_lex"] is not None:
            expected += 1.0 / (60 + r["rank_lex"])
        if r["rank_vec"] is not None:
            expected += 1.0 / (60 + r["rank_vec"])
        assert r["rrf_score"] == pytest.approx(round(expected, 6), abs=1e-9)
    # Fused ordering is by score then doc_id within each query.
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        scores = [r["rrf_score"] for r in rs]
        assert scores == sorted(scores, reverse=True), q


# ---------------------------------------------------------------------------
# Kappa extremes: identical screens -> 1
# ---------------------------------------------------------------------------


def test_kappa_identical_screens_is_one(spark, tmp_path):
    """If both screens agree on every doc (all docs long AND diverse,
    or the complement), kappa is undefined (pe=1) — so instead plant
    a corpus where the two screens agree on a clean split and check
    kappa = 1."""
    rows = []
    # 10 docs that pass both (45 distinct tokens), 10 that fail both
    # (8 tokens, all identical).
    for i in range(10):
        rows.append((i, " ".join(f"w{j}_{i}" for j in range(45)), "en", "s", 0))
    for i in range(10, 20):
        rows.append((i, " ".join(["dup"] * 8), "en", "s", 0))
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline21 import (
        quality_screen_kappa,
    )

    r = quality_screen_kappa(spark, str(tmp_path)).collect()[0]
    assert r["both_pass"] == 10 and r["both_fail"] == 10
    assert r["kappa"] == 1.0


# ---------------------------------------------------------------------------
# Growth accounting on a planted 4-week user storyline
# ---------------------------------------------------------------------------


def test_growth_accounting_exact_cells(spark, tmp_path):
    import datetime

    mon = datetime.datetime(2024, 3, 4)
    wk = lambda i: mon + datetime.timedelta(weeks=i)
    plan = {1: [0, 1, 2, 3], 2: [0], 3: [0, 2], 4: [3]}
    rows = []
    eid = 0
    for u, weeks in plan.items():
        for i in weeks:
            rows.append((eid, wk(i) + datetime.timedelta(hours=u), u, "x", 0.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline24 import (
        growth_accounting_weekly,
    )

    got = {
        str(r["week"]): (r["new_users"], r["retained"], r["resurrected"], r["churned"])
        for r in growth_accounting_weekly(spark, str(tmp_path)).collect()
    }
    assert got == {
        "2024-03-04": (3, 0, 0, 0),
        "2024-03-11": (0, 1, 0, 2),
        "2024-03-18": (0, 1, 1, 0),
        "2024-03-25": (1, 1, 0, 1),
    }


# ---------------------------------------------------------------------------
# Pareto classes on a planted revenue distribution
# ---------------------------------------------------------------------------


def test_pareto_abc_planted_distribution(spark, tmp_path):
    # 10 parts: one 80-cent whale, one 15-cent mid, eight 0.625-cent
    # tails (scaled ×100 to stay integral in cents).
    rows = []
    lid = 0
    revs = {1: 8000, 2: 1500} | {p: 62 for p in range(3, 11)}  # cents... whale 80%, mid 15%
    # make revenue exactly rev cents: price = rev/100 dollars, qty 1, disc 0
    import datetime

    for p, cents in revs.items():
        rows.append((lid, p, 1, 1, 1.0, cents / 100.0, 0.0, 0.0, "N", "O",
                     datetime.datetime(2024, 1, 1)))
        lid += 1
    spark.createDataFrame(
        rows,
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline22 import (
        pareto_abc_classification,
    )

    got = {r["abc"]: (r["n_parts"], r["revenue_share"]) for r in
           pareto_abc_classification(spark, str(tmp_path)).collect()}
    total = 8000 + 1500 + 8 * 62
    # Strict integer cutoffs: whale cum*10=80000 > total*8=79968 so it
    # misses A by 4 cents; mid cum*20=190000 > total*19=189924 misses
    # B by 4 cents -> whale=B, mid+tails=C. The boundary is decided in
    # integer space, which is exactly what this pins.
    assert "A" not in got
    assert got["B"] == (1, pytest.approx(round(8000 / total, 6)))
    assert got["C"][0] == 9


# ---------------------------------------------------------------------------
# Weekday seasonality closed form on a planted weekly pattern
# ---------------------------------------------------------------------------


def test_weekday_seasonality_closed_form(spark, tmp_path):
    import datetime

    # 14 days (exactly 2 of each weekday): 10 events on Mondays,
    # 1 event on every other day. Monday index must be
    # (10/2) / (22/14) = 5 / (11/7) = 35/11.
    rows = []
    eid = 0
    start = datetime.datetime(2024, 3, 4)  # a Monday
    for d in range(14):
        day = start + datetime.timedelta(days=d)
        n = 10 if day.weekday() == 0 else 1
        for i in range(n):
            rows.append((eid, day + datetime.timedelta(minutes=i), 1, "x", 0.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline22 import (
        weekday_seasonality_index,
    )

    got = {r["weekday"]: r["seasonality"] for r in
           weekday_seasonality_index(spark, str(tmp_path)).collect()}
    total = 2 * 10 + 12 * 1  # 32 events over 14 days
    # Monday cell: 2 Mondays x 10 events = 20; index = (20/2)/(32/14).
    assert got[1] == pytest.approx(round((20 * 14) / (2 * total), 6))  # = 4.375
    # Any other weekday: 2 days x 1 event; index = (2/2)/(32/14).
    assert got[2] == pytest.approx(round((2 * 14) / (2 * total), 6))   # = 0.4375


# ---------------------------------------------------------------------------
# Revenue bridge on planted price/volume changes
# ---------------------------------------------------------------------------


def test_revenue_bridge_planted_effects(spark, tmp_path):
    """Three parts with KNOWN moves: part 1 doubles volume at constant
    price (pure volume effect), part 2 raises price 50% at constant
    volume (pure price effect), part 3 is dropped after year 0, part 4
    is new in year 1 — each effect lands in exactly its own bucket and
    the residual is 0."""
    import datetime

    rows = []
    lid = 0

    def add(year, part, qty, unit_price):
        nonlocal lid
        rows.append((lid, part, 1, 1, float(qty), unit_price * qty, 0.0, 0.0,
                     "N", "O", datetime.datetime(year, 6, 1)))
        lid += 1

    add(1995, 1, 10, 2.0); add(1996, 1, 20, 2.0)       # volume: +10*2 = +20
    add(1995, 2, 10, 4.0); add(1996, 2, 10, 6.0)       # price: 10*(6-4) = +20
    add(1995, 3, 5, 3.0)                               # dropped: -15
    add(1996, 4, 5, 8.0)                               # new: +40
    spark.createDataFrame(
        rows,
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline31 import (
        revenue_bridge_pvm,
    )

    r = revenue_bridge_pvm(spark, str(tmp_path)).collect()[0]
    assert r["rev_y0"] == pytest.approx(20 + 40 + 15)
    assert r["rev_y1"] == pytest.approx(40 + 60 + 40)
    assert r["volume_effect"] == pytest.approx(20.0)
    assert r["price_effect"] == pytest.approx(20.0)
    assert r["new_parts_effect"] == pytest.approx(40.0)
    assert r["dropped_parts_effect"] == pytest.approx(-15.0)
    assert r["residual"] == 0.0


# ---------------------------------------------------------------------------
# Lead–lag correlation peaks at the planted shift
# ---------------------------------------------------------------------------


def test_leadlag_peak_at_planted_lag(spark, tmp_path):
    """purchase(day) = click(day − 2): the cross-correlation must be
    exactly 1.0 at lag +2 and strictly smaller elsewhere."""
    import datetime

    base = [5, 9, 2, 14, 7, 11, 3, 13, 6, 10, 4, 12, 8, 15, 5, 9, 7, 11, 6, 13]
    rows = []
    eid = 0
    start = datetime.datetime(2024, 3, 1)
    for d, n in enumerate(base):
        day = start + datetime.timedelta(days=d)
        for i in range(n):
            rows.append((eid, day + datetime.timedelta(seconds=i), 1, "click", 0.0, "{}"))
            eid += 1
    for d, n in enumerate(base):
        day = start + datetime.timedelta(days=d + 2)
        for i in range(n):
            rows.append((eid, day + datetime.timedelta(seconds=i), 1, "purchase", 0.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline27 import (
        leadlag_crosscorrelation,
    )

    got = {r["lag"]: r["correlation"] for r in
           leadlag_crosscorrelation(spark, str(tmp_path)).collect()}
    assert got[2] == pytest.approx(1.0)
    for lag, c in got.items():
        if lag != 2:
            assert c < 0.99, (lag, c)


# ---------------------------------------------------------------------------
# Repeat-revenue attribution on a planted order history
# ---------------------------------------------------------------------------


def test_repeat_revenue_split_attribution(spark, tmp_path):
    """Customer 1 orders in 1995 (first) and twice in 1996 (repeats);
    customer 2's first order is in 1996 — the split must attribute
    each cent to the right bucket per year."""
    import datetime

    rows = [
        (1, 1, "O", 100.0, datetime.datetime(1995, 3, 1), "1-URGENT"),
        (2, 1, "O", 200.0, datetime.datetime(1996, 3, 1), "1-URGENT"),
        (3, 1, "O", 300.0, datetime.datetime(1996, 9, 1), "1-URGENT"),
        (4, 2, "O", 50.0, datetime.datetime(1996, 5, 1), "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline32 import (
        repeat_revenue_split,
    )

    got = {r["order_year"]: r for r in
           repeat_revenue_split(spark, str(tmp_path)).collect()}
    assert got[1995]["first_time_revenue"] == pytest.approx(100.0)
    assert got[1995]["repeat_revenue"] == pytest.approx(0.0)
    assert got[1996]["first_time_orders"] == 1
    assert got[1996]["first_time_revenue"] == pytest.approx(50.0)
    assert got[1996]["repeat_revenue"] == pytest.approx(500.0)
    assert got[1996]["repeat_share"] == pytest.approx(500.0 / 550.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Directed follow rates see direction
# ---------------------------------------------------------------------------


def test_followed_by_within_is_directed(spark, tmp_path):
    """Plant a strict A-then-B pattern: every 'view' is followed by a
    'click' 10 minutes later; nothing follows the clicks. The view->
    click rate must be 1.0 and click->view must be absent (or 0) —
    the asymmetry a symmetric co-presence measure cannot express."""
    import datetime

    rows = []
    eid = 0
    base = datetime.datetime(2024, 3, 1)
    for i in range(20):
        t0 = base + datetime.timedelta(hours=3 * i)
        rows.append((eid, t0, 1, "view", 0.0, "{}")); eid += 1
        rows.append((eid, t0 + datetime.timedelta(minutes=10), 1, "click", 0.0, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from duckdb_distributed_execution_spark.queries.pipeline37 import (
        followed_by_within,
    )

    got = {(r["antecedent"], r["consequent"]): r["follow_rate"]
           for r in followed_by_within(spark, str(tmp_path)).collect()}
    assert got[("view", "click")] == pytest.approx(1.0)
    assert ("click", "view") not in got
