"""Organic scale-factor data generator (round-4 verdict task 7).

The 10x/100x probes (tools/probe_scale.py) REPLICATE sf0.1, which
skews output-bound dedup families toward Theta(factor^2) pairs — the
README has to explain that caveat every time. This generator instead
synthesizes a genuinely organic sf-N dataset with the SAME schemas and
distribution shapes as the driver's testdata (measured from sf0.1:
uniform 31-word vocabulary, 10..100-token docs, exp(50) event values,
~4.07 lineitems/order, midnight order dates 1995..2001-08, 30-day
event window, N(0, 0.125^2) float32 embeddings over 10 labels), plus a
controlled ORGANIC duplication layer in documents (2% exact clones,
3% near-clones with token edits, 2% substring-quoting docs) so the
dedup/ANN probes measure realistic — linear, not quadratic —
duplicate cardinalities at scale.

Deterministic (fixed seeds per table; no wall-clock anywhere):

    python tools/gen_sf.py --sf 1 [--out /tmp/dde_sf1]

writes region nation customer supplier part orders lineitem events
documents embeddings parquet (~1.2 GB at sf1, 6M lineitem rows) in
row-count ratios matching the driver's sf0.001/0.01/0.1 ladder.
Pair with the probes:

    python tools/probe_scale.py --data-dir /tmp/dde_sf1 --tag sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"]
P_ADJ = ["large", "small", "hot", "cold", "blue", "red", "green", "shiny"]
P_NOUN = ["ring", "bolt", "gear", "cam", "rod", "pin", "disc", "plate"]
P_TYPE = ["LARGE", "SMALL", "MEDIUM", "ECONOMY", "STANDARD", "PROMO"]
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")
DATE_LO = np.datetime64("1995-01-01", "D")
N_DATE_DAYS = 2405  # through 2001-08-01, matching the testdata span


def _ts_us(base: np.datetime64, offsets_us: np.ndarray) -> pa.Array:
    return pa.array(base + offsets_us.astype("timedelta64[us]"))


def gen_dims(out: str, sf: float) -> None:
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }), f"{out}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), f"{out}/nation.parquet")

    rng = np.random.default_rng(4201)
    n_cust = int(150_000 * sf)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype("int32")),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }), f"{out}/customer.parquet")

    rng = np.random.default_rng(4202)
    n_supp = int(10_000 * sf)
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype("int32")),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }), f"{out}/supplier.parquet")

    rng = np.random.default_rng(4203)
    n_part = int(200_000 * sf)
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(
            np.array(P_TYPE)[rng.integers(0, len(P_TYPE), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype("int32")),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }), f"{out}/part.parquet")


def gen_orders_lineitem(out: str, sf: float) -> None:
    rng = np.random.default_rng(4204)
    n_orders = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    odate_day = rng.integers(0, N_DATE_DAYS, n_orders)
    odate = DATE_LO + odate_day.astype("timedelta64[D]")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 4, n_orders)]),
    })
    pq.write_table(orders, f"{out}/orders.parquet")

    # ~4.07 lines/order like the testdata: uniform 1..7 lines.
    rng = np.random.default_rng(4205)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    lines_per = rng.integers(1, 8, n_orders)
    okey = np.repeat(np.arange(n_orders), lines_per)
    n_li = len(okey)
    linenumber = (
        np.arange(n_li) - np.repeat(
            np.cumsum(lines_per) - lines_per, lines_per) + 1
    )
    ship = (
        np.repeat(odate_day, lines_per)
        + rng.integers(1, 121, n_li)
    ).astype("timedelta64[D]")
    li = pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumber.astype("int32")),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            (DATE_LO + ship).astype("datetime64[us]")),
    })
    pq.write_table(li, f"{out}/lineitem.parquet")


def gen_events(out: str, sf: float) -> None:
    rng = np.random.default_rng(4206)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    us = np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev))
    ev = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_us(EPOCH_2024, us),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(["click", "view", "purchase", "signup", "error"])[
                rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    })
    pq.write_table(ev, f"{out}/events.parquet")


def gen_documents(out: str, sf: float) -> None:
    """Uniform-vocab docs PLUS an organic duplication layer:
    ids 0..n-1; a doc with id in the clone band copies an EARLIER doc
    exactly (2%), with ~3 token edits (3%), or quotes an 8..20-token
    substring of it mid-text (2%) — linear duplicate mass, never the
    replica corpus's quadratic pair blow-up."""
    rng = np.random.default_rng(4207)
    n_docs = int(50_000 * sf)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    toks_by_id: list[np.ndarray] = []
    for i in range(n_docs):
        mode = rng.random()
        if i > 10 and mode < 0.02:          # exact clone
            src = int(rng.integers(0, i))
            t = toks_by_id[src].copy()
        elif i > 10 and mode < 0.05:        # near clone: ~3 edits
            src = int(rng.integers(0, i))
            t = toks_by_id[src].copy()
            for _ in range(3):
                t[int(rng.integers(0, len(t)))] = vocab[
                    int(rng.integers(0, len(vocab)))]
        elif i > 10 and mode < 0.07:        # substring quote
            src = int(rng.integers(0, i))
            s = toks_by_id[src]
            span = min(len(s), int(rng.integers(8, 21)))
            at = int(rng.integers(0, len(s) - span + 1))
            quote = s[at:at + span]
            base = vocab[rng.integers(0, len(vocab),
                                      int(rng.integers(10, 81)))]
            cut = int(rng.integers(0, len(base) + 1))
            t = np.concatenate([base[:cut], quote, base[cut:]])
        else:
            t = vocab[rng.integers(0, len(vocab),
                                   int(rng.integers(10, 101)))]
        toks_by_id.append(t)
        texts.append(" ".join(t))
    langs = pa.array(
        np.array(LANGS)[rng.choice(len(LANGS), n_docs, p=LANG_W)]
    )
    sources = [f"src{i}" for i in rng.integers(0, 20, n_docs)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": sources,
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, f"{out}/documents.parquet")
    # Salted twin for the set-similarity PIPELINE probe (same role as
    # probe_scale's documents_distinct replica): a per-doc-unique
    # interleave salt makes every bigram doc-private. The organic
    # corpus's 31-word vocabulary turns EVERY token into a stop-token,
    # so prefix filtering is definitionally powerless there — the
    # candidate set is output/posting-bound, not an algorithm defect
    # (measured: the unsalted sf1 setsim probe spilled >40 GB; real
    # corpora have ~1e5+ vocabularies where prefix rarity exists).
    salted = [
        t.replace(" ", f" u{i} ") for i, t in enumerate(texts)
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": salted,
        "lang": langs,
        "source": sources,
        "n_chars": pa.array([len(t) for t in salted], pa.int64()),
    }), f"{out}/documents_distinct.parquet")


def gen_embeddings(out: str, sf: float) -> None:
    rng = np.random.default_rng(4208)
    n_vec = int(20_000 * sf)
    V = rng.normal(0.0, 0.125, (n_vec, 64)).astype("float32")
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, 10, n_vec).astype("int32")),
    }), f"{out}/embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/dde_sf{args.sf:g}"
    os.makedirs(out, exist_ok=True)
    gen_dims(out, args.sf)
    gen_orders_lineitem(out, args.sf)
    gen_events(out, args.sf)
    gen_documents(out, args.sf)
    gen_embeddings(out, args.sf)
    total = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
    )
    print(f"wrote sf{args.sf:g} to {out} ({total / 1e6:.0f} MB)")


if __name__ == "__main__":
    main()
