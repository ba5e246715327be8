"""Deterministic synthetic-testdata generator for scale-curve benchmarking.

Reproduces the driver-generated TPC-H-ish star schema (see TESTDATA.md)
at arbitrary scale factors, so expensive operator families can be timed
at sf1+ locally — the empirical check that their measured scaling
exponents match the plan-shape scale story (VERDICT r9 task #1).

Distributions are reverse-engineered from the committed sf0.01/sf0.1
parquet (row-count scaling rules, value ranges, categorical mixes,
Poisson(4) lineitem fan-out, exponential event inter-arrivals and
values, 30-word document vocabulary with a ~0.16% exact-dup rate,
unit-norm random 64-d embeddings). The point is matching SHAPE and
CARDINALITY per scale factor — not byte-identical parity with the
driver's own generator — so sf-to-sf timing ratios are meaningful.
Correctness (oracle parity) stays pinned to the driver's sf0.01 data.

Usage:
    python tools/gen_testdata.py 1.0 [outdir]     # default outdir:
                                                  # .scratch/testdata/sf{sf}

Never writes to /root/testdata (driver-owned, read-only).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDER_STATUS = ["O", "P", "F"]
ORDER_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_ADJ = ["large", "hot", "blue", "old", "cold", "small", "new", "red"]
PART_NOUN = ["ring", "bolt", "plate", "gear", "valve", "pipe", "wheel", "screw"]
PART_TYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
DOC_VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]

DAY_US = 86_400_000_000  # one day in microseconds


def _ts_us(iso_day: str) -> int:
    return np.datetime64(iso_day, "us").astype(np.int64)


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_col(epoch_us: np.ndarray) -> pa.Array:
    return pa.array(epoch_us, type=pa.timestamp("us"))


def generate(sf: float, outdir: str, seed: int = SEED) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    n_customer = max(15, int(150_000 * sf))
    n_supplier = max(10, int(10_000 * sf))
    n_part = max(20, int(200_000 * sf))
    n_orders = max(150, int(1_500_000 * sf))
    n_events = max(100, int(1_000_000 * sf))
    n_users = max(15, int(15_000 * sf))
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    # region / nation — fixed smalls
    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_customer), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_customer)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_customer), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_customer), 2),
        "c_mktsegment": pa.array(
            np.array(MKTSEGMENTS)[rng.integers(0, 5, n_customer)]),
    }))

    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supplier), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supplier)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supplier), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supplier), 2),
    }))

    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array(
            np.char.add("Brand#", rng.integers(0, 25, n_part).astype(str))),
        "p_type": pa.array(np.array(PART_TYPE)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) * 0.1, 2),
    }))

    odate = (
        _ts_us("1995-01-01")
        + rng.integers(0, 2405, n_orders) * DAY_US  # .. 2001-08-01
    )
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_customer, n_orders), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(ORDER_STATUS)[rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": _ts_col(odate),
        "o_orderpriority": pa.array(
            np.array(ORDER_PRIO)[rng.integers(0, 5, n_orders)]),
    }))

    # lineitem: Poisson(4) lines per order (orders with 0 lines simply
    # don't appear, matching the observed ~1.8% childless-order rate)
    fanout = rng.poisson(4.0, n_orders)
    l_orderkey = np.repeat(np.arange(n_orders), fanout)
    n_li = len(l_orderkey)
    sdate = (
        _ts_us("1995-01-02")
        + rng.integers(0, 2499, n_li) * DAY_US  # .. 2001-11-04
    )
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supplier, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(sdate),
    }))

    # events: exponential inter-arrivals over a 30-day window, sorted ts
    window_us = 30 * DAY_US
    gaps = rng.exponential(window_us / n_events, n_events)
    ts = _ts_us("2024-01-01") + np.cumsum(gaps).astype(np.int64)
    ts = np.minimum(ts, _ts_us("2024-01-31") - 1)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": _ts_col(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_events)]),
        "value": np.round(rng.exponential(50.0, n_events), 2),
        "props": pa.array(
            np.char.add(
                np.char.add('{"k": ', rng.integers(0, 100, n_events).astype(str)),
                "}")),
    }))

    # documents: 8..100 words from the 30-word vocab (avg ~54 words /
    # ~297 chars), lang mix 40/15/15/15/15, 20 sources, ~0.16% exact dups
    vocab = np.array(DOC_VOCAB)
    n_words = rng.integers(8, 101, n_docs)
    all_words = vocab[rng.integers(0, len(vocab), int(n_words.sum()))]
    bounds = np.cumsum(n_words)[:-1]
    texts = [" ".join(w) for w in np.split(all_words, bounds)]
    n_dup = max(2, int(0.0016 * n_docs))
    dup_to = rng.integers(0, n_docs, n_dup)
    dup_from = rng.integers(0, n_docs, n_dup)
    for a, b in zip(dup_to, dup_from):
        if a != b:
            texts[a] = texts[b]
    # the rare 'dup' marker token (~0.09% of tokens in driver data)
    for i in rng.integers(0, n_docs, max(1, n_docs // 20)):
        texts[i] = texts[i] + " dup"
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_docs, p=LANG_P)]),
        "source": pa.array(
            np.char.add("src", rng.integers(0, 20, n_docs).astype(str))),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm random 64-d float32, labels uniform 0..9
    V = rng.standard_normal((n_emb, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "testdata", f"sf{sf:g}")
    outdir = sys.argv[2] if len(sys.argv) > 2 else default
    real = os.path.realpath(outdir)
    if real.startswith("/root/testdata") or real.startswith("/root/reference"):
        raise SystemExit("refusing to write into driver-owned directories")
    print(f"generating sf={sf} -> {outdir}")
    generate(sf, outdir)


if __name__ == "__main__":
    main()
