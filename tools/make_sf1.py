"""Generate sf1 testdata (10x sf0.1) under testdata_sf1/.

The driver ships sf0.001/0.01/0.1 only; size-dependent behaviors
(binned quantiles, LSH collision rates, CMS error bounds, semantic-dedup
cluster sizes) deserve an order-of-magnitude-larger datapoint. This
generator reproduces the OBSERVED schema and distribution shape of the
driver's tables (inspected from /root/testdata/sf0.1 — row ratios,
value ranges, vocabulary, cluster structure, planted duplicates); it is
NOT the driver's generator, so sf1 numbers are comparable only to other
sf1 runs. Oracle parity (tools/driver_sim.py testdata_sf1) is
self-consistent regardless: Spark and DuckDB read the same files.

Deterministic: numpy PCG64(42). ~180 MB on disk. Usage:
    python tools/make_sf1.py [outdir=testdata_sf1] [--scale S]

--scale multiplies every table's row count (10 -> sf10, ~1.8 GB; used by
tools/bench_sf10.py for the second order-of-magnitude scaling datapoint).
Dimension-like vocabularies (regions, nations, segments, event types,
users, doc sources) deliberately stay fixed — scaling data under fixed
key cardinalities is exactly the 100 TB shape. The DOCUMENT WORD
vocabulary is the one exception: it grows ~sqrt(n_docs) (Heaps' law,
anchored at 30 words / 5k docs) because a fixed word list saturates the
trigram space and makes true near-dup pair density grow ~n^2 — a corpus
artifact, not an algorithm property (see the documents block below).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = 1.0
N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_DOCS = 50_000
N_EMB = 20_000
N_USERS = 15_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "en", "en", "en", "fr", "es", "de", "zh"]  # en ~40%
VOCAB = (
    "spark batch part line column order small sort fast value scan query "
    "agg table hash key group filter stream customer vector slow join "
    "shuffle merge index read write cache disk row"
).split()

DAY_US = 86_400_000_000


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def main(
    outdir: str = "testdata_sf1", scale: float = 1.0,
    tables: set | None = None,
) -> None:
    """``tables``: optional subset to generate (--tables documents,events)
    — the sf100 probe only needs the flagship queries' inputs, and the
    full fact tables at scale 100 (600M lineitem rows) would dominate
    generation time for nothing. Skipped blocks don't consume rng draws,
    so a subset run's tables differ from the same-scale full run's —
    fine for scaling probes (corpus LAWS are scale-determined), wrong
    for cross-run value comparison; don't mix subset and full corpora."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    def want(*names: str) -> bool:
        return tables is None or any(n in tables for n in names)
    N_CUSTOMER = int(globals()["N_CUSTOMER"] * scale)
    N_SUPPLIER = int(globals()["N_SUPPLIER"] * scale)
    N_PART = int(globals()["N_PART"] * scale)
    N_ORDERS = int(globals()["N_ORDERS"] * scale)
    N_EVENTS = int(globals()["N_EVENTS"] * scale)
    N_DOCS = int(globals()["N_DOCS"] * scale)
    N_EMB = int(globals()["N_EMB"] * scale)

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    if want("region", "nation"):
        w("region", pa.table({
            "r_regionkey": pa.array(range(5), type=pa.int32()),
            "r_name": REGIONS,
        }))
        w("nation", pa.table({
            "n_nationkey": pa.array(range(25), type=pa.int32()),
            "n_name": NATIONS,
            "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
        }))

    if want("customer"):
        ck = np.arange(N_CUSTOMER, dtype=np.int64)
        w("customer", pa.table({
            "c_custkey": ck,
            "c_name": [f"Customer#{i:09d}" for i in ck],
            "c_nationkey": rng.integers(0, 25, N_CUSTOMER).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUSTOMER), 2),
            "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, N_CUSTOMER)],
        }))

    if want("supplier"):
        sk = np.arange(N_SUPPLIER, dtype=np.int64)
        w("supplier", pa.table({
            "s_suppkey": sk,
            "s_name": [f"Supplier#{i:09d}" for i in sk],
            "s_nationkey": rng.integers(0, 25, N_SUPPLIER).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPPLIER), 2),
        }))

    if want("part"):
        pk = np.arange(N_PART, dtype=np.int64)
        tsel = rng.integers(0, len(TYPES), N_PART)
        w("part", pa.table({
            "p_partkey": pk,
            "p_name": [f"part {VOCAB[i % len(VOCAB)]} {VOCAB[(i * 7) % len(VOCAB)]}"
                       for i in pk],
            "p_brand": [BRANDS[i] for i in rng.integers(0, len(BRANDS), N_PART)],
            "p_type": [f"{TYPES[t]} ANODIZED" for t in tsel],
            "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
            "p_retailprice": np.round(900.0 + rng.uniform(0, 100, N_PART), 2),
        }))

    if want("orders", "lineitem"):
        ok = np.arange(N_ORDERS, dtype=np.int64)
        o_date_us = (
            np.datetime64("1995-01-01", "us").astype(np.int64)
            + rng.integers(0, 2404, N_ORDERS) * DAY_US
        )
        w("orders", pa.table({
            "o_orderkey": ok,
            "o_custkey": rng.integers(0, N_CUSTOMER, N_ORDERS),
            "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, N_ORDERS)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
            "o_orderdate": _ts_col(o_date_us),
            "o_orderpriority": [PRIORITIES[i]
                                for i in rng.integers(0, 5, N_ORDERS)],
        }))

    if want("lineitem"):
        # lineitem: 1-7 lines per order until the 6M target (TPC-H-ish)
        per_order = rng.integers(1, 8, N_ORDERS)
        l_orderkey = np.repeat(ok, per_order)
        n_li = len(l_orderkey)
        linenumber = np.concatenate([np.arange(1, c + 1) for c in per_order])
        ship_delay = rng.integers(1, 95, n_li) * DAY_US
        qty = rng.integers(1, 51, n_li).astype(np.float64)
        price = np.round(rng.uniform(900, 105000, n_li), 2)
        w("lineitem", pa.table({
            "l_orderkey": l_orderkey,
            "l_partkey": rng.integers(0, N_PART, n_li),
            "l_suppkey": rng.integers(0, N_SUPPLIER, n_li),
            "l_linenumber": linenumber.astype(np.int32),
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": np.where(
                rng.random(n_li) < 0.5, "N",
                np.where(rng.random(n_li) < 0.5, "A", "R")).tolist(),
            "l_linestatus": np.where(rng.random(n_li) < 0.5, "O", "F").tolist(),
            "l_shipdate": _ts_col(np.repeat(o_date_us, per_order) + ship_delay),
        }))

    if want("events"):
        ev_ts = (
            np.datetime64("2024-01-01", "us").astype(np.int64)
            + np.sort(rng.integers(0, 30 * DAY_US, N_EVENTS))
        )
        w("events", pa.table({
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            "ts": _ts_col(ev_ts),
            "user_id": rng.integers(0, N_USERS, N_EVENTS),
            "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, N_EVENTS)],
            "value": np.round(rng.exponential(50.0, N_EVENTS), 2),
            "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, N_EVENTS)],
        }))

    if want("documents"):
        # documents: 8-110 vocab words; ~0.2% planted exact duplicates.
        # Vocabulary grows with corpus size (Heaps' law, beta ~ 0.5, anchored
        # at the driver's observed 30 words / 5k docs at sf0.1): holding the
        # vocabulary FIXED while docs grow 100x saturates the 27k-trigram
        # space (every shingle df ~ n, true near-dup pair density ~ n^2) — a
        # corpus artifact no correct dedup algorithm can beat (the r11
        # BENCH_SF10 25.4x row). With Heaps growth the planted duplicates
        # (linear in n) dominate the pair space, so sf1->sf10 ratios measure
        # the ALGORITHM. Base words stay in-vocabulary so term-targeted
        # queries (BM25/TF-IDF 'table join spark') keep their hits.
        n_words = rng.integers(8, 111, N_DOCS)
        n_vocab = max(len(VOCAB),
                      int(round(len(VOCAB) * np.sqrt(N_DOCS / 5000.0))))
        vocab_arr = np.array(
            list(VOCAB) + [f"w{i:04d}" for i in range(n_vocab - len(VOCAB))]
        )
        texts = [" ".join(vocab_arr[rng.integers(0, n_vocab, k)])
                 for k in n_words]
        dup_src = rng.integers(0, N_DOCS, N_DOCS // 500)
        for j, src in enumerate(dup_src):
            texts[(src + 1 + j) % N_DOCS] = texts[src]
        w("documents", pa.table({
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": texts,
            "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), N_DOCS)],
            "source": [f"src{i}" for i in rng.integers(0, 20, N_DOCS)],
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }))

    if want("embeddings"):
        # embeddings: 10 unit-norm clusters, noise sigma 0.15, renormalized
        centers = rng.normal(size=(10, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, 10, N_EMB)
        vecs = centers[labels] + rng.normal(scale=0.15, size=(N_EMB, 64))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        w("embeddings", pa.table({
            "vec_id": np.arange(N_EMB, dtype=np.int64),
            "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                  type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }))


if __name__ == "__main__":
    args = sys.argv[1:]
    scale = 1.0
    tables = None
    if "--scale" in args:
        i = args.index("--scale")
        scale = float(args[i + 1])
        del args[i:i + 2]
    if "--tables" in args:
        i = args.index("--tables")
        tables = {t for t in args[i + 1].split(",") if t}
        del args[i:i + 2]
    main(args[0] if args else "testdata_sf1", scale=scale, tables=tables)
