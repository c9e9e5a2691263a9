#!/usr/bin/env python3
"""Generate an sf1-shaped documents/embeddings fixture for the local
scale-slope measurement (VERDICT r10 #5, r8 advice #3).

10x the sf0.1 row counts (documents 5,000 -> 50,000; embeddings
2,000 -> 20,000), same schemas, same value distributions (vocab,
doc-length range, lang mix, source cardinality, label count, embedding
scale), and the same KINDS of planted structure the dedup/similarity
queries exercise: exact-dup groups (~1/625 docs), shingle-level
near-dups (~1/20 docs), and embedding near-dup pairs (~1/50 vecs)
around label-clustered centroids.

Deterministic (fixed seed). Writes to fixture_cache/sf1/ (gitignored)
and symlinks every other table from /root/testdata/sf0.1 so warmup and
whole-catalog code paths still resolve; /root/testdata is never touched.
"""
import os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixture_cache", "sf1")
SRC = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_VECS = 20_000
DIMS = 64

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.412, 0.147, 0.147, 0.147, 0.147]


def gen_documents(rng):
    texts = []
    for i in range(N_DOCS):
        target = int(rng.integers(44, 578))
        ws, ln = [], 0
        while ln < target:
            w = VOCAB[int(rng.integers(0, len(VOCAB)))]
            ws.append(w)
            ln += len(w) + 1
        texts.append(" ".join(ws))
    # planted structure AFTER base generation so ids stay stable:
    for i in range(N_DOCS):
        if i % 20 == 13 and i >= 13:  # near-dup: 2 word substitutions
            src = texts[i - 13].split(" ")
            for k in (3, 11):
                if len(src) > k:
                    src[k] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts[i] = " ".join(src)
        if i % 625 == 624:  # exact dup group
            texts[i] = texts[i - 624]
    lang = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng):
    centroids = rng.normal(0.0, 0.09, (10, DIMS))
    label = rng.integers(0, 10, N_VECS)
    vecs = centroids[label] + rng.normal(0.0, 0.07, (N_VECS, DIMS))
    for i in range(N_VECS):  # embedding near-dup pairs
        if i % 50 == 49:
            label[i] = label[i - 1]
            vecs[i] = vecs[i - 1] + rng.normal(0.0, 0.003, DIMS)
    vecs = vecs.astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(N_VECS), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32()),
    })


N_EVENTS = 1_000_000   # sf0.1: 100,000
N_USERS = 15_000       # sf0.1: 1,500 (events/user constant -- users scale,
                       # per-user history does not: the right model for a
                       # per-user-window workload like q138)
N_LINES = 6_000_000    # sf0.1: 600,000


def gen_events(rng):
    """sf1-shaped events: same schema (event_id, ts us, user_id,
    event_type, value, props) and same value distributions as the sf0.1
    fixture -- uniform types, 30-day ascending timestamps, 2-decimal
    values, tiny JSON props."""
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, N_EVENTS)) + base_us
    types = np.array(["view", "click", "purchase", "signup", "error"])
    vals = np.round(rng.uniform(0.0, 560.0, N_EVENTS), 2)
    return pa.table({
        "event_id": pa.array(range(N_EVENTS), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, N_EVENTS)], pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)],
                          pa.string()),
    })


def gen_lineitem(rng):
    """sf1-shaped lineitem: 10x rows, 10x order/part key domains (suppkey
    domain 10x too), same column types (shipdate stays timestamp[us]) and
    per-column value ranges as sf0.1."""
    order = np.arange(N_LINES) // 4
    linenum = (np.arange(N_LINES) % 4 + 1).astype("int32")
    day_us = 24 * 3600 * 1_000_000
    base_us = np.datetime64("1995-01-02T00:00:00", "us").astype("int64")
    ship = rng.integers(0, 2500, N_LINES) * day_us + base_us
    return pa.table({
        "l_orderkey": pa.array(order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 200_000, N_LINES), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, 10_000, N_LINES), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, N_LINES).astype("float64"),
                               pa.float64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 105_000.0, N_LINES), 2),
                                    pa.float64()),
        "l_discount": pa.array(rng.integers(0, 11, N_LINES) / 100.0, pa.float64()),
        "l_tax": pa.array(rng.integers(0, 9, N_LINES) / 100.0, pa.float64()),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, N_LINES)],
                                 pa.string()),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, N_LINES)],
                                 pa.string()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    })


N_PARTS = 200_000     # sf0.1: 20,000 (lineitem sf1 draws l_partkey in [0, 200k))
N_ORDERS = 1_500_000  # sf0.1: 150,000 (lineitem sf1 l_orderkey domain)
N_CUSTS = 150_000     # sf0.1: 15,000

ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def gen_part(rng):
    """sf1-shaped part: 10x rows, SAME vocabulary sizes as sf0.1 (64
    names, 25 brands, 6 types) — name diversity deliberately does NOT
    scale, which is exactly the property q154's blocked-pair growth
    term needs to exercise. p_retailprice keeps sf0.1's deterministic
    900 + (key % 1000)/10 ramp."""
    keys = np.arange(N_PARTS)
    names = [f"{ADJS[int(a)]} {NOUNS[int(b)]}" for a, b in
             zip(rng.integers(0, 8, N_PARTS), rng.integers(0, 8, N_PARTS))]
    return pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array(names, pa.string()),
        "p_brand": pa.array([f"Brand#{int(x)}" for x in
                             rng.integers(1, 26, N_PARTS)], pa.string()),
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, 6, N_PARTS)],
                           pa.string()),
        "p_size": pa.array(rng.integers(1, 51, N_PARTS).astype("int32"),
                           pa.int32()),
        "p_retailprice": pa.array(900.0 + (keys % 1000) / 10.0, pa.float64()),
    })


def gen_orders(rng):
    """sf1-shaped orders: dense orderkeys matching sf1 lineitem's
    l_orderkey domain, custkeys over the sf1 customer domain, same
    date span / status / priority mix as sf0.1."""
    day_us = 24 * 3600 * 1_000_000
    base_us = np.datetime64("1995-01-01T00:00:00", "us").astype("int64")
    dates = rng.integers(0, 2405, N_ORDERS) * day_us + base_us
    return pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUSTS, N_ORDERS), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[
            rng.integers(0, 3, N_ORDERS)], pa.string()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000.0, 500_000.0, N_ORDERS), 2), pa.float64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[
            rng.integers(0, 5, N_ORDERS)], pa.string()),
    })


def gen_customer(rng):
    return pa.table({
        "c_custkey": pa.array(np.arange(N_CUSTS), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUSTS)],
                           pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUSTS).astype("int32"),
                                pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000.0, 10_000.0, N_CUSTS), 2),
                              pa.float64()),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[
            rng.integers(0, 5, N_CUSTS)], pa.string()),
    })


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(421)
    # generation ORDER is part of the fixture contract: documents and
    # embeddings consume the rng stream first, so adding events/lineitem
    # afterwards leaves the r11-measured tables bit-identical
    pq.write_table(gen_documents(rng), os.path.join(OUT, "documents.parquet"),
                   row_group_size=8192)
    pq.write_table(gen_embeddings(rng), os.path.join(OUT, "embeddings.parquet"),
                   row_group_size=8192)
    for name, gen in [("events", gen_events), ("lineitem", gen_lineitem)]:
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.islink(dst):
            os.remove(dst)  # r12 symlinked these to sf0.1; now generated
        if not os.path.exists(dst):
            pq.write_table(gen(rng), dst, row_group_size=65536)
    # part/orders/customer each get their OWN seed (ADVICE r14): a stream
    # shared across the group reintroduces the lazy-position flaw WITHIN
    # it — if a strict subset of the three files exists (interrupted run),
    # the rerun consumes the stream from a different position than a
    # from-scratch run. Per-table seeds make every table's bytes a
    # function of its own seed only, so incremental == from-scratch
    # regardless of which files survive. (Changes orders/customer bytes
    # vs the r14 shared-stream layout; distributions are identical.)
    for idx, (name, gen) in enumerate([("part", gen_part), ("orders", gen_orders),
                                       ("customer", gen_customer)]):
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.islink(dst):
            os.remove(dst)  # symlinked to sf0.1 through r13; now generated
        if not os.path.exists(dst):
            pq.write_table(gen(np.random.default_rng(1421 + idx)), dst,
                           row_group_size=65536)
    for name in ["region", "nation", "supplier"]:
        dst = os.path.join(OUT, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    print(f"wrote {OUT}: documents={N_DOCS}, embeddings={N_VECS}, "
          f"events={N_EVENTS}, lineitem={N_LINES}, part={N_PARTS}, "
          f"orders={N_ORDERS}, customer={N_CUSTS}")


if __name__ == "__main__":
    main()
