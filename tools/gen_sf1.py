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


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(421)
    pq.write_table(gen_documents(rng), os.path.join(OUT, "documents.parquet"),
                   row_group_size=8192)
    pq.write_table(gen_embeddings(rng), os.path.join(OUT, "embeddings.parquet"),
                   row_group_size=8192)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events"]:
        dst = os.path.join(OUT, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    print(f"wrote {OUT}: documents={N_DOCS}, embeddings={N_VECS}")


if __name__ == "__main__":
    main()
