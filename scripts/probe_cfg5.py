"""Probe BASELINE config #5's single-chip slice: FTS BM25 top-k QPS on
a 1M-doc corpus + hybrid (vector+FTS+RRF) QPS through the public API.
CPU-runnable (FTS is the host/native-C++ path); hybrid's vector leg
uses whatever backend is active."""

import sys
import time

import numpy as np

N_DOCS = 1_000_000
N_HYBRID = 100_000
DIM = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(rng, n):
    """Zipf-ish synthetic text: 30k-word vocabulary, 8-word docs."""
    vocab_n = 30_000
    # zipf ranks: common words appear in many docs, tail words are rare
    ranks = rng.zipf(1.3, size=n * 8)
    ranks = np.clip(ranks, 1, vocab_n) - 1
    words = np.char.add("w", ranks.astype("U6"))
    docs = words.reshape(n, 8)
    return [" ".join(row) for row in docs]


def bench_fts(db, rng) -> dict:
    out = {}
    t0 = time.perf_counter()
    docs = make_corpus(rng, N_DOCS)
    log(f"corpus gen {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    t = db.create_table("fts_bench", {"id": np.arange(N_DOCS), "text": docs})
    log(f"table create {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    t.create_fts_index("text", with_position=True)
    out["fts_build_seconds"] = round(time.perf_counter() - t0, 1)
    log(f"fts build {out['fts_build_seconds']}s")

    # query mix: mid-frequency two-term OR queries (the BM25 top-k load)
    qterms = [f"w{r}" for r in rng.integers(50, 2000, size=200)]
    queries = [f"{qterms[2 * i]} {qterms[2 * i + 1]}" for i in range(100)]
    for q in queries[:3]:
        t.search(q, query_type="fts").limit(10).to_arrow()  # warm
    t0 = time.perf_counter()
    for q in queries:
        t.search(q, query_type="fts").limit(10).to_arrow()
    dt = time.perf_counter() - t0
    out["fts_bm25_top10_qps"] = round(len(queries) / dt, 1)
    log(f"BM25 OR top-10: {out['fts_bm25_top10_qps']} qps")

    phrases = [f'"{qterms[2 * i]} {qterms[2 * i + 1]}"' for i in range(50)]
    t0 = time.perf_counter()
    for q in phrases:
        t.search(q, query_type="fts").limit(10).to_arrow()
    out["fts_phrase_qps"] = round(len(phrases) / (time.perf_counter() - t0), 1)
    log(f"phrase top-10: {out['fts_phrase_qps']} qps")
    return out


def bench_hybrid(db, rng) -> dict:
    out = {}
    vecs = rng.standard_normal((N_HYBRID, DIM)).astype(np.float32)
    docs = make_corpus(rng, N_HYBRID)
    t = db.create_table("hybrid_bench", {
        "id": np.arange(N_HYBRID), "text": docs, "vector": list(vecs),
    })
    t0 = time.perf_counter()
    t.create_fts_index("text", with_position=False)
    t.create_index(index_type="IVF_PQ", num_partitions=256, num_sub_vectors=32,
                   num_bits=4)
    out["hybrid_build_seconds"] = round(time.perf_counter() - t0, 1)
    log(f"hybrid build {out['hybrid_build_seconds']}s")
    qv = vecs[rng.integers(0, N_HYBRID, 64)] + 0.05 * rng.standard_normal(
        (64, DIM)).astype(np.float32)
    qt = [f"w{r} w{r + 3}" for r in rng.integers(50, 2000, size=64)]
    # warm
    t.search((qv[0], qt[0]), query_type="hybrid").limit(10).to_arrow()
    t0 = time.perf_counter()
    for i in range(64):
        t.search((qv[i], qt[i]), query_type="hybrid").limit(10).to_arrow()
    out["hybrid_rrf_qps"] = round(64 / (time.perf_counter() - t0), 1)
    log(f"hybrid RRF top-10: {out['hybrid_rrf_qps']} qps")
    return out


def main():
    import json

    import lancedb_tpu

    rng = np.random.default_rng(5)
    db = lancedb_tpu.connect("memory://cfg5")
    details = {}
    details.update(bench_fts(db, rng))
    details.update(bench_hybrid(db, rng))
    print(json.dumps(details))


if __name__ == "__main__":
    main()
