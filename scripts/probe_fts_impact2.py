"""A/B the 2-term stratified scorer (ldb_bm25_impact2_topk) against the
DAAT MaxScore path on the bench's common-term worst case, using the
cached fts1m table. Host-only — no TPU needed."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import lancedb_tpu
from lancedb_tpu.index.fts import ColumnFtsIndex

d = "/root/repo/.bench_cache/fts1m-v1"
t = lancedb_tpu.connect(d).open_table("fts_bench")

qrng = np.random.default_rng(2042)
qterms = [f"w{r}" for r in qrng.integers(50, 2000, size=200)]
queries = [f"{qterms[2 * i]} {qterms[2 * i + 1]}" for i in range(100)]
common = [f"w{r} w{r + 1}" for r in qrng.integers(0, 30, size=50)]


def run(label, qs):
    for qq in qs[:3]:
        t.search(qq, query_type="fts").limit(10).to_arrow()
    t0 = time.perf_counter()
    for qq in qs:
        t.search(qq, query_type="fts").limit(10).to_arrow()
    qps = len(qs) / (time.perf_counter() - t0)
    print(f"{label}: {qps:.1f} qps")
    return qps


def results(qs):
    out = []
    for qq in qs:
        a = t.search(qq, query_type="fts").limit(10).to_arrow()
        out.append((list(a["id"].to_pylist()), [round(float(x), 4) for x in a["_score"].to_pylist()]))
    return out


orig2 = ColumnFtsIndex.IMPACT2_MIN_POSTINGS
orig1 = ColumnFtsIndex.IMPACT_MIN_POSTINGS

# force DAAT
ColumnFtsIndex.IMPACT2_MIN_POSTINGS = 1 << 60
ColumnFtsIndex.IMPACT_MIN_POSTINGS = 1 << 60
daat_common = run("DAAT  common", common)
daat_mix = run("DAAT  mixed ", queries)
r_daat = results(common)

# stratified pair scorer
ColumnFtsIndex.IMPACT2_MIN_POSTINGS = orig2
ColumnFtsIndex.IMPACT_MIN_POSTINGS = orig1
s_common = run("STRAT common", common)
s_mix = run("STRAT mixed ", queries)
r_strat = results(common)

bad = 0
for i, (a, b) in enumerate(zip(r_daat, r_strat)):
    sa, sb = a[1], b[1]
    if any(abs(x - y) > 1e-3 for x, y in zip(sa, sb)):
        bad += 1
        if bad <= 3:
            print("MISMATCH", common[i], a, b)
print(f"score agreement: {len(common) - bad}/{len(common)}")
print(f"speedup common: {s_common / daat_common:.2f}x  mixed: {s_mix / daat_mix:.2f}x")
