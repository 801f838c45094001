/**
 * Query-surface integration tests against a live lancedb-tpu server
 * (mirrors tests/test_remote.py query cases).
 *
 *   python -m lancedb_tpu.remote.server /tmp/tsdb --port 8787
 *   LANCEDB_TPU_URL=http://127.0.0.1:8787 npm test
 */

import assert from "node:assert/strict";
import { test } from "node:test";
import {
  BooleanQuery,
  connect,
  Index,
  MatchQuery,
  MultiMatchQuery,
  PhraseQuery,
} from "../lancedb_tpu/index.js";

const URL = process.env.LANCEDB_TPU_URL ?? "http://127.0.0.1:8787";

function randVec(d: number, seed: number): number[] {
  let s = seed;
  return Array.from({ length: d }, () => {
    s = (s * 1103515245 + 12345) % 2147483648;
    return s / 2147483648 - 0.5;
  });
}

test("vector query knobs: distance range, orderBy, select, offset", async () => {
  const db = await connect(URL);
  await db.dropTable("q_knobs").catch(() => {});
  const rows = Array.from({ length: 200 }, (_, i) => ({
    id: i,
    group: i % 4,
    vector: randVec(8, i + 1),
  }));
  const tbl = await db.createTable("q_knobs", rows);

  const sel = await tbl.search(rows[3].vector).limit(5).select(["id"]).toArray();
  assert.deepEqual(Object.keys(sel[0]).sort(), ["_distance", "id"]);

  const ranged = await tbl
    .search(rows[3].vector)
    .distanceRange(undefined, 0.05)
    .limit(50)
    .toArray();
  for (const r of ranged) assert.ok((r._distance as number) <= 0.05);

  const scan = await tbl.query().orderBy(["id", "desc"]).limit(3).toArray();
  assert.deepEqual(
    scan.map((r) => r.id),
    [199, 198, 197],
  );

  const page2 = await tbl.query().orderBy("id").offset(10).limit(5).toArray();
  assert.equal(page2[0].id, 10);
});

test("structured FTS AST: match / phrase / boolean / multi-match", async () => {
  const db = await connect(URL);
  await db.dropTable("q_fts").catch(() => {});
  const tbl = await db.createTable("q_fts", [
    { id: 1, text: "the quick brown fox", title: "fox" },
    { id: 2, text: "lazy dog sleeps", title: "dog" },
    { id: 3, text: "quick dog runs", title: "dog" },
    { id: 4, text: "brown bear", title: "bear" },
  ]);
  await tbl.createFtsIndex(["text", "title"]);

  const boolHits = await tbl
    .search(
      new BooleanQuery([
        ["MUST", new MatchQuery("quick", "text")],
        ["MUST_NOT", new MatchQuery("fox", "text")],
      ]),
    )
    .limit(5)
    .toArray();
  assert.deepEqual(
    boolHits.map((r) => r.id),
    [3],
  );

  const phraseHits = await tbl
    .search(new PhraseQuery("brown fox", "text"))
    .limit(5)
    .toArray();
  assert.deepEqual(
    phraseHits.map((r) => r.id),
    [1],
  );

  const multiHits = await tbl
    .search(new MultiMatchQuery("dog", ["text", "title"]))
    .limit(5)
    .toArray();
  assert.deepEqual(new Set(multiHits.map((r) => r.id)), new Set([2, 3]));

  // operator sugar composes clauses
  const composed = await tbl
    .search(new MatchQuery("quick", "text").and(new MatchQuery("runs", "text")))
    .limit(5)
    .toArray();
  assert.deepEqual(
    composed.map((r) => r.id),
    [3],
  );
});

test("hybrid search reranks vector + fts legs", async () => {
  const db = await connect(URL);
  await db.dropTable("q_hybrid").catch(() => {});
  const rows = Array.from({ length: 50 }, (_, i) => ({
    id: i,
    text: i === 7 ? "relevant document seven" : `filler number ${i}`,
    vector: randVec(8, i + 1),
  }));
  const tbl = await db.createTable("q_hybrid", rows);
  await tbl.createFtsIndex("text");
  const hy = await tbl.hybridSearch("relevant seven", { vector: rows[7].vector });
  const hits = await hy.limit(5).toArray();
  assert.equal(hits[0].id, 7);
  assert.ok("_relevance_score" in hits[0]);
});

test("nprobes bounds + ef reach the plan; multi-vector union tags query_index", async () => {
  const db = await connect(URL);
  await db.dropTable("q_np").catch(() => {});
  const rows = Array.from({ length: 300 }, (_, i) => ({
    id: i,
    vector: randVec(8, i + 1),
  }));
  const tbl = await db.createTable("q_np", rows);
  await tbl.createIndex("vector", Index.ivfFlat({ numPartitions: 8 }));

  const plan = await tbl
    .search(rows[0].vector)
    .minimumNprobes(2)
    .maximumNprobes(6)
    .explainPlan();
  assert.ok(plan.includes("nprobes=2..6"));
  const plan2 = await tbl.search(rows[0].vector).nprobes(4).ef(37).explainPlan();
  assert.ok(plan2.includes("ef=37"));

  const multi = await tbl
    .search(rows[3].vector)
    .addQueryVector(rows[9].vector)
    .limit(2)
    .toArray();
  const byQuery = new Map<number, number[]>();
  for (const r of multi) {
    const qi = Number(r.query_index);
    byQuery.set(qi, [...(byQuery.get(qi) ?? []), Number(r.id)]);
  }
  assert.equal(byQuery.get(0)?.[0], 3);
  assert.equal(byQuery.get(1)?.[0], 9);
});

test("batched hybrid: addQuery fuses per query with query_index", async () => {
  const db = await connect(URL);
  await db.dropTable("q_hybrid_batch").catch(() => {});
  const rows = Array.from({ length: 60 }, (_, i) => ({
    id: i,
    text:
      i === 7
        ? "relevant document seven"
        : i === 21
          ? "special item twentyone"
          : `filler number ${i}`,
    vector: randVec(8, i + 1),
  }));
  const tbl = await db.createTable("q_hybrid_batch", rows);
  await tbl.createFtsIndex("text");
  const hy = await tbl.hybridSearch("relevant seven", { vector: rows[7].vector });
  hy.addQuery(rows[21].vector, "special twentyone").limit(3);
  const hits = await hy.toArray();
  const byQuery = new Map<number, unknown[]>();
  for (const r of hits) {
    const qi = Number(r.query_index);
    byQuery.set(qi, [...(byQuery.get(qi) ?? []), r.id]);
  }
  assert.equal(byQuery.get(0)?.[0], 7);
  assert.equal(byQuery.get(1)?.[0], 21);
});

test("explain and analyze plans render", async () => {
  const db = await connect(URL);
  await db.dropTable("q_plan").catch(() => {});
  const rows = Array.from({ length: 300 }, (_, i) => ({
    id: i,
    vector: randVec(8, i + 1),
  }));
  const tbl = await db.createTable("q_plan", rows);
  await tbl.createIndex("vector", Index.ivfPq({ numPartitions: 4, numSubVectors: 4 }));
  const plan = await tbl.explainPlan(rows[0].vector, 5);
  assert.ok(plan.length > 0);
  const analyzed = await tbl.analyzePlan(rows[0].vector, 5, "full");
  assert.ok(analyzed.includes("worker") || analyzed.length > 0);
});
