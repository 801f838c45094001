/**
 * Integration test against a live lancedb-tpu query server.
 *
 * Start the server first:
 *   python -m lancedb_tpu.remote.server /tmp/tsdb --port 8787
 * then:
 *   LANCEDB_TPU_URL=http://127.0.0.1:8787 npm test
 *
 * (node is not available in the build image; this suite documents and
 * validates the client whenever a node toolchain is present.)
 */

import assert from "node:assert/strict";
import { test } from "node:test";
import { connect, Index } from "../lancedb_tpu/index.js";

const URL = process.env.LANCEDB_TPU_URL ?? "http://127.0.0.1:8787";

function randVec(d: number, seed: number): number[] {
  let s = seed;
  return Array.from({ length: d }, () => {
    s = (s * 1103515245 + 12345) % 2147483648;
    return s / 2147483648 - 0.5;
  });
}

test("end-to-end table lifecycle", async () => {
  const db = await connect(URL);
  const rows = Array.from({ length: 300 }, (_, i) => ({
    id: i,
    label: `item-${i % 5}`,
    vector: randVec(16, i + 1),
  }));
  const tbl = await db.createTable("ts_test", rows);

  assert.ok((await db.tableNames()).includes("ts_test"));
  assert.equal(await tbl.countRows(), 300);
  assert.equal(await tbl.countRows("id < 10"), 10);

  // vector search, filtered
  const hits = await tbl.search(rows[7].vector).limit(5).toArray();
  assert.equal(hits[0].id, 7);
  const filtered = await tbl
    .search(rows[7].vector)
    .where("label = 'item-2'")
    .limit(5)
    .toArray();
  for (const h of filtered) assert.equal(h.label, "item-2");

  // index build + search again
  await tbl.createIndex("vector", Index.ivfPq({ numPartitions: 4, numSubVectors: 4 }));
  const indices = await tbl.listIndices();
  assert.ok(indices.length >= 1);
  const hits2 = await tbl
    .search(rows[7].vector)
    .nprobes(4)
    .refineFactor(5)
    .limit(3)
    .toArray();
  assert.equal(hits2[0].id, 7);

  // plain scan
  const scan = await tbl.query().where("id >= 290").limit(100).toArray();
  assert.equal(scan.length, 10);

  // mutation
  await tbl.update({ label: "'updated'" }, "id = 0");
  assert.equal(await tbl.countRows("label = 'updated'"), 1);
  assert.equal(await tbl.delete("id = 299"), 1);
  assert.equal(await tbl.countRows(), 299);

  // versioning
  const versions = await tbl.listVersions();
  assert.ok(versions.length >= 2);
  await tbl.tags.create("before-drop");
  assert.ok("before-drop" in (await tbl.tags.list()));

  await db.dropTable("ts_test");
  assert.ok(!(await db.tableNames()).includes("ts_test"));
});

test("embeddings registry + auto-embedding create", async () => {
  const { getRegistry } = await import("../lancedb_tpu/embeddings.js");
  const reg = getRegistry();
  assert.ok(reg.list().includes("openai"));
  assert.ok(reg.list().includes("hash"));
  const db = await connect(URL);
  const tbl = await db.createTable(
    `emb_${Date.now()}`,
    [{ text: "alpha" }, { text: "bravo" }, { text: "charlie" }],
    {
      embeddingFunctions: [
        { sourceColumn: "text", functionName: "hash", config: { ndims: 8 } },
      ],
    },
  );
  const fns = await tbl.embeddingFunctions();
  assert.equal(fns.size, 1);
  const q = await tbl.searchText("bravo");
  const hits = await q.limit(1).toArray();
  assert.equal(hits[0].text, "bravo");
});

test("hybrid search with RRF", async () => {
  const { RRFReranker } = await import("../lancedb_tpu/rerankers.js");
  const db = await connect(URL);
  const name = `hyb_${Date.now()}`;
  const tbl = await db.createTable(
    name,
    Array.from({ length: 30 }, (_, i) => ({
      id: i,
      text: `document ${i} about topic${i % 3}`,
      vector: randVec(8, i),
    })),
  );
  await tbl.createIndex("text", Index.fts());
  const hq = await tbl.hybridSearch("topic1", { vector: randVec(8, 4) });
  const rows = await hq.rerank(new RRFReranker()).limit(5).toArray();
  assert.ok(rows.length > 0);
  assert.ok("_relevance_score" in rows[0]);
});

test("orderBy, batches, schema evolution, multipart", async () => {
  const db = await connect(URL);
  const name = `misc_${Date.now()}`;
  const tbl = await db.createTable(
    name,
    Array.from({ length: 50 }, (_, i) => ({ id: i, vector: randVec(4, i) })),
  );
  const ordered = await tbl.query().orderBy(["id", "desc"]).limit(5).toArray();
  assert.equal(ordered[0].id, 49);
  let rows = 0;
  for await (const b of tbl.query().limit(50).toBatches(16)) {
    assert.ok(b.numRows <= 16);
    rows += b.numRows;
  }
  assert.equal(rows, 50);
  await tbl.addColumns({ doubled: "id * 2" });
  const withCol = await tbl.query().select(["id", "doubled"]).limit(1).toArray();
  assert.equal(withCol[0].doubled, Number(withCol[0].id) * 2);
  await tbl.addLarge(
    Array.from({ length: 25 }, (_, i) => ({
      id: 100 + i,
      doubled: 0,
      vector: randVec(4, 100 + i),
    })),
    10,
  );
  assert.equal(await tbl.countRows(), 75);
});
