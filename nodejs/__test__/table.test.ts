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
