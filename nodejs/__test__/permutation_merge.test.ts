/**
 * PermutationBuilder + MergeInsertBuilder integration tests against a
 * live lancedb-tpu server (mirrors tests/test_remote.py
 * test_permutation_endpoint and test_merge_insert).
 */

import assert from "node:assert/strict";
import { test } from "node:test";
import { connect } from "../lancedb_tpu/index.js";

const URL = process.env.LANCEDB_TPU_URL ?? "http://127.0.0.1:8787";

function randVec(d: number, seed: number): number[] {
  let s = seed;
  return Array.from({ length: d }, () => {
    s = (s * 1103515245 + 12345) % 2147483648;
    return s / 2147483648 - 0.5;
  });
}

function rows(n: number, idBase = 0) {
  return Array.from({ length: n }, (_, i) => ({
    id: idBase + i,
    price: ((idBase + i) * 7) % 100,
    vector: randVec(8, idBase + i + 1),
  }));
}

test("permutation: random split + shuffle creates a split table", async () => {
  const db = await connect(URL);
  await db.dropTable("perm_src").catch(() => {});
  await db.dropTable("perm_out").catch(() => {});
  const tbl = await db.createTable("perm_src", rows(100));
  const res = await tbl
    .permutationBuilder()
    .persist("perm_out")
    .splitRandom({ ratios: [0.7, 0.3], seed: 7 })
    .shuffle({ seed: 3 })
    .execute();
  assert.equal(res.table, "perm_out");
  assert.equal(res.num_rows, 100);
  assert.equal(res.num_splits, 2);
  assert.equal(res.split_sizes["0"], 70);
  assert.equal(res.split_sizes["1"], 30);
  const perm = await db.openTable("perm_out");
  assert.equal(await perm.countRows(), 100);
});

test("permutation: calculated split + filter", async () => {
  const db = await connect(URL);
  await db.dropTable("perm_src2").catch(() => {});
  const tbl = await db.createTable("perm_src2", rows(80));
  const res = await tbl
    .permutationBuilder()
    .splitCalculated({ sql: "CASE WHEN price < 50 THEN 0 ELSE 1 END" })
    .filter("id >= 10")
    .execute();
  assert.equal(res.num_rows, 70);
  assert.equal(res.num_splits, 2);
});

test("mergeInsert builder: upsert matched + insert unmatched", async () => {
  const db = await connect(URL);
  await db.dropTable("merge_t").catch(() => {});
  const tbl = await db.createTable("merge_t", rows(10));
  // rows 5..14: 5 overlap (update), 5 new (insert)
  const stats = await tbl
    .mergeInsert("id")
    .whenMatchedUpdateAll()
    .whenNotMatchedInsertAll()
    .execute(rows(10, 5));
  assert.equal(await tbl.countRows(), 20);
  assert.ok(stats);
});

test("mergeInsert builder: whenNotMatchedBySourceDelete", async () => {
  const db = await connect(URL);
  await db.dropTable("merge_t2").catch(() => {});
  const tbl = await db.createTable("merge_t2", rows(10));
  await tbl
    .mergeInsert("id")
    .whenMatchedUpdateAll()
    .whenNotMatchedBySourceDelete()
    .execute(rows(5));
  assert.equal(await tbl.countRows(), 5);
});
