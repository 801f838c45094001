/**
 * Jobs + SQL integration tests against a live lancedb-tpu server
 * (mirrors tests/test_remote.py TestRemoteJobs and the /v1/sql cases).
 */

import assert from "node:assert/strict";
import { test } from "node:test";
import { Table as ArrowTable } from "apache-arrow";
import { connect, Index, JobFailedError } from "../lancedb_tpu/index.js";

const URL = process.env.LANCEDB_TPU_URL ?? "http://127.0.0.1:8787";

function randVec(d: number, seed: number): number[] {
  let s = seed;
  return Array.from({ length: d }, () => {
    s = (s * 1103515245 + 12345) % 2147483648;
    return s / 2147483648 - 0.5;
  });
}

test("createIndexAsync returns a pollable job", async () => {
  const db = await connect(URL);
  await db.dropTable("jobs_t").catch(() => {});
  const rows = Array.from({ length: 600 }, (_, i) => ({
    id: i,
    vector: randVec(16, i + 1),
  }));
  const tbl = await db.createTable("jobs_t", rows);
  const job = await tbl.createIndexAsync(
    "vector",
    Index.ivfPq({ numPartitions: 4, numSubVectors: 4 }),
  );
  assert.ok(job.id);
  const info = await job.wait(120_000);
  assert.equal(info.status, "SUCCEEDED");
  assert.ok((await tbl.listIndices()).length >= 1);

  const listed = await db.listJobs();
  assert.ok(listed.some((j) => j.id === job.id));
  const hist = await db.jobHistory();
  assert.ok(hist.some((j) => j.id === job.id && j.status === "SUCCEEDED"));
});

test("failed job surfaces its error", async () => {
  const db = await connect(URL);
  await db.dropTable("jobs_f").catch(() => {});
  const tbl = await db.createTable(
    "jobs_f",
    Array.from({ length: 40 }, (_, i) => ({ id: i, vector: randVec(8, i + 1) })),
  );
  // num_sub_vectors does not divide dim → server-side build fails
  const job = await tbl.createIndexAsync(
    "vector",
    Index.ivfPq({ numPartitions: 2, numSubVectors: 7 }),
  );
  await assert.rejects(job.wait(60_000), JobFailedError);
  assert.equal(await job.status(), "FAILED");
});

test("sql SELECT with joins, windows, and CTEs", async () => {
  const db = await connect(URL);
  await db.dropTable("sql_emp").catch(() => {});
  await db.createTable("sql_emp", [
    { id: 0, dept: "a", salary: 10 },
    { id: 1, dept: "a", salary: 20 },
    { id: 2, dept: "b", salary: 5 },
    { id: 3, dept: "b", salary: 30 },
  ]);
  const grouped = (await db.sql(
    "SELECT dept, count(*) n FROM sql_emp GROUP BY dept ORDER BY dept",
  )) as ArrowTable;
  assert.deepEqual(
    [...grouped].map((r) => r!.toJSON()),
    [
      { dept: "a", n: 2 },
      { dept: "b", n: 2 },
    ],
  );
  const windowed = (await db.sql(
    "SELECT id, rank() OVER (PARTITION BY dept ORDER BY salary DESC) r " +
      "FROM sql_emp ORDER BY id",
  )) as ArrowTable;
  assert.deepEqual(
    [...windowed].map((r) => r!.toJSON().r),
    [2, 1, 2, 1],
  );
  const cte = (await db.sql(
    "WITH rich AS (SELECT id FROM sql_emp WHERE salary >= 20) SELECT count(*) n FROM rich",
  )) as ArrowTable;
  assert.equal([...cte][0]!.toJSON().n, 2);
  const plan = (await db.sql("EXPLAIN SELECT id FROM sql_emp WHERE salary > 5")) as string;
  assert.ok(plan.includes("ScanExec"));
});
