/**
 * Replays the shared protocol golden fixtures (protocol_fixtures.json)
 * against a live lancedb_tpu query server from node — the same file the
 * python suite replays in tests/test_protocol_golden.py, so the wire
 * contract is pinned identically on both sides of the SDK boundary.
 *
 * Needs a running server: set LANCEDB_TPU_SERVER_URL (the nodejs CI
 * workflow spawns `lancedb_tpu.remote.QueryServer` first).
 */
import { test } from "node:test";
import assert from "node:assert/strict";
import { readFileSync } from "node:fs";
import { fileURLToPath } from "node:url";
import { dirname, join } from "node:path";
import {
  tableFromArrays,
  tableToIPC,
  tableFromIPC,
  vectorFromArray,
  FixedSizeList,
  Field,
  Float32,
} from "apache-arrow";

const here = dirname(fileURLToPath(import.meta.url));
const fixtures = JSON.parse(
  readFileSync(join(here, "protocol_fixtures.json"), "utf8"),
);
const base = process.env.LANCEDB_TPU_SERVER_URL;

function toIpc(columns, vectorDim) {
  const cols = {};
  for (const [name, values] of Object.entries(columns)) {
    if (name === "vector" && vectorDim) {
      const type = new FixedSizeList(
        vectorDim,
        new Field("item", new Float32(), true),
      );
      cols[name] = vectorFromArray(
        values.map((row) => Float32Array.from(row)),
        type,
      );
    } else {
      cols[name] = vectorFromArray(values);
    }
  }
  return tableToIPC(tableFromArrays(cols), "stream");
}

function subst(template, saved) {
  return template.replace(/\$\{([^}]+)\}/g, (_, path) => {
    let cur = saved;
    for (const part of path.split(".")) {
      cur = Array.isArray(cur) ? cur[Number(part)] : cur[part];
    }
    return String(cur);
  });
}

test("protocol golden scenario replays against the server", {
  skip: base ? false : "LANCEDB_TPU_SERVER_URL not set",
}, async () => {
  const saved = {};
  for (const [i, entry] of fixtures.scenario.entries()) {
    const path = subst(entry.path, saved);
    let body;
    const headers = {};
    if (entry.arrow_columns) {
      body = toIpc(entry.arrow_columns, entry.vector_dim);
      headers["content-type"] = "application/vnd.apache.arrow.stream";
    } else if (entry.json !== undefined) {
      body = subst(JSON.stringify(entry.json), saved);
      headers["content-type"] = "application/json";
    }
    const resp = await fetch(base.replace(/\/$/, "") + path, {
      method: entry.method,
      headers,
      body,
    });
    const want = Array.isArray(entry.expect_status)
      ? entry.expect_status
      : [entry.expect_status];
    const payload = Buffer.from(await resp.arrayBuffer());
    assert.ok(
      want.includes(resp.status),
      `[${i}] ${entry.op} ${path}: status ${resp.status} not in ${want}: ` +
        payload.subarray(0, 200).toString(),
    );
    if (resp.status >= 300) continue;
    if (entry.expect_arrow) {
      const tbl = tableFromIPC(payload);
      if (entry.expect_rows !== undefined) {
        assert.equal(tbl.numRows, entry.expect_rows, `[${i}] ${entry.op} rows`);
      }
    } else {
      const decoded = payload.length ? JSON.parse(payload.toString()) : null;
      for (const key of entry.expect_keys ?? []) {
        assert.ok(
          decoded && key in decoded,
          `[${i}] ${entry.op}: key ${key} missing`,
        );
      }
      if (entry.expect_value !== undefined) {
        assert.deepEqual(decoded, entry.expect_value, `[${i}] ${entry.op}`);
      }
      if (entry.save_as) saved[entry.save_as] = decoded;
    }
  }
});
