/**
 * Unit tests for sanitize.ts / util.ts / otel.ts / header.ts — no
 * server needed (mirrors reference __test__/sanitize.test.ts and
 * util.test.ts coverage).
 */

import assert from "node:assert/strict";
import { test } from "node:test";
import {
  Field,
  FixedSizeList,
  Float32,
  Int32,
  Schema,
  Utf8,
} from "apache-arrow";
import {
  InMemoryMeter,
  instrumentLanceDbMetrics,
  packBits,
  resolveHeaders,
  sanitizeSchema,
  sanitizeType,
  StaticHeaderProvider,
  toSQL,
  TTLCache,
} from "../lancedb_tpu/index.js";

test("toSQL literals", () => {
  assert.equal(toSQL("o'brien"), "'o''brien'");
  assert.equal(toSQL(42), "42");
  assert.equal(toSQL(4.5), "4.5");
  assert.equal(toSQL(true), "TRUE");
  assert.equal(toSQL(null), "NULL");
  assert.equal(toSQL(123n), "123");
  assert.equal(toSQL([1, 2, 3]), "[1, 2, 3]");
  assert.equal(toSQL(new Uint8Array([0xde, 0xad])), "X'dead'");
  assert.ok(toSQL(new Date("2026-01-02T03:04:05Z")).startsWith("timestamp '2026-01-02"));
  assert.equal(toSQL(Number.NaN), "'NaN'");
});

test("packBits LSB-first", () => {
  assert.deepEqual(packBits([1, 0, 0, 0, 0, 0, 0, 0, 1]), [1, 1]);
  assert.deepEqual(packBits([0, 1, 1]), [6]);
});

test("TTLCache expires entries", async () => {
  const c = new TTLCache<string, number>(30);
  c.set("a", 1);
  assert.equal(c.get("a"), 1);
  await new Promise((r) => setTimeout(r, 60));
  assert.equal(c.get("a"), undefined);
  assert.equal(c.size, 0);
});

test("sanitizeSchema rebuilds duck-typed schemas", () => {
  // simulate a schema from a foreign apache-arrow copy: plain objects
  // carrying typeIds only
  const foreign = {
    fields: [
      { name: "id", type: { typeId: new Int32().typeId, bitWidth: 32, isSigned: true }, nullable: false },
      { name: "text", type: { typeId: new Utf8().typeId }, nullable: true },
      {
        name: "vector",
        type: {
          typeId: new FixedSizeList(2, new Field("item", new Float32())).typeId,
          listSize: 4,
          children: [
            { name: "item", type: { typeId: new Float32().typeId, precision: 1 }, nullable: true },
          ],
        },
        nullable: true,
      },
    ],
    metadata: { origin: "test" },
  };
  const schema = sanitizeSchema(foreign);
  assert.ok(schema instanceof Schema);
  assert.deepEqual(
    schema.fields.map((f) => f.name),
    ["id", "text", "vector"],
  );
  const fsl = schema.fields[2].type as FixedSizeList;
  assert.equal(fsl.listSize, 4);
  assert.equal(schema.metadata.get("origin"), "test");
  // a real instance passes through untouched
  assert.equal(sanitizeSchema(schema), schema);
});

test("sanitizeType rejects non-type objects", () => {
  assert.throws(() => sanitizeType({ notATypeId: 1 }));
});

test("header providers merge in order", async () => {
  const h = await resolveHeaders([
    new StaticHeaderProvider({ a: "1", b: "x" }),
    new StaticHeaderProvider({ b: "2" }),
  ]);
  assert.deepEqual(h, { a: "1", b: "2" });
});

test("otel instrumentation records counts and latency", () => {
  const meter = new InMemoryMeter();
  const obs = instrumentLanceDbMetrics(meter);
  obs.onRequest({
    method: "POST",
    path: "/v1/table/t/query",
    status: 200,
    durationMs: 12,
    attempt: 0,
    requestId: "r1",
  });
  obs.onRequest({
    method: "POST",
    path: "/v1/sql",
    status: 500,
    durationMs: 3,
    attempt: 1,
    requestId: "r2",
  });
  assert.equal(meter.total("lancedb.client.requests"), 2);
  assert.equal(meter.total("lancedb.client.errors"), 1);
  assert.equal(meter.histograms.get("lancedb.client.request_duration")!.length, 2);
});
