/**
 * Fixture-coverage gate, TS side (mirrors the python-side check in
 * tests/test_protocol_golden.py::test_every_ts_op_has_a_fixture): scan
 * the TS sources for every table-op literal sent to
 * /v1/table/{t}/{op} and fail if any op lacks an entry in the shared
 * protocol golden fixtures. Runs without a server or a build — pure
 * source + JSON — so `npm test` (and the nodejs CI job) fails the
 * moment a TS module grows an endpoint the wire contract doesn't pin.
 */
import { readFileSync, readdirSync } from "node:fs";
import { fileURLToPath } from "node:url";
import { dirname, join } from "node:path";

const here = dirname(fileURLToPath(import.meta.url));
const srcDir = join(here, "..", "lancedb_tpu");
const fixturesPath = join(here, "..", "__test__", "protocol_fixtures.json");

const fixtures = JSON.parse(readFileSync(fixturesPath, "utf8"));
const fixtureOps = new Set(fixtures.scenario.map((e) => e.op));

// same extraction patterns as the python twin — keep in lockstep
const patterns = [
  /this\.p\("([a-z_]+)"\)/g,
  /(?<![\w.])p\("([a-z_]+)"\)/g,
  /(?<![\w.])p\(`([a-z_]+)`\)/g,
];

const tsOps = new Set();
for (const f of readdirSync(srcDir)) {
  if (!f.endsWith(".ts")) continue;
  const src = readFileSync(join(srcDir, f), "utf8");
  for (const pat of patterns) {
    for (const m of src.matchAll(pat)) tsOps.add(m[1]);
  }
}

if (tsOps.size === 0) {
  console.error("no ops extracted from the TS sources — regex drift?");
  process.exit(1);
}

const missing = [...tsOps].filter((op) => !fixtureOps.has(op)).sort();
if (missing.length) {
  console.error(
    `TS ops without protocol fixtures: ${missing.join(", ")}\n` +
      "add matching entries to __test__/protocol_fixtures.json (and a " +
      "server handler) before shipping the endpoint.",
  );
  process.exit(1);
}

console.log(
  `fixture coverage ok: ${tsOps.size} TS ops all pinned ` +
    `(${fixtureOps.size} fixtures total)`,
);
