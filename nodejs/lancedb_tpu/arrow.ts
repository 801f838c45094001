/**
 * Arrow data sanitization — the TS-side data-ingestion contract
 * (reference nodejs arrow.ts: makeArrowTable / vector column inference /
 * fixed-size-list promotion / schema alignment).
 *
 * JS callers hand us plain row objects, column objects, typed arrays,
 * or a prebuilt Arrow table; everything normalizes to an Arrow table
 * whose numeric-array columns of uniform length become
 * FixedSizeList<Float32> vector columns (what the server's vector
 * search expects).
 */

import {
  Table as ArrowTable,
  Field,
  FixedSizeList,
  Float32,
  Schema,
  Vector,
  tableFromArrays,
  tableFromJSON,
  vectorFromArray,
} from "apache-arrow";

export type RowData = Record<string, unknown>[];
export type ColumnData = Record<string, unknown[] | Float32Array | Float64Array>;

/** True if every element is a numeric array of the same length ≥ 1. */
function isVectorColumn(values: unknown[]): values is number[][] {
  if (values.length === 0) return false;
  const first = values[0];
  const len =
    Array.isArray(first) || ArrayBuffer.isView(first)
      ? (first as ArrayLike<number>).length
      : -1;
  if (len < 1) return false;
  return values.every(
    (v) =>
      (Array.isArray(v) || ArrayBuffer.isView(v)) &&
      (v as ArrayLike<number>).length === len &&
      typeof (v as ArrayLike<number>)[0] === "number",
  );
}

/** Build a FixedSizeList<Float32> vector from number[][] rows. */
export function makeFixedSizeListVector(rows: ArrayLike<number>[]): Vector {
  const dim = rows[0].length;
  const flat = new Float32Array(rows.length * dim);
  for (let i = 0; i < rows.length; i++) {
    const r = rows[i];
    for (let j = 0; j < dim; j++) flat[i * dim + j] = r[j];
  }
  const type = new FixedSizeList(dim, new Field("item", new Float32(), true));
  // assemble via vectorFromArray on the list type for version stability
  return vectorFromArray(
    Array.from({ length: rows.length }, (_, i) =>
      Array.from(flat.subarray(i * dim, (i + 1) * dim)),
    ),
    type,
  ) as unknown as Vector;
}

/**
 * Normalize row objects / column map / Arrow table into an Arrow table
 * with vector columns promoted to FixedSizeList<Float32>.
 */
export function makeArrowTable(data: RowData | ColumnData | ArrowTable): ArrowTable {
  if (data instanceof ArrowTable) return data;
  if (Array.isArray(data)) {
    // row objects: split vector-like columns out, build the rest via JSON
    if (data.length === 0) throw new Error("cannot infer a schema from zero rows");
    const names = Object.keys(data[0]);
    const vectorCols: Record<string, number[][]> = {};
    const scalarRows: Record<string, unknown>[] = data.map(() => ({}));
    for (const name of names) {
      const values = data.map((r) => r[name]);
      if (isVectorColumn(values)) {
        vectorCols[name] = values.map((v) => Array.from(v as ArrayLike<number>));
      } else {
        for (let i = 0; i < data.length; i++) scalarRows[i][name] = values[i];
      }
    }
    let tbl =
      Object.keys(scalarRows[0] ?? {}).length > 0
        ? tableFromJSON(scalarRows)
        : undefined;
    for (const [name, rows] of Object.entries(vectorCols)) {
      const vec = makeFixedSizeListVector(rows);
      const tmp = new ArrowTable({ [name]: vec });
      tbl = tbl ? tbl.assign(tmp) : tmp;
    }
    if (!tbl) throw new Error("no columns in data");
    return tbl;
  }
  // column map: typed arrays pass straight through tableFromArrays;
  // number[][] columns promote to FixedSizeList
  const plain: Record<string, unknown[] | Float32Array | Float64Array> = {};
  let vectors: ArrowTable | undefined;
  for (const [name, values] of Object.entries(data)) {
    if (Array.isArray(values) && isVectorColumn(values)) {
      const vec = makeFixedSizeListVector(values as number[][]);
      const tmp = new ArrowTable({ [name]: vec });
      vectors = vectors ? vectors.assign(tmp) : tmp;
    } else {
      plain[name] = values;
    }
  }
  let tbl =
    Object.keys(plain).length > 0
      ? tableFromArrays(plain as Parameters<typeof tableFromArrays>[0])
      : undefined;
  if (vectors) tbl = tbl ? tbl.assign(vectors) : vectors;
  if (!tbl) throw new Error("no columns in data");
  return tbl;
}

/** Resolve the default vector column of a schema: 'vector' when present,
 * else the single FixedSizeList column (reference vector_column_name). */
export function defaultVectorColumn(schema: Schema): string {
  const fsl = schema.fields.filter((f) => f.type instanceof FixedSizeList);
  const byName = schema.fields.find((f) => f.name === "vector");
  if (byName) return byName.name;
  if (fsl.length === 1) return fsl[0].name;
  throw new Error(
    `cannot infer the vector column: ${fsl.length} FixedSizeList columns`,
  );
}
