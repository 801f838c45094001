/**
 * Arrow object sanitization — the TS face of the reference SDK's
 * sanitize.ts: callers may hold Schema/Field/DataType instances from a
 * DIFFERENT copy of the apache-arrow package (npm dedupe failures,
 * bundlers, version skew), which fail `instanceof` checks against ours.
 * These helpers rebuild duck-typed Arrow metadata objects as instances
 * of THIS library's apache-arrow, keyed by `typeId`.
 */

import {
  Binary,
  Bool,
  DataType,
  Date_,
  Decimal,
  Dictionary,
  Field,
  FixedSizeBinary,
  FixedSizeList,
  Float,
  Float32,
  Float64,
  Int,
  Int32,
  LargeBinary,
  LargeUtf8,
  List,
  Null,
  Schema,
  Struct,
  Time,
  Timestamp,
  Type,
  Utf8,
} from "apache-arrow";

type AnyObj = Record<string, unknown>;

function prop<T>(o: object, ...names: string[]): T | undefined {
  for (const n of names) {
    const v = (o as AnyObj)[n];
    if (v !== undefined) return v as T;
  }
  return undefined;
}

/** True when the object quacks like an Arrow DataType (has a numeric
 * typeId) without being an instance of ours. */
export function isDataTypeLike(o: unknown): o is object {
  return (
    typeof o === "object" &&
    o !== null &&
    typeof (o as AnyObj).typeId === "number"
  );
}

export function sanitizeInt(t: object): Int {
  const bitWidth = prop<number>(t, "bitWidth") ?? 32;
  const isSigned = prop<boolean>(t, "isSigned") ?? true;
  return new Int(isSigned, bitWidth as 8 | 16 | 32 | 64);
}

export function sanitizeFloat(t: object): Float {
  const precision = prop<number>(t, "precision");
  return new Float((precision ?? 2) as 0 | 1 | 2);
}

export function sanitizeDecimal(t: object): Decimal {
  return new Decimal(
    prop<number>(t, "scale") ?? 0,
    prop<number>(t, "precision") ?? 38,
    prop<number>(t, "bitWidth") ?? 128,
  );
}

export function sanitizeDate(t: object): Date_ {
  return new Date_(prop<number>(t, "unit") ?? 1);
}

export function sanitizeTime(t: object): Time {
  return new Time(
    (prop<number>(t, "unit") ?? 1) as 0 | 1 | 2 | 3,
    (prop<number>(t, "bitWidth") ?? 32) as 32 | 64,
  );
}

export function sanitizeTimestamp(t: object): Timestamp {
  return new Timestamp(
    (prop<number>(t, "unit") ?? 1) as 0 | 1 | 2 | 3,
    prop<string | null>(t, "timezone") ?? null,
  );
}

function childFields(t: object): Field[] {
  const children = prop<object[]>(t, "children") ?? [];
  return children.map((c) => sanitizeField(c));
}

/** Rebuild a duck-typed DataType as an instance from our apache-arrow. */
export function sanitizeType(t: object): DataType {
  if (t instanceof DataType) return t;
  if (!isDataTypeLike(t)) {
    throw new Error("object is not an Arrow DataType (no numeric typeId)");
  }
  const typeId = prop<number>(t, "typeId")!;
  switch (typeId) {
    case Type.Null:
      return new Null();
    case Type.Bool:
      return new Bool();
    case Type.Int:
      return sanitizeInt(t);
    case Type.Float:
      return sanitizeFloat(t);
    case Type.Utf8:
      return new Utf8();
    case Type.LargeUtf8:
      return new LargeUtf8();
    case Type.Binary:
      return new Binary();
    case Type.LargeBinary:
      return new LargeBinary();
    case Type.FixedSizeBinary:
      return new FixedSizeBinary(prop<number>(t, "byteWidth") ?? 0);
    case Type.Decimal:
      return sanitizeDecimal(t);
    case Type.Date:
      return sanitizeDate(t);
    case Type.Time:
      return sanitizeTime(t);
    case Type.Timestamp:
      return sanitizeTimestamp(t);
    case Type.List: {
      const kids = childFields(t);
      if (kids.length !== 1) throw new Error("List type needs exactly one child");
      return new List(kids[0]);
    }
    case Type.FixedSizeList: {
      const kids = childFields(t);
      if (kids.length !== 1) {
        throw new Error("FixedSizeList type needs exactly one child");
      }
      return new FixedSizeList(prop<number>(t, "listSize", "list_size") ?? 0, kids[0]);
    }
    case Type.Struct:
      return new Struct(childFields(t));
    case Type.Dictionary: {
      const value = prop<object>(t, "dictionary", "valueType");
      const indices = prop<object>(t, "indices", "indexType");
      return new Dictionary(
        value ? sanitizeType(value) : new Utf8(),
        (indices ? sanitizeType(indices) : new Int32()) as Int,
        prop<number>(t, "id"),
        prop<boolean>(t, "isOrdered") ?? false,
      );
    }
    default:
      throw new Error(`unsupported Arrow typeId ${typeId} in sanitizeType`);
  }
}

/** Map-or-object metadata → Map<string, string>. */
export function sanitizeMetadata(
  metadata?: Map<string, string> | Record<string, string> | null,
): Map<string, string> | undefined {
  if (metadata == null) return undefined;
  if (metadata instanceof Map) return metadata;
  if (typeof metadata === "object") {
    return new Map(Object.entries(metadata).map(([k, v]) => [String(k), String(v)]));
  }
  throw new Error("schema metadata must be a Map or plain object");
}

/** Rebuild a duck-typed Field with our classes. */
export function sanitizeField(f: object): Field {
  if (f instanceof Field) return f;
  const name = prop<string>(f, "name");
  const type = prop<object>(f, "type");
  if (name === undefined || type === undefined) {
    throw new Error("field object needs name and type");
  }
  return new Field(
    name,
    sanitizeType(type),
    prop<boolean>(f, "nullable") ?? true,
    sanitizeMetadata(prop<Map<string, string>>(f, "metadata")),
  );
}

/**
 * Rebuild a duck-typed Schema (fields + metadata, possibly from a
 * foreign apache-arrow copy) as an instance of ours. Accepts a real
 * Schema, `{fields: [...]}` objects, or a bare field array.
 */
export function sanitizeSchema(s: object | Field[] | Schema): Schema {
  if (s instanceof Schema) return s;
  const fields = Array.isArray(s) ? s : prop<object[]>(s, "fields");
  if (!fields) throw new Error("schema object has no fields");
  const metadata = Array.isArray(s)
    ? undefined
    : sanitizeMetadata(prop<Map<string, string>>(s, "metadata"));
  return new Schema(
    fields.map((f) => sanitizeField(f)),
    metadata,
  );
}
