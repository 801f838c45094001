/**
 * Small shared utilities — the TS face of the reference SDK's util.ts
 * (toSQL literal conversion, TTLCache) used by the query builders and
 * the connection's table-handle cache.
 */

export type IntoSql =
  | string
  | number
  | boolean
  | null
  | Date
  | bigint
  | ArrayBuffer
  | Uint8Array
  | IntoSql[];

/** Render a JS value as a SQL literal (single quotes doubled; dates as
 * ISO timestamps; buffers as X'hex'; arrays as [..] lists). */
export function toSQL(value: IntoSql): string {
  if (value === null) return "NULL";
  if (typeof value === "string") return `'${value.replace(/'/g, "''")}'`;
  if (typeof value === "boolean") return value ? "TRUE" : "FALSE";
  if (typeof value === "number") {
    if (!Number.isFinite(value)) {
      if (Number.isNaN(value)) return "'NaN'";
      return value > 0 ? "'Infinity'" : "'-Infinity'";
    }
    return value.toString();
  }
  if (typeof value === "bigint") return value.toString();
  if (value instanceof Date) return `timestamp '${value.toISOString()}'`;
  if (value instanceof Uint8Array || value instanceof ArrayBuffer) {
    const bytes = value instanceof Uint8Array ? value : new Uint8Array(value);
    let hex = "";
    for (const b of bytes) hex += b.toString(16).padStart(2, "0");
    return `X'${hex}'`;
  }
  if (Array.isArray(value)) return `[${value.map(toSQL).join(", ")}]`;
  throw new Error(`cannot convert ${typeof value} to a SQL literal`);
}

/** Pack 0/1 numbers into bytes LSB-first (Arrow validity-bitmap
 * layout; parity with reference util.ts packBits). */
export function packBits(data: ArrayLike<number>): number[] {
  const out = new Array<number>(Math.ceil(data.length / 8)).fill(0);
  for (let i = 0; i < data.length; i++) {
    if (data[i]) out[i >> 3] |= 1 << (i & 7);
  }
  return out;
}

/** Time-bounded cache: entries expire `ttlMs` after insertion. Used
 * for table-handle / schema caches (reference util.ts TTLCache). */
export class TTLCache<K, V> {
  private entries = new Map<K, { value: V; expiresAt: number }>();

  constructor(private readonly ttlMs: number) {}

  get(key: K): V | undefined {
    const e = this.entries.get(key);
    if (!e) return undefined;
    if (Date.now() >= e.expiresAt) {
      this.entries.delete(key);
      return undefined;
    }
    return e.value;
  }

  set(key: K, value: V): void {
    this.entries.set(key, { value, expiresAt: Date.now() + this.ttlMs });
  }

  delete(key: K): void {
    this.entries.delete(key);
  }

  clear(): void {
    this.entries.clear();
  }

  /** Number of unexpired entries (expired ones drop lazily). */
  get size(): number {
    let n = 0;
    const now = Date.now();
    for (const [k, e] of this.entries) {
      if (now >= e.expiresAt) this.entries.delete(k);
      else n++;
    }
    return n;
  }
}
