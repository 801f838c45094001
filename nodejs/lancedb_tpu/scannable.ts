/**
 * Scannable — normalized streaming ingestion sources (the TS face of
 * the python scannable.py capability model; reference
 * nodejs/lancedb/scannable.ts). Every accepted input normalizes to
 * `{schema, numRows?, batch factory, rescannable}`; consumers
 * (`Table.addScannable`) pull batches one at a time instead of
 * materializing the dataset in JS memory, and only rescannable sources
 * may be scanned twice (retries, two-pass sizing).
 */

import { RecordBatch, Schema, Table as ArrowTable, tableToIPC } from "apache-arrow";
import { RestClient } from "./client.js";
import { makeArrowTable, RowData } from "./arrow.js";

export interface ScannableOptions {
  /** Row-count hint; not validated against the stream. */
  numRows?: number;
  /** Whether the source can be scanned more than once. Defaults to
   * true for fromTable/fromFactory, false for fromIterable. */
  rescannable?: boolean;
}

type BatchIterable = Iterable<RecordBatch> | AsyncIterable<RecordBatch>;

export class Scannable {
  private constructor(
    public readonly schema: Schema,
    public readonly numRows: number | null,
    public readonly rescannable: boolean,
    private readonly factory: () => BatchIterable,
  ) {}

  /** Wrap an explicit schema + a factory producing a fresh batch
   * iterator per scan (must be idempotent when rescannable). */
  static fromFactory(
    schema: Schema,
    factory: () => BatchIterable,
    opts: ScannableOptions = {},
  ): Scannable {
    return new Scannable(
      schema,
      opts.numRows ?? null,
      opts.rescannable ?? true,
      factory,
    );
  }

  /** An in-memory Arrow table (always rescannable). */
  static fromTable(table: ArrowTable, opts: ScannableOptions = {}): Scannable {
    return new Scannable(
      table.schema,
      table.numRows,
      opts.rescannable ?? true,
      () => table.batches,
    );
  }

  /** Plain row objects — converted once, then rescannable. */
  static fromRows(rows: RowData, opts: ScannableOptions = {}): Scannable {
    return Scannable.fromTable(makeArrowTable(rows), opts);
  }

  /** A one-shot (async) iterable of batches. The schema must be given
   * because the stream cannot be peeked without consuming it. */
  static fromIterable(
    schema: Schema,
    batches: BatchIterable,
    opts: ScannableOptions = {},
  ): Scannable {
    let used = false;
    return new Scannable(
      schema,
      opts.numRows ?? null,
      opts.rescannable ?? false,
      () => {
        if (used) {
          throw new Error("this Scannable is one-shot and was already scanned");
        }
        used = true;
        return batches;
      },
    );
  }

  /** Start a scan: a fresh iterator over the source's batches (the
   * factory enforces one-shot semantics for non-rescannable sources). */
  scan(): BatchIterable {
    return this.factory();
  }

  /** Drain the scan into one Arrow IPC stream payload. */
  async toIpc(): Promise<Uint8Array> {
    const batches: RecordBatch[] = [];
    for await (const batch of this.scan()) batches.push(batch);
    return tableToIPC(new ArrowTable(this.schema, batches), "stream");
  }
}

/**
 * Stream a Scannable into a table as bounded multipart inserts — the
 * consumer side (python server multipart_* endpoints): parts commit
 * atomically at complete, and a mid-stream failure aborts them all.
 */
export async function addScannable(
  client: RestClient,
  tableName: string,
  source: Scannable,
  opts: { partRows?: number; mode?: "append" | "overwrite" } = {},
): Promise<object> {
  const partRows = opts.partRows ?? 100_000;
  const mode = opts.mode ?? "append";
  const p = (op: string) => `/v1/table/${encodeURIComponent(tableName)}/${op}`;
  const { id } = await client.postJson<{ id: string }>(p("multipart_create"));
  try {
    let part = 0;
    let pending: RecordBatch[] = [];
    let pendingRows = 0;
    const flush = async () => {
      if (!pending.length) return;
      const ipc = tableToIPC(new ArrowTable(source.schema, pending), "stream");
      await client.postArrow(`${p("multipart_put")}?id=${id}&part=${part}`, ipc);
      part += 1;
      pending = [];
      pendingRows = 0;
    };
    for await (const batch of source.scan()) {
      pending.push(batch);
      pendingRows += batch.numRows;
      if (pendingRows >= partRows) await flush();
    }
    await flush();
    return await client.postJson(p(`multipart_complete`) + `?id=${id}&mode=${mode}`);
  } catch (e) {
    await client.postJson(`${p("multipart_abort")}?id=${id}`).catch(() => {});
    throw e;
  }
}
