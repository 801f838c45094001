/**
 * Connection — mirrors the reference TS SDK's connect/Connection
 * surface (reference nodejs connection.ts) against a lancedb-tpu
 * query server (`python -m lancedb_tpu.remote.server <db-dir>`).
 */

import { ClientConfig, RestClient } from "./client.js";
import { EmbeddingDefinition, getRegistry } from "./embeddings.js";
import { makeArrowTable } from "./arrow.js";
import { JobInfo, RemoteJob } from "./jobs.js";
import { Table, TableData } from "./table.js";
import { tableFromIPC, tableToIPC, Table as ArrowTable, Schema } from "apache-arrow";

export interface ConnectionOptions extends Omit<ClientConfig, "baseUrl"> {}

export interface CreateTableOptions {
  /** Embedding definitions: source text embeds into the vector column
   * on create, and the config lands in schema metadata so Python/TS
   * handles reconnect the functions (cross-SDK contract). */
  embeddingFunctions?: EmbeddingDefinition[];
}

export class Connection {
  constructor(private client: RestClient) {}

  async tableNames(options: { limit?: number; pageToken?: string } = {}): Promise<string[]> {
    const params = new URLSearchParams();
    if (options.limit !== undefined) params.set("limit", String(options.limit));
    if (options.pageToken !== undefined) params.set("page_token", options.pageToken);
    const qs = params.size ? `?${params}` : "";
    const r = await this.client.getJson<{ tables: string[] }>(`/v1/table${qs}`);
    return r.tables;
  }

  async createTable(
    name: string,
    data: TableData,
    options: CreateTableOptions = {},
  ): Promise<Table> {
    let rows = data;
    if (options.embeddingFunctions?.length && Array.isArray(rows)) {
      const reg = getRegistry();
      rows = rows.map((r) => ({ ...r }));
      for (const def of options.embeddingFunctions) {
        const vcol = def.vectorColumn ?? "vector";
        if (rows.every((r) => vcol in r)) continue;
        const fn = reg.get(def.functionName).create(def.config);
        const vecs = await fn.computeSourceEmbeddings(
          rows.map((r) => String(r[def.sourceColumn] ?? "")),
        );
        rows.forEach((r, i) => {
          (r as Record<string, unknown>)[vcol] = vecs[i];
        });
      }
    }
    let tbl = Array.isArray(rows) ? makeArrowTable(rows) : (rows as ArrowTable);
    if (options.embeddingFunctions?.length) {
      const [key, doc] = getRegistry().metadataDocument(options.embeddingFunctions);
      const meta = new Map(tbl.schema.metadata);
      meta.set(key, doc);
      tbl = new ArrowTable(new Schema(tbl.schema.fields, meta), tbl.batches);
    }
    await this.client.postArrow(
      `/v1/table/${encodeURIComponent(name)}/create`,
      tableToIPC(tbl, "stream"),
    );
    return new Table(this.client, name);
  }

  async openTable(name: string): Promise<Table> {
    const t = new Table(this.client, name);
    await t.describe(); // errors early when the table is missing
    return t;
  }

  async dropTable(name: string): Promise<void> {
    await this.client.postJson(`/v1/table/${encodeURIComponent(name)}/drop`);
  }

  async renameTable(name: string, newName: string): Promise<void> {
    await this.client.postJson(`/v1/table/${encodeURIComponent(name)}/rename`, {
      new_name: newName,
    });
  }

  async dropAllTables(): Promise<void> {
    for (const name of await this.tableNames()) {
      await this.dropTable(name);
    }
  }

  /** Run a SQL SELECT server-side (POST /v1/sql); SELECTs return an
   * Arrow table, EXPLAIN [ANALYZE] returns the plan text. */
  async sql(query: string): Promise<ArrowTable | string> {
    if (/^\s*explain\b/i.test(query)) {
      const r = await this.client.postJson<{ plan: string }>("/v1/sql", { query });
      return r.plan;
    }
    const ipc = await this.client.postForArrow("/v1/sql", { query });
    return tableFromIPC(ipc);
  }

  // ---- jobs (reference connection.rs:526-556) -------------------------
  async listJobs(includeFinished = true): Promise<JobInfo[]> {
    const qs = includeFinished ? "" : "?include_finished=false";
    const r = await this.client.getJson<{ jobs: JobInfo[] }>(`/v1/jobs${qs}`);
    return r.jobs;
  }

  async getJob(jobId: string): Promise<RemoteJob> {
    const r = await this.client.getJson<{ job: JobInfo }>(`/v1/jobs/${jobId}`);
    return new RemoteJob(this.client, r.job);
  }

  async cancelJob(jobId: string): Promise<boolean> {
    return (await this.getJob(jobId)).cancel();
  }

  async jobHistory(): Promise<JobInfo[]> {
    const r = await this.client.getJson<{ jobs: JobInfo[] }>("/v1/jobs/history");
    return r.jobs;
  }
}

/**
 * Connect to a lancedb-tpu query server.
 *
 * ```ts
 * import { connect } from "@lancedb-tpu/lancedb";
 * const db = await connect("http://127.0.0.1:8787");
 * const tbl = await db.createTable("items", [{ id: 1, vector: [0.1, 0.2] }]);
 * const hits = await tbl.search([0.1, 0.2]).limit(5).toArray();
 * ```
 */
export async function connect(
  url: string,
  options: ConnectionOptions = {},
): Promise<Connection> {
  return new Connection(new RestClient({ baseUrl: url, ...options }));
}
