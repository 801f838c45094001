/**
 * Connection — mirrors the reference TS SDK's connect/Connection
 * surface (reference nodejs connection.ts) against a lancedb-tpu
 * query server (`python -m lancedb_tpu.remote.server <db-dir>`).
 */

import { ClientConfig, RestClient } from "./client.js";
import { Table, TableData } from "./table.js";
import { tableToIPC, tableFromJSON, Table as ArrowTable } from "apache-arrow";

export interface ConnectionOptions extends Omit<ClientConfig, "baseUrl"> {}

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

  async createTable(name: string, data: TableData): Promise<Table> {
    const tbl = Array.isArray(data) ? tableFromJSON(data) : (data as ArrowTable);
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
