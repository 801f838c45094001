/**
 * Remote table handle — mirrors the reference TS SDK's Table surface
 * (reference nodejs table.ts: schema/countRows/add/update/delete/
 * mergeInsert/createIndex/optimize/version ops/tags) over the
 * lancedb-tpu query server endpoints (see python remote/server.py and
 * reference remote/table.rs:177-2589).
 */

import {
  Table as ArrowTable,
  tableFromIPC,
  tableToIPC,
  tableFromJSON,
} from "apache-arrow";
import { RestClient } from "./client.js";
import { Index } from "./indices.js";
import { FtsQuery, PlainQuery, VectorQuery } from "./query.js";

export interface FieldDescriptor {
  name: string;
  type: string;
  nullable: boolean;
}

export interface TableDescription {
  table: string;
  version: number;
  schema: { fields: FieldDescriptor[] };
  stats: Record<string, unknown>;
}

export type TableData = ArrowTable | Record<string, unknown>[];

function toIpc(data: TableData): Uint8Array {
  const tbl = Array.isArray(data) ? tableFromJSON(data) : data;
  return tableToIPC(tbl, "stream");
}

export interface MergeInsertOptions {
  whenMatchedUpdateAll?: boolean | string;
  whenNotMatchedInsertAll?: boolean;
  whenNotMatchedBySourceDelete?: boolean | string;
}

export class Table {
  constructor(
    private client: RestClient,
    public readonly name: string,
  ) {}

  private p(op: string): string {
    return `/v1/table/${encodeURIComponent(this.name)}/${op}`;
  }

  async describe(): Promise<TableDescription> {
    return this.client.postJson<TableDescription>(this.p("describe"));
  }

  async schema(): Promise<FieldDescriptor[]> {
    return (await this.describe()).schema.fields;
  }

  async version(): Promise<number> {
    return (await this.describe()).version;
  }

  async countRows(filter?: string): Promise<number> {
    return this.client.postJson<number>(this.p("count_rows"), {
      predicate: filter ?? null,
    });
  }

  async add(data: TableData, mode: "append" | "overwrite" = "append"): Promise<void> {
    await this.client.postArrow(`${this.p("insert")}?mode=${mode}`, toIpc(data));
  }

  /** Vector search (array) / full-text search (string) / plain scan (no arg). */
  search(query: number[] | number[][] | string): VectorQuery | FtsQuery;
  search(): PlainQuery;
  search(
    query?: number[] | number[][] | string,
  ): VectorQuery | FtsQuery | PlainQuery {
    if (query === undefined) return new PlainQuery(this.client, this.name);
    if (typeof query === "string") return new FtsQuery(this.client, this.name, query);
    return new VectorQuery(this.client, this.name, query);
  }

  query(): PlainQuery {
    return new PlainQuery(this.client, this.name);
  }

  async update(updates: Record<string, string>, where?: string): Promise<object> {
    return this.client.postJson(this.p("update"), {
      predicate: where ?? null,
      updates: Object.entries(updates),
    });
  }

  async delete(predicate: string): Promise<number> {
    const r = await this.client.postJson<{ deleted_rows: number }>(this.p("delete"), {
      predicate,
    });
    return r.deleted_rows;
  }

  async mergeInsert(
    on: string | string[],
    data: TableData,
    options: MergeInsertOptions = {},
  ): Promise<object> {
    const params = new URLSearchParams({ on: Array.isArray(on) ? on.join(",") : on });
    if (options.whenMatchedUpdateAll) {
      params.set("when_matched_update_all", "true");
      if (typeof options.whenMatchedUpdateAll === "string") {
        params.set("when_matched_update_all_filt", options.whenMatchedUpdateAll);
      }
    }
    if (options.whenNotMatchedInsertAll) {
      params.set("when_not_matched_insert_all", "true");
    }
    if (options.whenNotMatchedBySourceDelete) {
      params.set("when_not_matched_by_source_delete", "true");
      if (typeof options.whenNotMatchedBySourceDelete === "string") {
        params.set(
          "when_not_matched_by_source_delete_filt",
          options.whenNotMatchedBySourceDelete,
        );
      }
    }
    return this.client.postArrow(`${this.p("merge_insert")}?${params}`, toIpc(data));
  }

  async createIndex(column: string, index: Index): Promise<void> {
    await this.client.postJson(this.p("create_index"), {
      ...index.config,
      column,
    });
  }

  async listIndices(): Promise<object[]> {
    const r = await this.client.postJson<{ indexes: object[] }>(this.p("index_list"));
    return r.indexes;
  }

  async indexStats(indexName: string): Promise<object> {
    return this.client.postJson(this.p("index_stats"), { index_name: indexName });
  }

  async dropIndex(indexName: string): Promise<void> {
    await this.client.postJson(this.p("index_drop"), { index_name: indexName });
  }

  async listVersions(): Promise<object[]> {
    const r = await this.client.postJson<{ versions: object[] }>(this.p("version_list"));
    return r.versions;
  }

  async checkout(version: number): Promise<void> {
    await this.client.postJson(this.p("checkout"), { version });
  }

  async restore(version?: number): Promise<void> {
    await this.client.postJson(this.p("restore"), { version: version ?? null });
  }

  readonly tags = {
    list: async (): Promise<Record<string, number>> =>
      this.client.postJson(this.p("tags_list")),
    create: async (tag: string, version?: number): Promise<void> => {
      await this.client.postJson(this.p("tags_create"), { tag, version });
    },
    delete: async (tag: string): Promise<void> => {
      await this.client.postJson(this.p("tags_delete"), { tag });
    },
    update: async (tag: string, version: number): Promise<void> => {
      await this.client.postJson(this.p("tags_update"), { tag, version });
    },
  };

  async optimize(): Promise<object> {
    return this.client.postJson(this.p("optimize"));
  }

  async explainPlan(vector: number[], k = 10): Promise<string> {
    const r = await this.client.postJson<{ plan: string }>(this.p("explain_plan"), {
      vector,
      k,
    });
    return r.plan;
  }

  async analyzePlan(vector: number[], k = 10): Promise<string> {
    const r = await this.client.postJson<{ plan: string }>(this.p("analyze_plan"), {
      vector,
      k,
    });
    return r.plan;
  }
}

export { tableFromIPC };
