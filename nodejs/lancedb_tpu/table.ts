/**
 * Remote table handle — mirrors the reference TS SDK's Table surface
 * (reference nodejs table.ts: schema/countRows/add/update/delete/
 * mergeInsert/createIndex/optimize/version ops/tags) over the
 * lancedb-tpu query server endpoints (see python remote/server.py and
 * reference remote/table.rs:177-2589).
 */

import { Table as ArrowTable, tableFromIPC, tableToIPC } from "apache-arrow";
import { makeArrowTable } from "./arrow.js";
import { RestClient } from "./client.js";
import { EmbeddingFunction, getRegistry } from "./embeddings.js";
import { FtsQueryNode } from "./fts.js";
import { Index } from "./indices.js";
import { JobInfo, RemoteJob } from "./jobs.js";
import { MergeInsertBuilder } from "./merge.js";
import { PermutationBuilder } from "./permutation.js";
import { FtsQuery, HybridQuery, PlainQuery, VectorQuery } from "./query.js";
import { addScannable, Scannable } from "./scannable.js";

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
  const tbl = Array.isArray(data) ? makeArrowTable(data) : data;
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

  /** Vector search (array) / full-text search (string or structured
   * AST — fts.ts MatchQuery etc.) / plain scan (no arg). */
  search(query: number[] | number[][] | string | FtsQueryNode): VectorQuery | FtsQuery;
  search(): PlainQuery;
  search(
    query?: number[] | number[][] | string | FtsQueryNode,
  ): VectorQuery | FtsQuery | PlainQuery {
    if (query === undefined) return new PlainQuery(this.client, this.name);
    if (typeof query === "string" || query instanceof FtsQueryNode) {
      return new FtsQuery(this.client, this.name, query);
    }
    return new VectorQuery(this.client, this.name, query);
  }

  /** Full-text search over specific columns (reference
   * Table.fullTextSearch). */
  fullTextSearch(query: string | FtsQueryNode, columns?: string[]): FtsQuery {
    return new FtsQuery(this.client, this.name, query, columns);
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

  /** Upsert. With only `on`: returns a fluent MergeInsertBuilder
   * (reference table.mergeInsert → MergeInsertBuilder). With data:
   * one-shot convenience form. */
  mergeInsert(on: string | string[]): MergeInsertBuilder;
  mergeInsert(
    on: string | string[],
    data: TableData,
    options?: MergeInsertOptions,
  ): Promise<object>;
  mergeInsert(
    on: string | string[],
    data?: TableData,
    options: MergeInsertOptions = {},
  ): MergeInsertBuilder | Promise<object> {
    if (data === undefined) {
      return new MergeInsertBuilder(this.client, this.name, on);
    }
    return this.mergeInsertNow(on, data, options);
  }

  private async mergeInsertNow(
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

  /** Dataloader permutation build (splits/shuffle/filter) executed
   * server-side — permutation.ts (reference permutationBuilder). */
  permutationBuilder(): PermutationBuilder {
    return new PermutationBuilder(this.client, this.name);
  }

  async createIndex(column: string, index: Index): Promise<void> {
    await this.client.postJson(this.p("create_index"), {
      ...index.config,
      column,
    });
  }

  /** Server-side background index build returning a RemoteJob the
   * caller polls/waits on (reference index.rs:313 createIndex → Job). */
  async createIndexAsync(column: string, index: Index): Promise<RemoteJob> {
    const r = await this.client.postJson<{ job: JobInfo }>(
      this.p("create_index_async"),
      { ...index.config, column },
    );
    return new RemoteJob(this.client, r.job);
  }

  /** Full-text (BM25 inverted) index over one or more text columns
   * (reference Table.createIndex with an FTS config). */
  async createFtsIndex(
    columns: string | string[],
    options: { withPosition?: boolean; baseTokenizer?: string } = {},
  ): Promise<void> {
    await this.client.postJson(this.p("create_index"), {
      index_type: "FTS",
      column: columns,
      with_position: options.withPosition ?? true,
      base_tokenizer: options.baseTokenizer ?? "simple",
    });
  }

  /** BTREE / BITMAP / LABEL_LIST scalar index. */
  async createScalarIndex(column: string, indexType: "BTREE" | "BITMAP" | "LABEL_LIST" = "BTREE"): Promise<void> {
    await this.client.postJson(this.p("create_index"), {
      index_type: indexType,
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

  /** Executed-plan metrics. mode: "aggregate" (merged), "per_worker" or
   * "full" — one section per worker (reference analyze_plan distributed
   * display modes, query.rs:671-693). */
  async analyzePlan(
    vector: number[],
    k = 10,
    mode: "aggregate" | "per_worker" | "full" = "aggregate",
  ): Promise<string> {
    const r = await this.client.postJson<{
      plan: string;
      workers?: Array<{ worker: string; plan: string }>;
    }>(this.p("analyze_plan"), { vector, k });
    if ((mode === "per_worker" || mode === "full") && r.workers?.length) {
      const sections = r.workers.map((w) => `--- worker ${w.worker} ---\n${w.plan}`);
      if (mode === "full") sections.unshift(`--- aggregate ---\n${r.plan}`);
      return sections.join("\n");
    }
    return r.plan;
  }

  // ---- branches (reference remote/table.rs branch endpoints) ----------
  readonly branches = {
    list: async (): Promise<string[]> => {
      const r = await this.client.postJson<{ branches: string[] }>(this.p("branches_list"));
      return r.branches;
    },
    create: async (branch: string, version?: number): Promise<void> => {
      await this.client.postJson(this.p("branches_create"), { branch, version });
    },
    delete: async (branch: string): Promise<void> => {
      await this.client.postJson(this.p("branches_delete"), { branch });
    },
    diff: async (branch: string): Promise<object> =>
      this.client.postJson(this.p("branches_diff"), { branch }),
    merge: async (branch: string, baseBranch?: string): Promise<object> =>
      this.client.postJson(this.p("branches_merge"), {
        branch,
        base_branch: baseBranch,
      }),
  };

  // ---- schema evolution (reference add_columns/alter_columns/drop) ----
  async addColumns(transforms: Record<string, string>): Promise<number> {
    const r = await this.client.postJson<{ version: number }>(this.p("add_columns"), {
      new_columns: Object.entries(transforms),
    });
    return r.version;
  }

  async alterColumns(
    ...alterations: Array<{ path: string; rename?: string; dataType?: string; nullable?: boolean }>
  ): Promise<number> {
    const r = await this.client.postJson<{ version: number }>(this.p("alter_columns"), {
      alterations: alterations.map((a) => ({
        path: a.path,
        rename: a.rename,
        data_type: a.dataType,
        nullable: a.nullable,
      })),
    });
    return r.version;
  }

  async dropColumns(columns: string[]): Promise<number> {
    const r = await this.client.postJson<{ version: number }>(this.p("drop_columns"), {
      columns,
    });
    return r.version;
  }

  // ---- multipart insert (reference multipart_write endpoints) ---------
  /** Stream a large payload as bounded parts committed atomically at
   * complete. `partRows` bounds per-request size. */
  async addLarge(data: TableData, partRows = 100_000, mode: "append" | "overwrite" = "append"): Promise<object> {
    const tbl = Array.isArray(data) ? makeArrowTable(data) : data;
    const { id } = await this.client.postJson<{ id: string }>(this.p("multipart_create"));
    try {
      let part = 0;
      for (let start = 0; start < tbl.numRows; start += partRows) {
        const slice = tbl.slice(start, Math.min(start + partRows, tbl.numRows));
        await this.client.postArrow(
          `${this.p("multipart_put")}?id=${id}&part=${part}`,
          tableToIPC(slice, "stream"),
        );
        part += 1;
      }
      return await this.client.postJson(
        `${this.p("multipart_complete")}?id=${id}&mode=${mode}`,
      );
    } catch (e) {
      await this.client.postJson(`${this.p("multipart_abort")}?id=${id}`).catch(() => {});
      throw e;
    }
  }

  /** Stream a Scannable source in as bounded multipart inserts
   * committed atomically (scannable.ts; python scannable.py model). */
  async addScannable(
    source: Scannable,
    opts: { partRows?: number; mode?: "append" | "overwrite" } = {},
  ): Promise<object> {
    return addScannable(this.client, this.name, source, opts);
  }

  // ---- embeddings (cross-SDK schema-metadata contract) -----------------
  /** Live embedding functions reconnected from the table's schema
   * metadata (python embeddings/registry.py attach_metadata). */
  async embeddingFunctions(): Promise<
    Map<string, { fn: EmbeddingFunction; sourceColumn: string }>
  > {
    const desc = (await this.describe()) as TableDescription & {
      schema: { metadata?: Record<string, string> };
    };
    const raw = desc.schema.metadata?.embedding_functions;
    if (!raw) return new Map();
    return getRegistry().parseMetadata(raw);
  }

  /** Add rows, computing missing vector columns through the table's
   * embedding functions (reference WithEmbeddings add path). */
  async addWithEmbeddings(rows: Record<string, unknown>[], mode: "append" | "overwrite" = "append"): Promise<void> {
    const fns = await this.embeddingFunctions();
    const enriched = rows.map((r) => ({ ...r }));
    for (const [vectorColumn, { fn, sourceColumn }] of fns) {
      if (enriched.every((r) => vectorColumn in r)) continue;
      const texts = enriched.map((r) => String(r[sourceColumn] ?? ""));
      const vecs = await fn.computeSourceEmbeddings(texts);
      enriched.forEach((r, i) => {
        r[vectorColumn] = vecs[i];
      });
    }
    await this.add(enriched, mode);
  }

  /** Embed a text query through the table's embedding function and run
   * a vector search on the given (or sole) embedded column. */
  async searchText(text: string, vectorColumn?: string): Promise<VectorQuery> {
    const fns = await this.embeddingFunctions();
    const entry = vectorColumn
      ? fns.get(vectorColumn)
      : fns.size === 1
        ? [...fns.values()][0]
        : undefined;
    if (!entry) {
      throw new Error(
        "no embedding function registered for this table; pass a vector instead",
      );
    }
    const vec = await entry.fn.computeQueryEmbeddings(text);
    const q = new VectorQuery(this.client, this.name, vec);
    return vectorColumn ? q.column(vectorColumn) : q;
  }

  /** Hybrid (vector + FTS) search fused by a reranker. The text embeds
   * through the table's embedding function unless a vector is given. */
  async hybridSearch(
    text: string,
    options: { vector?: number[]; vectorColumn?: string; ftsColumns?: string[] } = {},
  ): Promise<HybridQuery> {
    let vector = options.vector;
    if (!vector) {
      const fns = await this.embeddingFunctions();
      const entry = options.vectorColumn
        ? fns.get(options.vectorColumn)
        : [...fns.values()][0];
      if (!entry) throw new Error("hybrid search needs options.vector or an embedding function");
      vector = await entry.fn.computeQueryEmbeddings(text);
    }
    return new HybridQuery(
      this.client,
      this.name,
      text,
      vector,
      options.vectorColumn,
      options.ftsColumns,
    );
  }
}

export { tableFromIPC };
