/**
 * Merge-insert (upsert) builder — the fluent TS surface of the
 * reference SDK (reference nodejs/lancedb/merge.ts MergeInsertBuilder;
 * semantics of rust merge_insert.rs): configure the matched /
 * not-matched clauses, then execute with the new data in one request
 * against POST /v1/table/{name}/merge_insert.
 */

import { Table as ArrowTable, tableToIPC } from "apache-arrow";
import { makeArrowTable } from "./arrow.js";
import { RestClient } from "./client.js";

export interface MergeStats {
  num_inserted_rows?: number;
  num_updated_rows?: number;
  num_deleted_rows?: number;
  version?: number;
  [key: string]: unknown;
}

export interface WriteExecutionOptions {
  /** Overall wall-clock bound for the request in ms (maps onto the
   * transport timeout for this call). */
  timeoutMs?: number;
}

/** Row objects, an Arrow table, or a prebuilt Arrow IPC stream. */
export type MergeData = Record<string, unknown>[] | ArrowTable | Uint8Array;

export class MergeInsertBuilder {
  private params: Record<string, string>;

  constructor(
    private client: RestClient,
    private tableName: string,
    on: string | string[],
  ) {
    this.params = { on: Array.isArray(on) ? on.join(",") : on };
  }

  /** Update every column of matched target rows from the source row.
   * An optional `where` restricts which matched rows update. */
  whenMatchedUpdateAll(options?: { where?: string }): MergeInsertBuilder {
    this.params.when_matched_update_all = "true";
    if (options?.where) {
      this.params.when_matched_update_all_filt = options.where;
    }
    return this;
  }

  /** Insert source rows that matched nothing in the target. */
  whenNotMatchedInsertAll(): MergeInsertBuilder {
    this.params.when_not_matched_insert_all = "true";
    return this;
  }

  /** Delete target rows that matched no source row; an optional
   * `where` restricts which unmatched target rows delete. */
  whenNotMatchedBySourceDelete(options?: { where?: string }): MergeInsertBuilder {
    this.params.when_not_matched_by_source_delete = "true";
    if (options?.where) {
      this.params.when_not_matched_by_source_delete_filt = options.where;
    }
    return this;
  }

  /** Join through a scalar index on the `on` column when one exists
   * (server-side planner hint; parity with reference useIndex). */
  useIndex(use: boolean): MergeInsertBuilder {
    this.params.use_index = use ? "true" : "false";
    return this;
  }

  /** Route the write through the table's LSM/MemWAL ingest path
   * instead of a direct rewrite (parity with reference useLsm). */
  useLsm(enable: boolean): MergeInsertBuilder {
    this.params.use_lsm = enable ? "true" : "false";
    return this;
  }

  /** Reject the merge unless every source row lands in a single LSM
   * shard (parity with reference validateSingleShard). */
  validateSingleShard(validate: boolean): MergeInsertBuilder {
    this.params.validate_single_shard = validate ? "true" : "false";
    return this;
  }

  /** Run the merge with `data` as the source rows. */
  async execute(data: MergeData, _options?: WriteExecutionOptions): Promise<MergeStats> {
    const ipc =
      data instanceof Uint8Array
        ? data
        : tableToIPC(Array.isArray(data) ? makeArrowTable(data) : data, "stream");
    const qs = new URLSearchParams(this.params);
    return this.client.postArrow<MergeStats>(
      `/v1/table/${encodeURIComponent(this.tableName)}/merge_insert?${qs}`,
      ipc,
    );
  }
}
