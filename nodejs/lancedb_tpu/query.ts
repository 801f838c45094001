/**
 * Query builders — fluent surface mirroring the reference TS SDK
 * (reference nodejs query.ts: QueryBase/VectorQuery with where/limit/
 * nprobes/refineFactor/select/distanceType, fullTextSearch), executed
 * against POST /v1/table/{name}/query returning an Arrow IPC stream.
 */

import { RecordBatch, Table as ArrowTable, tableFromIPC } from "apache-arrow";
import { RestClient } from "./client.js";
import { FtsQueryNode, FullTextQuery } from "./fts.js";
import {
  Reranker,
  RRFReranker,
  ScoredRow,
  scoredFromRow,
  tableToScored,
} from "./rerankers.js";

interface QueryBody {
  vector?: number[] | number[][];
  vector_column?: string;
  k: number;
  offset?: number;
  filter?: string;
  prefilter?: boolean;
  nprobes?: number;
  minimum_nprobes?: number;
  maximum_nprobes?: number;
  ef?: number;
  refine_factor?: number;
  distance_type?: string;
  lower_bound?: number;
  upper_bound?: number;
  bypass_vector_index?: boolean;
  fast_search?: boolean;
  with_row_id?: boolean;
  columns?: string[];
  order_by?: Array<[string, string]>;
  /** plain text OR a structured AST document (fts.ts toJSON shape —
   * deserialized server-side by query_fts.fts_query_from_json) */
  full_text_query?: { query: string | object; columns?: string[] };
}

abstract class QueryBase<T extends QueryBase<T>> {
  protected body: QueryBody = { k: 10 };

  constructor(
    protected client: RestClient,
    protected tableName: string,
  ) {}

  protected abstract self(): T;

  where(predicate: string): T {
    this.body.filter = predicate;
    return this.self();
  }

  /** Apply the filter after (true) or before (false) vector search. */
  postfilter(): T {
    this.body.prefilter = false;
    return this.self();
  }

  limit(k: number): T {
    this.body.k = k;
    return this.self();
  }

  offset(n: number): T {
    this.body.offset = n;
    return this.self();
  }

  select(columns: string[]): T {
    this.body.columns = columns;
    return this.self();
  }

  withRowId(): T {
    this.body.with_row_id = true;
    return this.self();
  }

  /** Sort output rows: names or [name, "asc"|"desc"] pairs (reference
   * QueryRequest.order_by — available on every query surface). */
  orderBy(...columns: Array<string | [string, "asc" | "desc"]>): T {
    this.body.order_by = columns.map((c) =>
      typeof c === "string" ? [c, "ascending"] : [c[0], c[1] === "desc" ? "descending" : "ascending"],
    );
    return this.self();
  }

  async toArrow(): Promise<ArrowTable> {
    const ipc = await this.client.postForArrow(
      `/v1/table/${encodeURIComponent(this.tableName)}/query`,
      this.body,
    );
    return tableFromIPC(ipc);
  }

  /** Async record-batch iterator (reference RecordBatchIterator): the
   * server's IPC stream decodes incrementally batch by batch. */
  async *toBatches(maxBatchLength = 1024): AsyncGenerator<RecordBatch> {
    const tbl = await this.toArrow();
    for (const batch of tbl.batches) {
      for (let start = 0; start < batch.numRows; start += maxBatchLength) {
        yield batch.slice(start, Math.min(start + maxBatchLength, batch.numRows));
      }
    }
  }

  async toArray(): Promise<Record<string, unknown>[]> {
    const tbl = await this.toArrow();
    const out: Record<string, unknown>[] = [];
    for (const row of tbl) {
      out.push(row!.toJSON() as Record<string, unknown>);
    }
    return out;
  }

  /** Textual physical plan without executing (reference
   * ExecutableQuery.explainPlan). */
  async explainPlan(): Promise<string> {
    const res = await this.client.postJson<{ plan: string }>(
      `/v1/table/${encodeURIComponent(this.tableName)}/explain_plan`,
      this.body,
    );
    return res.plan;
  }

  /**
   * Execute and return the plan annotated with per-operator metrics
   * (reference ExecutableQuery.analyzePlan). `mode` controls the
   * distributed display: "aggregate" merges workers, "per_worker" and
   * "full" show one section per worker (reference query.rs:671-693).
   */
  async analyzePlan(
    mode: "aggregate" | "per_worker" | "full" = "aggregate",
  ): Promise<string> {
    const res = await this.client.postJson<{
      plan: string;
      workers?: Array<{ worker: string; plan: string }>;
    }>(
      `/v1/table/${encodeURIComponent(this.tableName)}/analyze_plan`,
      this.body,
    );
    if (mode !== "aggregate" && res.workers && res.workers.length > 0) {
      const sections = res.workers.map(
        (w) => `--- worker ${w.worker} ---\n${w.plan}`,
      );
      if (mode === "full") sections.unshift(`--- aggregate ---\n${res.plan}`);
      return sections.join("\n");
    }
    return res.plan;
  }
}

export class VectorQuery extends QueryBase<VectorQuery> {
  protected self(): VectorQuery {
    return this;
  }

  constructor(
    client: RestClient,
    tableName: string,
    vector: number[] | number[][],
  ) {
    super(client, tableName);
    this.body.vector = vector;
  }

  column(name: string): VectorQuery {
    this.body.vector_column = name;
    return this;
  }

  distanceType(metric: string): VectorQuery {
    this.body.distance_type = metric;
    return this;
  }

  nprobes(n: number): VectorQuery {
    this.body.nprobes = n;
    return this;
  }

  /** Lower bound for adaptive probing (reference minimumNprobes). */
  minimumNprobes(n: number): VectorQuery {
    this.body.minimum_nprobes = n;
    return this;
  }

  /** Upper bound for adaptive probing (reference maximumNprobes). */
  maximumNprobes(n: number): VectorQuery {
    this.body.maximum_nprobes = n;
    return this;
  }

  /** HNSW search beam width (reference VectorQuery.ef). */
  ef(n: number): VectorQuery {
    this.body.ef = n;
    return this;
  }

  /**
   * Add another query vector: all vectors execute as one batched
   * device dispatch and rows carry a `query_index` column (reference
   * addQueryVector / multi-query-vector union, table/query.rs:334).
   */
  addQueryVector(vector: number[]): VectorQuery {
    const cur = this.body.vector;
    if (cur === undefined) {
      this.body.vector = vector;
    } else if (Array.isArray(cur[0])) {
      (cur as number[][]).push(vector);
    } else {
      this.body.vector = [cur as number[], vector];
    }
    return this;
  }

  refineFactor(rf: number): VectorQuery {
    this.body.refine_factor = rf;
    return this;
  }

  distanceRange(lower?: number, upper?: number): VectorQuery {
    this.body.lower_bound = lower;
    this.body.upper_bound = upper;
    return this;
  }

  bypassVectorIndex(): VectorQuery {
    this.body.bypass_vector_index = true;
    return this;
  }

  fastSearch(): VectorQuery {
    this.body.fast_search = true;
    return this;
  }
}

export class FtsQuery extends QueryBase<FtsQuery> {
  protected self(): FtsQuery {
    return this;
  }

  constructor(
    client: RestClient,
    tableName: string,
    query: FullTextQuery,
    columns?: string[],
  ) {
    super(client, tableName);
    this.body.full_text_query = {
      query: query instanceof FtsQueryNode ? query.toJSON() : query,
      columns,
    };
  }
}

/** Plain (no-vector) scan query. */
export class PlainQuery extends QueryBase<PlainQuery> {
  protected self(): PlainQuery {
    return this;
  }
}

/**
 * Hybrid query: one vector search + one FTS search fused client-side
 * by a reranker (reference nodejs hybrid query; semantics of python
 * LanceHybridQueryBuilder). The two searches over-fetch then the
 * reranker produces the final `_relevance_score` ordering.
 */
export class HybridQuery {
  private k = 10;
  private filterSql: string | undefined;
  private rerankerImpl: Reranker = new RRFReranker();
  private overfetch = 4;
  private nprobesN: number | undefined;
  private refineFactorN: number | undefined;
  private distanceTypeS: string | undefined;
  /** extra (vector, text) pairs beyond the first — executed as ONE
   * multi-vector server dispatch plus concurrent FTS legs (mirrors
   * python HybridQueryBuilder.add_query / the reference's
   * multi-query-vector union, table/query.rs:334) */
  private extra: Array<{ vector: number[]; text: string }> = [];

  constructor(
    private client: RestClient,
    private tableName: string,
    private text: string,
    private vector: number[],
    private vectorColumn?: string,
    private ftsColumns?: string[],
  ) {}

  limit(k: number): HybridQuery {
    this.k = k;
    return this;
  }

  where(predicate: string): HybridQuery {
    this.filterSql = predicate;
    return this;
  }

  nprobes(n: number): HybridQuery {
    this.nprobesN = n;
    return this;
  }

  refineFactor(rf: number): HybridQuery {
    this.refineFactorN = rf;
    return this;
  }

  distanceType(metric: string): HybridQuery {
    this.distanceTypeS = metric;
    return this;
  }

  rerank(reranker: Reranker): HybridQuery {
    this.rerankerImpl = reranker;
    return this;
  }

  /** Add another (vector, text) hybrid query; `text` defaults to the
   * builder's text leg. Results gain a `query_index` field. */
  addQuery(vector: number[], text?: string): HybridQuery {
    this.extra.push({ vector, text: text ?? this.text });
    return this;
  }

  private vectorLeg(vector: number[] | number[][], fetchK: number): VectorQuery {
    let vq = new VectorQuery(this.client, this.tableName, vector)
      .limit(fetchK)
      .withRowId();
    if (this.vectorColumn) vq = vq.column(this.vectorColumn);
    if (this.nprobesN) vq = vq.nprobes(this.nprobesN);
    if (this.refineFactorN) vq = vq.refineFactor(this.refineFactorN);
    if (this.distanceTypeS) vq = vq.distanceType(this.distanceTypeS);
    if (this.filterSql) vq = vq.where(this.filterSql);
    return vq;
  }

  private ftsLeg(text: string, fetchK: number): FtsQuery {
    let fq = new FtsQuery(this.client, this.tableName, text, this.ftsColumns)
      .limit(fetchK)
      .withRowId();
    if (this.filterSql) fq = fq.where(this.filterSql);
    return fq;
  }

  async toArray(): Promise<Record<string, unknown>[]> {
    const fetchK = this.k * this.overfetch;
    if (this.extra.length > 0) return this.toArrayBatched(fetchK);
    const [vres, fres] = await Promise.all([
      this.vectorLeg(this.vector, fetchK).toArrow(),
      this.ftsLeg(this.text, fetchK).toArrow(),
    ]);
    return this.rerankerImpl.rerankHybrid(this.text, vres, fres, this.k);
  }

  /** Batched execution: one multi-vector dispatch for every vector leg
   * (rows come back tagged `query_index`), FTS legs concurrent; each
   * query fuses independently and the output rows keep `query_index`. */
  private async toArrayBatched(fetchK: number): Promise<Record<string, unknown>[]> {
    const pairs = [{ vector: this.vector, text: this.text }, ...this.extra];
    const vq = this.vectorLeg(
      pairs.map((p) => p.vector),
      fetchK,
    );
    const [vres, ...ftsRes] = await Promise.all([
      vq.toArrow(),
      ...pairs.map((p) => this.ftsLeg(p.text, fetchK).toArrow()),
    ]);
    const groups: ScoredRow[][] = pairs.map(() => []);
    for (const rec of vres) {
      const row = rec!.toJSON() as Record<string, unknown>;
      const qi = Number(row.query_index ?? 0);
      delete row.query_index;
      if (groups[qi]) groups[qi].push(scoredFromRow(row));
    }
    const out: Record<string, unknown>[] = [];
    pairs.forEach((p, qi) => {
      const fused = this.rerankerImpl.rerankHybridRows(
        p.text,
        groups[qi],
        tableToScored(ftsRes[qi]),
        this.k,
      );
      for (const row of fused) out.push({ ...row, query_index: qi });
    });
    return out;
  }
}
