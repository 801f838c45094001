/**
 * Dataloader permutation builder — the TS face of the reference SDK's
 * PermutationBuilder (reference nodejs/lancedb/permutation.ts over the
 * native Rust builder; here the engine is the server's
 * data/permutation.py behind POST /v1/table/{name}/permutation).
 *
 * Configure split strategy + shuffle + filter fluently, then execute:
 * the server materializes a `{__row_id, split_id}` permutation table
 * readable by the streaming dataloader.
 */

import { RestClient } from "./client.js";

export interface SplitRandomOptions {
  /** Fractions summing to 1.0 (e.g. [0.7, 0.3]) — mutually exclusive
   * with counts. */
  ratios?: number[];
  /** Absolute row counts per split — mutually exclusive with ratios. */
  counts?: number[];
  seed?: number;
  /** Keep runs of `clumpSize` consecutive rows together (locality-
   * preserving splits for sequence data). */
  clumpSize?: number;
}

export interface SplitHashOptions {
  /** Columns hashed to assign a row's split (deterministic, stable
   * across re-runs and appends). */
  columns: string[];
  /** Relative weights per split, e.g. [70, 30]. */
  splitWeights: number[];
  /** Weight of rows discarded entirely (subsampling), default 0. */
  discardWeight?: number;
}

export interface SplitSequentialOptions {
  /** Absolute sizes per split; omitted ⇒ one split with every row. */
  sizes?: number[];
}

export interface SplitCalculatedOptions {
  /** SQL expression evaluating to the split id per row (negative ⇒
   * discard), e.g. "CASE WHEN price < 50 THEN 0 ELSE 1 END". */
  sql: string;
}

export interface ShuffleOptions {
  seed?: number;
  /** Shuffle clumps of consecutive rows instead of single rows. */
  clumpSize?: number;
  /** Host-memory budget; bigger datasets radix-spill to disk with
   * budget-invariant output (server data/shuffle.py). */
  memoryBudgetBytes?: number;
}

export interface PermutationResult {
  /** Name of the created permutation table. */
  table: string;
  num_rows: number;
  num_splits: number;
  split_sizes: Record<string, number>;
}

export class PermutationBuilder {
  private body: {
    dest?: string;
    filter?: string;
    shuffle?: object;
    split?: object;
  } = {};

  constructor(
    private client: RestClient,
    private tableName: string,
  ) {}

  /** Name the permutation table to create (otherwise the server picks
   * a deterministic `_perm_*` name). */
  persist(tableName: string): PermutationBuilder {
    this.body.dest = tableName;
    return this;
  }

  splitRandom(options: SplitRandomOptions): PermutationBuilder {
    this.body.split = {
      kind: "random",
      seed: options.seed ?? 42,
      fractions: options.ratios,
      counts: options.counts,
      clump_size: options.clumpSize,
    };
    return this;
  }

  splitHash(options: SplitHashOptions): PermutationBuilder {
    this.body.split = {
      kind: "hash",
      columns: options.columns,
      split_weights: options.splitWeights,
      discard_weight: options.discardWeight ?? 0,
    };
    return this;
  }

  splitSequential(options: SplitSequentialOptions = {}): PermutationBuilder {
    this.body.split = { kind: "sequential", sizes: options.sizes };
    return this;
  }

  splitCalculated(options: SplitCalculatedOptions): PermutationBuilder {
    this.body.split = { kind: "calculated", sql: options.sql };
    return this;
  }

  shuffle(options: ShuffleOptions = {}): PermutationBuilder {
    this.body.shuffle = {
      seed: options.seed ?? 42,
      clump_size: options.clumpSize,
      memory_budget_bytes: options.memoryBudgetBytes ?? 100 * 1024 * 1024,
    };
    return this;
  }

  /** Only rows matching the SQL predicate enter the permutation. */
  filter(predicate: string): PermutationBuilder {
    this.body.filter = predicate;
    return this;
  }

  async execute(): Promise<PermutationResult> {
    return this.client.postJson<PermutationResult>(
      `/v1/table/${encodeURIComponent(this.tableName)}/permutation`,
      this.body,
    );
  }
}

/** Entry point mirroring the reference's `permutationBuilder(table)`. */
export function permutationBuilder(
  client: RestClient,
  tableName: string,
): PermutationBuilder {
  return new PermutationBuilder(client, tableName);
}
