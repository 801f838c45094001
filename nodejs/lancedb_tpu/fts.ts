/**
 * Full-text query AST — mirrors the reference TS SDK's structured FTS
 * queries (reference nodejs query.ts FullTextQuery family) and the
 * python `lancedb_tpu.query_fts` nodes. `toJSON()` emits the shared
 * wire shape the server deserializes (python
 * query_fts.fts_query_from_json), so Python and TypeScript clients
 * send identical documents.
 */

export type Occur = "SHOULD" | "MUST" | "MUST_NOT";
export type FtsOperator = "AND" | "OR";

export interface FtsQueryJson {
  [kind: string]: unknown;
}

export abstract class FtsQueryNode {
  abstract toJSON(): FtsQueryJson;

  /** `a.and(b)` — both clauses MUST match. */
  and(other: FtsQueryNode): BooleanQuery {
    return new BooleanQuery([
      ["MUST", this],
      ["MUST", other],
    ]);
  }

  /** `a.or(b)` — either clause may match (scores sum). */
  or(other: FtsQueryNode): BooleanQuery {
    return new BooleanQuery([
      ["SHOULD", this],
      ["SHOULD", other],
    ]);
  }
}

export interface MatchOptions {
  boost?: number;
  fuzziness?: number;
  maxExpansions?: number;
  operator?: FtsOperator;
  prefixLength?: number;
}

/** Term-bag BM25 match over one column. */
export class MatchQuery extends FtsQueryNode {
  constructor(
    public query: string,
    public column?: string,
    public options: MatchOptions = {},
  ) {
    super();
  }

  toJSON(): FtsQueryJson {
    return {
      match: {
        query: this.query,
        column: this.column ?? null,
        boost: this.options.boost ?? 1.0,
        fuzziness: this.options.fuzziness ?? 0,
        max_expansions: this.options.maxExpansions ?? 50,
        operator: this.options.operator ?? "OR",
        prefix_length: this.options.prefixLength ?? 0,
      },
    };
  }
}

/** Exact phrase with optional slop (requires positions in the index). */
export class PhraseQuery extends FtsQueryNode {
  constructor(
    public query: string,
    public column?: string,
    public slop = 0,
  ) {
    super();
  }

  toJSON(): FtsQueryJson {
    return { phrase: { query: this.query, column: this.column ?? null, slop: this.slop } };
  }
}

/** score = positive − negativeBoost × negative. */
export class BoostQuery extends FtsQueryNode {
  constructor(
    public positive: FtsQueryNode,
    public negative: FtsQueryNode,
    public negativeBoost = 0.5,
  ) {
    super();
  }

  toJSON(): FtsQueryJson {
    return {
      boost: {
        positive: this.positive.toJSON(),
        negative: this.negative.toJSON(),
        negative_boost: this.negativeBoost,
      },
    };
  }
}

/** Match across several columns, max-combined with per-column boosts. */
export class MultiMatchQuery extends FtsQueryNode {
  constructor(
    public query: string,
    public columns: string[],
    public boosts?: number[],
    public operator: FtsOperator = "OR",
  ) {
    super();
    if (boosts && boosts.length !== columns.length) {
      throw new Error("boosts must match columns");
    }
  }

  toJSON(): FtsQueryJson {
    return {
      multi_match: {
        query: this.query,
        columns: this.columns,
        boosts: this.boosts ?? this.columns.map(() => 1.0),
        operator: this.operator,
      },
    };
  }
}

/** List of (occur, query) clauses. */
export class BooleanQuery extends FtsQueryNode {
  constructor(public queries: Array<[Occur, FtsQueryNode]> = []) {
    super();
  }

  override and(other: FtsQueryNode): BooleanQuery {
    return new BooleanQuery([...this.queries, ["MUST", other]]);
  }

  override or(other: FtsQueryNode): BooleanQuery {
    return new BooleanQuery([...this.queries, ["SHOULD", other]]);
  }

  toJSON(): FtsQueryJson {
    const doc: Record<string, FtsQueryJson[]> = { should: [], must: [], must_not: [] };
    for (const [occur, q] of this.queries) {
      doc[occur.toLowerCase()].push(q.toJSON());
    }
    const out: Record<string, FtsQueryJson[]> = {};
    for (const [k, v] of Object.entries(doc)) {
      if (v.length) out[k] = v;
    }
    return { boolean: out };
  }
}

export type FullTextQuery = string | FtsQueryNode;
