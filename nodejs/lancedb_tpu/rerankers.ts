/**
 * Rerankers — fuse vector + FTS result sets client-side (reference
 * nodejs lancedb/rerankers/: RRFReranker, LinearCombinationReranker;
 * semantics match python rerankers/rrf.py + linear_combination.py).
 */

import { Table as ArrowTable } from "apache-arrow";

export interface ScoredRow {
  row: Record<string, unknown>;
  rowId: unknown;
  /** present on vector results */
  distance?: number;
  /** present on FTS results (BM25, higher = better) */
  score?: number;
}

export function tableToScored(tbl: ArrowTable): ScoredRow[] {
  const out: ScoredRow[] = [];
  for (const rec of tbl) {
    const row = rec!.toJSON() as Record<string, unknown>;
    out.push(scoredFromRow(row));
  }
  return out;
}

export function scoredFromRow(row: Record<string, unknown>): ScoredRow {
  return {
    row,
    rowId: row._rowid ?? JSON.stringify(row),
    distance: row._distance as number | undefined,
    score: row._score as number | undefined,
  };
}

export abstract class Reranker {
  /** Fuse one vector and one FTS result list into ranked rows with a
   * `_relevance_score` (descending). The row-list form is the primitive
   * so batched hybrid queries can fuse per-query groups without
   * rebuilding Arrow tables. */
  abstract rerankHybridRows(
    query: string,
    vectorResults: ScoredRow[],
    ftsResults: ScoredRow[],
    limit: number,
  ): Record<string, unknown>[];

  /** Arrow-table convenience wrapper over {@link rerankHybridRows}. */
  rerankHybrid(
    query: string,
    vectorResults: ArrowTable,
    ftsResults: ArrowTable,
    limit: number,
  ): Record<string, unknown>[] {
    return this.rerankHybridRows(
      query,
      tableToScored(vectorResults),
      tableToScored(ftsResults),
      limit,
    );
  }
}

/** Reciprocal-rank fusion: score = Σ 1/(k + rank) over each list the
 * row appears in (reference rerankers/rrf.ts, k=60 default). */
export class RRFReranker extends Reranker {
  constructor(private k = 60) {
    super();
  }

  rerankHybridRows(
    _query: string,
    vectorResults: ScoredRow[],
    ftsResults: ScoredRow[],
    limit: number,
  ): Record<string, unknown>[] {
    const scores = new Map<unknown, { score: number; row: Record<string, unknown> }>();
    for (const list of [vectorResults, ftsResults]) {
      list.forEach((r, rank) => {
        const cur = scores.get(r.rowId) ?? { score: 0, row: r.row };
        cur.score += 1 / (this.k + rank + 1);
        cur.row = { ...cur.row, ...r.row };
        scores.set(r.rowId, cur);
      });
    }
    return [...scores.values()]
      .sort((a, b) => b.score - a.score)
      .slice(0, limit)
      .map((s) => ({ ...s.row, _relevance_score: s.score }));
  }
}

/** weight * normalized_vector_similarity + (1-weight) * normalized_bm25
 * (reference linear_combination.py, weight=0.7 default). */
export class LinearCombinationReranker extends Reranker {
  constructor(private weight = 0.7) {
    super();
  }

  rerankHybridRows(
    _query: string,
    vectorResults: ScoredRow[],
    ftsResults: ScoredRow[],
    limit: number,
  ): Record<string, unknown>[] {
    const vec = vectorResults;
    const fts = ftsResults;
    const dists = vec.map((r) => r.distance ?? 0);
    const lo = Math.min(...dists, 0);
    const hi = Math.max(...dists, 1e-9);
    const vscore = new Map(
      vec.map((r) => [r.rowId, 1 - ((r.distance ?? 0) - lo) / (hi - lo || 1)]),
    );
    const bm = fts.map((r) => r.score ?? 0);
    const bhi = Math.max(...bm, 1e-9);
    const fscore = new Map(fts.map((r) => [r.rowId, (r.score ?? 0) / bhi]));
    const rows = new Map<unknown, Record<string, unknown>>();
    for (const r of [...vec, ...fts]) {
      rows.set(r.rowId, { ...(rows.get(r.rowId) ?? {}), ...r.row });
    }
    return [...rows.entries()]
      .map(([id, row]) => ({
        ...row,
        _relevance_score:
          this.weight * (vscore.get(id) ?? 0) + (1 - this.weight) * (fscore.get(id) ?? 0),
      }))
      .sort((a, b) => (b._relevance_score as number) - (a._relevance_score as number))
      .slice(0, limit);
  }
}
