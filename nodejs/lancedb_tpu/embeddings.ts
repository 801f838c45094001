/**
 * Embedding function registry + providers (reference nodejs
 * lancedb/embedding/: registry.ts, openai.ts, — the TS half of the
 * cross-SDK embedding contract).
 *
 * The registry serializes definitions into the SAME schema-metadata
 * document the Python SDK writes (`embedding_functions` key, entries
 * {source_column, vector_column, name, model}), so a table created
 * from TS reconnects its functions when opened from Python and vice
 * versa (python embeddings/registry.py attach_metadata).
 */

export interface EmbeddingDefinition {
  sourceColumn: string;
  vectorColumn?: string;
  functionName: string;
  config?: Record<string, unknown>;
}

export abstract class EmbeddingFunction {
  constructor(protected config: Record<string, unknown> = {}) {}

  /** Embedding dimensionality (may probe the API once). */
  abstract ndims(): Promise<number>;

  /** Embed source documents. */
  abstract computeSourceEmbeddings(texts: string[]): Promise<number[][]>;

  /** Embed a query (defaults to the source path). */
  async computeQueryEmbeddings(query: string): Promise<number[]> {
    return (await this.computeSourceEmbeddings([query]))[0];
  }

  /** Retry wrapper with exponential backoff (reference base.py). */
  async withRetry<T>(fn: () => Promise<T>, retries = 5): Promise<T> {
    let delay = 500;
    for (let attempt = 0; ; attempt++) {
      try {
        return await fn();
      } catch (e) {
        if (attempt >= retries - 1) throw e;
        await new Promise((r) => setTimeout(r, Math.min(delay, 8000)));
        delay *= 2;
      }
    }
  }
}

type EmbeddingFunctionCtor = new (config?: Record<string, unknown>) => EmbeddingFunction;

const METADATA_KEY = "embedding_functions";

export class EmbeddingFunctionRegistry {
  private static instance: EmbeddingFunctionRegistry | undefined;
  private functions = new Map<string, EmbeddingFunctionCtor>();

  static getInstance(): EmbeddingFunctionRegistry {
    if (!this.instance) {
      this.instance = new EmbeddingFunctionRegistry();
      registerBuiltins(this.instance);
    }
    return this.instance;
  }

  register(name: string, ctor: EmbeddingFunctionCtor): void {
    this.functions.set(name, ctor);
  }

  get(name: string): { create: (config?: Record<string, unknown>) => EmbeddingFunction } {
    const ctor = this.functions.get(name);
    if (!ctor) {
      throw new Error(
        `no embedding function registered under '${name}'; available: ${[...this.functions.keys()].sort().join(", ")}`,
      );
    }
    return { create: (config?: Record<string, unknown>) => new ctor(config) };
  }

  list(): string[] {
    return [...this.functions.keys()].sort();
  }

  /** Python-compatible schema metadata document. */
  metadataDocument(definitions: EmbeddingDefinition[]): [string, string] {
    const doc = definitions.map((d) => ({
      source_column: d.sourceColumn,
      vector_column: d.vectorColumn ?? "vector",
      name: d.functionName,
      model: d.config ?? {},
    }));
    return [METADATA_KEY, JSON.stringify(doc)];
  }

  /** Parse the Python-side metadata back into live functions keyed by
   * vector column. */
  parseMetadata(raw: string): Map<string, { fn: EmbeddingFunction; sourceColumn: string }> {
    const out = new Map<string, { fn: EmbeddingFunction; sourceColumn: string }>();
    for (const entry of JSON.parse(raw) as Array<Record<string, unknown>>) {
      const fn = this.get(entry.name as string).create(
        entry.model as Record<string, unknown>,
      );
      out.set(entry.vector_column as string, {
        fn,
        sourceColumn: entry.source_column as string,
      });
    }
    return out;
  }
}

export function getRegistry(): EmbeddingFunctionRegistry {
  return EmbeddingFunctionRegistry.getInstance();
}

// ---------------------------------------------------------------------------
// providers (fetch-based; wire shapes mirror python rest_providers.py)
// ---------------------------------------------------------------------------

abstract class RestEmbedding extends EmbeddingFunction {
  protected abstract defaultBaseUrl: string;
  protected abstract apiKeyEnv: string;
  protected abstract defaultModel: string;
  protected maxBatch = 128;
  private dims: number | undefined;

  protected get baseUrl(): string {
    return ((this.config.baseUrl as string) ?? this.defaultBaseUrl).replace(/\/$/, "");
  }

  protected get model(): string {
    return (this.config.model as string) ?? this.defaultModel;
  }

  protected apiKey(): string {
    const key =
      (this.config.apiKey as string) ?? process.env[this.apiKeyEnv] ?? "";
    if (!key && this.apiKeyEnv) {
      throw new Error(
        `${this.constructor.name} needs an API key: pass apiKey or set $${this.apiKeyEnv}`,
      );
    }
    return key;
  }

  protected async post(path: string, body: unknown, headers: Record<string, string> = {}) {
    const resp = await fetch(`${this.baseUrl}${path}`, {
      method: "POST",
      headers: { "content-type": "application/json", ...headers },
      body: JSON.stringify(body),
    });
    if (!resp.ok) {
      throw new Error(`${this.constructor.name}: HTTP ${resp.status} ${await resp.text()}`);
    }
    return resp.json();
  }

  async ndims(): Promise<number> {
    if (this.config.ndims) return this.config.ndims as number;
    if (this.dims === undefined) {
      this.dims = (await this.computeSourceEmbeddings(["probe"]))[0].length;
    }
    return this.dims;
  }

  async computeSourceEmbeddings(texts: string[]): Promise<number[][]> {
    const out: number[][] = [];
    for (let i = 0; i < texts.length; i += this.maxBatch) {
      const chunk = texts.slice(i, i + this.maxBatch);
      out.push(...(await this.withRetry(() => this.embedBatch(chunk))));
    }
    return out;
  }

  protected abstract embedBatch(texts: string[]): Promise<number[][]>;
}

export class OpenAIEmbedding extends RestEmbedding {
  protected defaultBaseUrl = "https://api.openai.com";
  protected apiKeyEnv = "OPENAI_API_KEY";
  protected defaultModel = "text-embedding-3-small";

  protected async embedBatch(texts: string[]): Promise<number[][]> {
    const r = (await this.post(
      "/v1/embeddings",
      { model: this.model, input: texts },
      { authorization: `Bearer ${this.apiKey()}` },
    )) as { data: Array<{ index: number; embedding: number[] }> };
    return r.data.sort((a, b) => a.index - b.index).map((d) => d.embedding);
  }
}

export class CohereEmbedding extends RestEmbedding {
  protected defaultBaseUrl = "https://api.cohere.com";
  protected apiKeyEnv = "COHERE_API_KEY";
  protected defaultModel = "embed-v4.0";
  protected maxBatch = 96;

  protected async embedBatch(texts: string[]): Promise<number[][]> {
    const r = (await this.post(
      "/v2/embed",
      {
        model: this.model,
        texts,
        input_type: "search_document",
        embedding_types: ["float"],
      },
      { authorization: `Bearer ${this.apiKey()}` },
    )) as { embeddings: { float: number[][] } | number[][] };
    return Array.isArray(r.embeddings) ? r.embeddings : r.embeddings.float;
  }
}

export class OllamaEmbedding extends RestEmbedding {
  protected defaultBaseUrl = "http://localhost:11434";
  protected apiKeyEnv = "";
  protected defaultModel = "nomic-embed-text";

  protected async embedBatch(texts: string[]): Promise<number[][]> {
    const r = (await this.post("/api/embed", { model: this.model, input: texts })) as {
      embeddings: number[][];
    };
    return r.embeddings;
  }
}

export class JinaEmbedding extends RestEmbedding {
  protected defaultBaseUrl = "https://api.jina.ai";
  protected apiKeyEnv = "JINA_API_KEY";
  protected defaultModel = "jina-embeddings-v3";

  protected async embedBatch(texts: string[]): Promise<number[][]> {
    const r = (await this.post(
      "/v1/embeddings",
      { model: this.model, input: texts },
      { authorization: `Bearer ${this.apiKey()}` },
    )) as { data: Array<{ index: number; embedding: number[] }> };
    return r.data.sort((a, b) => a.index - b.index).map((d) => d.embedding);
  }
}

export class VoyageAIEmbedding extends RestEmbedding {
  protected defaultBaseUrl = "https://api.voyageai.com";
  protected apiKeyEnv = "VOYAGE_API_KEY";
  protected defaultModel = "voyage-3";

  protected async embedBatch(texts: string[]): Promise<number[][]> {
    const r = (await this.post(
      "/v1/embeddings",
      { model: this.model, input: texts },
      { authorization: `Bearer ${this.apiKey()}` },
    )) as { data: Array<{ index: number; embedding: number[] }> };
    return r.data.sort((a, b) => a.index - b.index).map((d) => d.embedding);
  }
}

/** Deterministic offline provider for tests (python providers.py 'hash'). */
export class HashEmbedding extends EmbeddingFunction {
  private dim = (this.config.ndims as number) ?? 32;

  async ndims(): Promise<number> {
    return this.dim;
  }

  async computeSourceEmbeddings(texts: string[]): Promise<number[][]> {
    return texts.map((t) => {
      const v = new Array<number>(this.dim).fill(0);
      let h = 2166136261;
      for (let i = 0; i < t.length; i++) {
        h = Math.imul(h ^ t.charCodeAt(i), 16777619) >>> 0;
        v[i % this.dim] += (h % 1000) / 1000;
      }
      const norm = Math.sqrt(v.reduce((s, x) => s + x * x, 0)) || 1;
      return v.map((x) => x / norm);
    });
  }
}

function registerBuiltins(reg: EmbeddingFunctionRegistry): void {
  reg.register("openai", OpenAIEmbedding);
  reg.register("cohere", CohereEmbedding);
  reg.register("ollama", OllamaEmbedding);
  reg.register("jinaai", JinaEmbedding);
  reg.register("voyageai", VoyageAIEmbedding);
  reg.register("hash", HashEmbedding);
}
