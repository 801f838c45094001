/**
 * Index configuration factory — mirrors the reference TS SDK's
 * `Index` factory and option interfaces (reference nodejs indices.ts:
 * IvfPq/IvfFlat/HnswPq/HnswSq/Fts options) mapped onto the lancedb-tpu
 * server's create_index body. Defaults follow the reference
 * (partitions≈√N, PQ subvectors=dim/16, sampleRate=256,
 * maxIterations=50) and are resolved server-side at build time.
 */

export type DistanceType = "l2" | "cosine" | "dot" | "hamming";

interface KMeansOptions {
  /** Training sample per centroid (reference default 256). */
  sampleRate?: number;
  /** k-means iteration cap (reference default 50). */
  maxIterations?: number;
}

export interface IvfPqOptions extends KMeansOptions {
  distanceType?: DistanceType;
  /** IVF partition count; default ≈ √numRows at build time. */
  numPartitions?: number;
  /** PQ subvector count; default dim/16. */
  numSubVectors?: number;
  /** 4 or 8 (4-bit is the TPU-native fast path: two codes per byte,
   * scanned by the Pallas ADC kernel). */
  numBits?: number;
}

export interface IvfFlatOptions extends KMeansOptions {
  distanceType?: DistanceType;
  numPartitions?: number;
}

export interface HnswOptions extends KMeansOptions {
  distanceType?: DistanceType;
  numPartitions?: number;
  /** PQ subvectors for the hnswPq variant. */
  numSubVectors?: number;
  /** PQ bits for the hnswPq variant (4 or 8). */
  numBits?: number;
  /** Graph out-degree (reference default 20). */
  m?: number;
  /** Build-time beam width (reference default 300). */
  efConstruction?: number;
}

export interface FtsOptions {
  /** Record token positions (phrase queries need them). */
  withPosition?: boolean;
  /** Named preset resolving the options below (e.g. "en_stem"). */
  tokenizerName?: string;
  baseTokenizer?: "simple" | "whitespace" | "raw" | "ngram";
  /** Stemmer/stop-word language (reference default "English"). */
  language?: string;
  maxTokenLength?: number;
  lowerCase?: boolean;
  stem?: boolean;
  removeStopWords?: boolean;
  asciiFolding?: boolean;
  /** ngram tokenizer bounds (baseTokenizer: "ngram"). */
  ngramMinLength?: number;
  ngramMaxLength?: number;
  /** Index only prefixes (autocomplete-style matching). */
  prefixOnly?: boolean;
}

/** Serialized form sent to POST /v1/table/{name}/create_index. */
export interface IndexConfig {
  index_type: string;
  column?: string;
  metric_type?: string;
  num_partitions?: number;
  num_sub_vectors?: number;
  num_bits?: number;
  sample_rate?: number;
  max_iterations?: number;
  m?: number;
  ef_construction?: number;
  with_position?: boolean;
  tokenizer_name?: string;
  base_tokenizer?: string;
  language?: string;
  max_token_length?: number;
  lower_case?: boolean;
  stem?: boolean;
  remove_stop_words?: boolean;
  ascii_folding?: boolean;
  ngram_min_length?: number;
  ngram_max_length?: number;
  prefix_only?: boolean;
}

function vectorBody(indexType: string, o: IvfPqOptions & HnswOptions): IndexConfig {
  return {
    index_type: indexType,
    metric_type: o.distanceType ?? "l2",
    num_partitions: o.numPartitions,
    num_sub_vectors: o.numSubVectors,
    num_bits: o.numBits,
    sample_rate: o.sampleRate,
    max_iterations: o.maxIterations,
    m: o.m,
    ef_construction: o.efConstruction,
  };
}

export class Index {
  private constructor(public readonly config: IndexConfig) {}

  /** IVF + product quantization — the TPU-native capacity/throughput
   * workhorse (16 B/row at 128-d 8-bit). */
  static ivfPq(options: IvfPqOptions = {}): Index {
    return new Index(vectorBody("IVF_PQ", options));
  }

  /** IVF over full-precision vectors: exact in-partition ranking. */
  static ivfFlat(options: IvfFlatOptions = {}): Index {
    return new Index(vectorBody("IVF_FLAT", options));
  }

  /** IVF + scalar (int8) quantization. */
  static ivfSq(options: IvfFlatOptions = {}): Index {
    return new Index(vectorBody("IVF_SQ", options));
  }

  /** IVF + RaBitQ-style 1-bit residual quantization. */
  static ivfRq(options: IvfFlatOptions = {}): Index {
    return new Index(vectorBody("IVF_RQ", options));
  }

  /** Brute-force scan "index": metadata-only, exact results. */
  static flat(options: { distanceType?: DistanceType } = {}): Index {
    return new Index({ index_type: "FLAT", metric_type: options.distanceType ?? "l2" });
  }

  /** IVF partitions with per-partition HNSW graphs over PQ codes. */
  static hnswPq(options: HnswOptions = {}): Index {
    return new Index(vectorBody("IVF_HNSW_PQ", options));
  }

  /** IVF partitions with per-partition HNSW graphs over SQ codes. */
  static hnswSq(options: HnswOptions = {}): Index {
    return new Index(vectorBody("IVF_HNSW_SQ", options));
  }

  /** HNSW over full-precision vectors (low-latency host-walk serving). */
  static hnswFlat(options: HnswOptions = {}): Index {
    return new Index(vectorBody("IVF_HNSW_FLAT", options));
  }

  /** Sorted scalar index for range/equality pushdown. */
  static btree(): Index {
    return new Index({ index_type: "BTREE" });
  }

  /** Bitmap per distinct value (low-cardinality columns). */
  static bitmap(): Index {
    return new Index({ index_type: "BITMAP" });
  }

  /** Bitmap over list elements (`array_contains` pushdown). */
  static labelList(): Index {
    return new Index({ index_type: "LABEL_LIST" });
  }

  /** FM-sketch distinct-count index. */
  static fm(): Index {
    return new Index({ index_type: "FM" });
  }

  /** BM25 inverted index (full-text search). */
  static fts(options: FtsOptions = {}): Index {
    return new Index({
      index_type: "FTS",
      with_position: options.withPosition ?? true,
      tokenizer_name: options.tokenizerName,
      base_tokenizer: options.baseTokenizer,
      language: options.language,
      max_token_length: options.maxTokenLength,
      lower_case: options.lowerCase,
      stem: options.stem,
      remove_stop_words: options.removeStopWords,
      ascii_folding: options.asciiFolding,
      ngram_min_length: options.ngramMinLength,
      ngram_max_length: options.ngramMaxLength,
      prefix_only: options.prefixOnly,
    });
  }

  /** Let the server pick by column type and row count (reference
   * Index::Auto). */
  static auto(): Index {
    return new Index({ index_type: "AUTO" });
  }
}
