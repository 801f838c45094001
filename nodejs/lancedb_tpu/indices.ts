/**
 * Index configuration factory — mirrors the reference TS SDK's
 * `Index` factory and option interfaces (reference nodejs indices.ts:
 * IvfPq/IvfFlat/HnswPq/HnswSq/Fts options) mapped onto the lancedb-tpu
 * server's create_index body.
 */

export type DistanceType = "l2" | "cosine" | "dot" | "hamming";

export interface IvfPqOptions {
  distanceType?: DistanceType;
  numPartitions?: number;
  numSubVectors?: number;
  /** 4 or 8 (4-bit is the TPU-native fast path). */
  numBits?: number;
  sampleRate?: number;
  maxIterations?: number;
}

export interface IvfFlatOptions {
  distanceType?: DistanceType;
  numPartitions?: number;
  sampleRate?: number;
  maxIterations?: number;
}

export interface HnswOptions {
  distanceType?: DistanceType;
  numPartitions?: number;
  numSubVectors?: number;
  m?: number;
  efConstruction?: number;
}

export interface FtsOptions {
  withPosition?: boolean;
  baseTokenizer?: "simple" | "whitespace" | "raw" | "ngram";
}

/** Serialized form sent to POST /v1/table/{name}/create_index. */
export interface IndexConfig {
  index_type: string;
  column?: string;
  metric_type?: string;
  num_partitions?: number;
  num_sub_vectors?: number;
  num_bits?: number;
  with_position?: boolean;
  base_tokenizer?: string;
}

function vectorBody(indexType: string, o: IvfPqOptions & HnswOptions): IndexConfig {
  return {
    index_type: indexType,
    metric_type: o.distanceType ?? "l2",
    num_partitions: o.numPartitions,
    num_sub_vectors: o.numSubVectors,
    num_bits: o.numBits,
  };
}

export class Index {
  private constructor(public readonly config: IndexConfig) {}

  static ivfPq(options: IvfPqOptions = {}): Index {
    return new Index(vectorBody("IVF_PQ", options));
  }

  static ivfFlat(options: IvfFlatOptions = {}): Index {
    return new Index(vectorBody("IVF_FLAT", options));
  }

  static ivfSq(options: IvfFlatOptions = {}): Index {
    return new Index(vectorBody("IVF_SQ", options));
  }

  static ivfRq(options: IvfFlatOptions = {}): Index {
    return new Index(vectorBody("IVF_RQ", options));
  }

  static flat(options: { distanceType?: DistanceType } = {}): Index {
    return new Index({ index_type: "FLAT", metric_type: options.distanceType ?? "l2" });
  }

  static hnswPq(options: HnswOptions = {}): Index {
    return new Index(vectorBody("IVF_HNSW_PQ", options));
  }

  static hnswSq(options: HnswOptions = {}): Index {
    return new Index(vectorBody("IVF_HNSW_SQ", options));
  }

  static btree(): Index {
    return new Index({ index_type: "BTREE" });
  }

  static bitmap(): Index {
    return new Index({ index_type: "BITMAP" });
  }

  static labelList(): Index {
    return new Index({ index_type: "LABEL_LIST" });
  }

  static fm(): Index {
    return new Index({ index_type: "FM" });
  }

  static fts(options: FtsOptions = {}): Index {
    return new Index({
      index_type: "FTS",
      with_position: options.withPosition ?? true,
      base_tokenizer: options.baseTokenizer ?? "simple",
    });
  }
}
