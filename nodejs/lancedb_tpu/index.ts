/**
 * @lancedb-tpu/lancedb — TypeScript client for the lancedb-tpu vector
 * database (TS parity surface of the reference nodejs/lancedb SDK,
 * speaking REST + Arrow IPC to the lancedb-tpu query server).
 */

export { connect, Connection, ConnectionOptions } from "./connection.js";
export { Table, TableDescription, FieldDescriptor, MergeInsertOptions } from "./table.js";
export { VectorQuery, FtsQuery, PlainQuery, HybridQuery } from "./query.js";
export { Index, IvfPqOptions, IvfFlatOptions, HnswOptions, FtsOptions, DistanceType } from "./indices.js";
export { RestClient, ClientConfig, TlsConfig, HttpError } from "./client.js";
export {
  FtsQueryNode,
  MatchQuery,
  PhraseQuery,
  BoostQuery,
  MultiMatchQuery,
  BooleanQuery,
  FullTextQuery,
  Occur,
  FtsOperator,
} from "./fts.js";
export { RemoteJob, JobInfo, JobStatus, JobFailedError } from "./jobs.js";
export { makeArrowTable, makeFixedSizeListVector, defaultVectorColumn } from "./arrow.js";
export {
  EmbeddingDefinition,
  EmbeddingFunction,
  EmbeddingFunctionRegistry,
  getRegistry,
  OpenAIEmbedding,
  CohereEmbedding,
  OllamaEmbedding,
  JinaEmbedding,
  VoyageAIEmbedding,
  HashEmbedding,
} from "./embeddings.js";
export { Reranker, RRFReranker, LinearCombinationReranker } from "./rerankers.js";
export { MergeInsertBuilder, MergeStats, WriteExecutionOptions } from "./merge.js";
export {
  PermutationBuilder,
  permutationBuilder,
  SplitRandomOptions,
  SplitHashOptions,
  SplitSequentialOptions,
  SplitCalculatedOptions,
  ShuffleOptions,
  PermutationResult,
} from "./permutation.js";
export {
  HeaderProvider,
  StaticHeaderProvider,
  CallbackHeaderProvider,
  OAuthHeaderProvider,
  OAuthConfig,
  TokenResponse,
  resolveHeaders,
} from "./header.js";
export { toSQL, packBits, TTLCache, IntoSql } from "./util.js";
export {
  sanitizeSchema,
  sanitizeField,
  sanitizeType,
  sanitizeMetadata,
  isDataTypeLike,
} from "./sanitize.js";
export { instrumentLanceDbMetrics, InMemoryMeter, MeterLike } from "./otel.js";
export { RequestObserver } from "./client.js";
export { Scannable, ScannableOptions, addScannable } from "./scannable.js";
