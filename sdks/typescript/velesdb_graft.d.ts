/**
 * Type declarations for the graft TypeScript SDK (velesdb_graft.mjs).
 * Mirrors the reference SDK's types surface (sdks/typescript/src/types.ts
 * VectorDocument / SearchResult / CollectionConfig) against the graft
 * REST wire contract.
 */

export interface Payload {
  [key: string]: unknown;
}

/**
 * Point ids ride JSON as numbers, so this SDK is exact only for ids up
 * to Number.MAX_SAFE_INTEGER (2^53 − 1). Ids minted by the Python
 * adapters' 63-bit SHA-256 hashing exceed that and silently lose
 * precision through JSON.parse — a get/delete round-trip can then
 * target the WRONG point. Use ≤2^53 ids from JS, or keep hashed-id
 * collections on the Python/REST surfaces.
 */
export interface Point {
  id: number;
  vector?: number[];
  payload?: Payload;
}

export interface SearchHit {
  id: number;
  score: number;
  payload?: Payload;
}

export interface CollectionConfig {
  metric?: "cosine" | "dot" | "euclidean" | "hamming" | "jaccard";
  storageMode?: "full" | "sq8" | "binary" | "pq" | "f16" | "bf16";
  idCol?: string;
  vectorCol?: string;
  graphSchema?: object;
}

export interface PointsPage {
  points: Point[];
  count: number;
  next_after_id?: number | null;
}

export interface QueryResponse {
  columns: string[];
  rows: unknown[][];
  [key: string]: unknown;
}

export declare class ApiError extends Error {
  status: number;
  body: string;
  constructor(status: number, body: string);
}

export declare class Client {
  constructor(baseUrl: string, opts?: { timeoutMs?: number });
  health(): Promise<unknown>;
  metrics(): Promise<unknown>;
  listCollections(): Promise<string[]>;
  createCollection(name: string, config?: CollectionConfig): Promise<Collection>;
  getCollection(name: string): Promise<Collection | null>;
  deleteCollection(name: string): Promise<unknown>;
  query(velesql: string, params?: Record<string, unknown>): Promise<QueryResponse>;
  explain(velesql: string): Promise<unknown>;
  eventsAnalytics(op: "window" | "sessions" | "attribution", opts?: {
    mode?: "batch" | "stream";
    params?: Record<string, string>;
    limit?: number;
  }): Promise<{ op: string; mode: string; count: number; results: unknown[] }>;
}

export declare class Collection {
  readonly name: string;
  info(): Promise<{ points_count: number; [k: string]: unknown }>;
  count(): Promise<number>;
  isEmpty(): Promise<boolean>;
  upsert(points: Point[]): Promise<unknown>;
  get(ids: Array<number>): Promise<Array<Point | null>>;
  delete(ids: Array<number>): Promise<void>;
  points(limit?: number, afterId?: number): Promise<PointsPage>;
  scroll(pageSize?: number): AsyncGenerator<Point>;
  flush(): Promise<unknown>;
  search(vector: number[], opts?: { topK?: number; filter?: object;
    [k: string]: unknown }): Promise<SearchHit[]>;
  textSearch(query: string, opts?: { topK?: number; filter?: object }): Promise<SearchHit[]>;
  hybridSearch(query: string, vector: number[], opts?: { topK?: number;
    vectorWeight?: number; filter?: object }): Promise<SearchHit[]>;
  batchSearch(searches: Array<{ vector: number[]; top_k?: number;
    filter?: object }>): Promise<SearchHit[][]>;
  multiQuerySearch(vectors: number[][], opts?: { topK?: number;
    strategy?: "rrf" | "average" | "maximum" | "weighted";
    [k: string]: unknown }): Promise<SearchHit[]>;
  upsertEdges(edges: Array<{ source: number; target: number; label: string;
    id?: number; properties?: Payload }>): Promise<unknown>;
  edges(label: string, limit?: number): Promise<unknown>;
  deleteEdge(edgeId: number): Promise<unknown>;
  nodeEdges(nodeId: number): Promise<unknown>;
  degree(nodeId: number): Promise<unknown>;
  traverse(source: number, opts?: { maxDepth?: number; limit?: number;
    relTypes?: string[] }): Promise<unknown>;
  shortestPaths(starts: number[], opts?: { maxHops?: number; limit?: number;
    relTypes?: string[] }): Promise<unknown>;
  pagerank(opts?: { iters?: number; seeds?: number[];
    [k: string]: unknown }): Promise<unknown>;
  match(pattern: string): Promise<unknown>;
  createIndex(label: string, property: string, indexType?: string): Promise<unknown>;
  listIndexes(): Promise<unknown>;
  dropIndex(label: string, property: string): Promise<unknown>;
  retrainIndexes(): Promise<unknown>;
  snapshot(tag: string): Promise<unknown>;
  listSnapshots(): Promise<unknown>;
  snapshotPoints(tag: string, limit?: number, afterId?: number): Promise<PointsPage>;
  restore(tag: string): Promise<unknown>;
  dropSnapshot(tag: string): Promise<unknown>;
}
