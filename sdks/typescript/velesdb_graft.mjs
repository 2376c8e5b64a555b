/**
 * TypeScript/JavaScript SDK for the graft engine's REST surface.
 *
 * Mirrors the reference TypeScript SDK's object model
 * (reference: sdks/typescript/src/client.ts — createCollection / insert /
 * search / textSearch / hybridSearch / query / graph ops) over the graft
 * REST wire contract, exactly as python/velesdb_graft.py does: one engine
 * behind REST, so the SDK is a thin typed HTTP client by design. The
 * reference's WASM backend is an embedded-core concern with no Spark
 * analog; the REST backend is the supported one.
 *
 * Plain ESM + JSDoc types (checkable with `tsc --checkJs`, declarations
 * in velesdb_graft.d.ts) so it runs directly under Node ≥ 18 (built-in
 * fetch) without a build step.
 *
 * @example
 *   import { Client } from "./velesdb_graft.mjs";
 *   const db = new Client("http://127.0.0.1:8080");
 *   const col = await db.createCollection("docs", { vectorCol: "vector" });
 *   await col.upsert([{ id: 1, vector: [1, 0], payload: { t: "a" } }]);
 *   const hits = await col.search([1, 0.1], { topK: 5 });
 *   const rows = await db.query("SELECT id FROM docs WHERE vector NEAR $q LIMIT 3",
 *                               { q: [1, 0] });
 */

/** Non-2xx response from the server (carries status + body). */
export class ApiError extends Error {
  /** @param {number} status @param {string} body */
  constructor(status, body) {
    super(`HTTP ${status}: ${body}`);
    this.status = status;
    this.body = body;
  }
}

class Http {
  /** @param {string} baseUrl @param {number} [timeoutMs] */
  constructor(baseUrl, timeoutMs = 120000) {
    this.base = baseUrl.replace(/\/+$/, "");
    this.timeoutMs = timeoutMs;
  }

  /** @param {string} method @param {string} path @param {unknown} [body] */
  async call(method, path, body) {
    const res = await fetch(this.base + path, {
      method,
      headers: body !== undefined ? { "Content-Type": "application/json" } : {},
      body: body !== undefined ? JSON.stringify(body) : undefined,
      signal: AbortSignal.timeout(this.timeoutMs),
    });
    const text = await res.text();
    if (!res.ok) throw new ApiError(res.status, text);
    return text ? JSON.parse(text) : null;
  }

  get(path) { return this.call("GET", path); }
  post(path, body = {}) { return this.call("POST", path, body); }
  del(path) { return this.call("DELETE", path); }
}

/** The reference SDK's `VelesDB` role (client.ts) over REST. */
export class Client {
  /** @param {string} baseUrl @param {{timeoutMs?: number}} [opts] */
  constructor(baseUrl, opts = {}) {
    this._h = new Http(baseUrl, opts.timeoutMs);
  }

  health() { return this._h.get("/health"); }
  metrics() { return this._h.get("/metrics"); }
  listCollections() { return this._h.get("/collections"); }

  /**
   * @param {string} name
   * @param {{metric?: string, storageMode?: string, idCol?: string,
   *          vectorCol?: string, graphSchema?: object}} [config]
   * @returns {Promise<Collection>}
   */
  async createCollection(name, config = {}) {
    /** @type {Record<string, unknown>} */
    const body = { name, metric: config.metric ?? "cosine",
      id_col: config.idCol ?? "id" };
    if (config.vectorCol !== undefined) body.vector_col = config.vectorCol;
    if (config.storageMode !== undefined) body.storage_mode = config.storageMode;
    if (config.graphSchema !== undefined) body.graph_schema = config.graphSchema;
    await this._h.post("/collections", body);
    return new Collection(this._h, name);
  }

  /** Collection handle, or null if absent (the reference getCollection contract). */
  async getCollection(name) {
    try {
      await this._h.get(`/collections/${name}`);
      return new Collection(this._h, name);
    } catch (e) {
      if (e instanceof ApiError && e.status === 404) return null;
      throw e;
    }
  }

  deleteCollection(name) { return this._h.del(`/collections/${name}`); }

  /** `POST /query` — the unified VelesQL endpoint (SELECT/NEAR/MATCH/
   * aggregates), `params` binding `$name` placeholders. */
  query(velesql, params = {}) {
    return this._h.post("/query", { query: velesql, params });
  }

  explain(velesql) {
    return this._h.post("/query/explain", { query: velesql });
  }

  /** `POST /analytics/events` — one-shot events analytics with an
   * explicit execution mode. `op`: "window" | "sessions" |
   * "attribution". `mode: "batch"` (default) runs the transform as its
   * plain batch twin — the right call for one-shot queries;
   * `mode: "stream"` runs the same transform as a real micro-batch
   * query to completion. Both return the same rows.
   * @param {string} op
   * @param {{mode?: "batch"|"stream", params?: Record<string,string>, limit?: number}} [opts] */
  eventsAnalytics(op, opts = {}) {
    return this._h.post("/analytics/events", {
      op,
      mode: opts.mode ?? "batch",
      params: opts.params ?? {},
      limit: opts.limit ?? 1000,
    });
  }
}

/** The reference SDK's per-collection surface over REST. */
export class Collection {
  /** @param {Http} http @param {string} name */
  constructor(http, name) {
    this._h = http;
    this.name = name;
  }

  /** @param {string} [suffix] */
  _p(suffix = "") { return `/collections/${this.name}${suffix}`; }

  info() { return this._h.get(this._p()); }
  async count() { return (await this.info()).points_count; }
  async isEmpty() { return (await this._h.get(this._p("/empty"))).is_empty; }

  /** @param {Array<{id: number, vector?: number[], payload?: object}>} points */
  upsert(points) { return this._h.post(this._p("/points"), { points }); }

  /** Point objects for each id; null where the id is absent. */
  async get(ids) {
    const out = [];
    for (const i of ids) {
      try { out.push(await this._h.get(this._p(`/points/${i}`))); }
      catch (e) {
        if (e instanceof ApiError && e.status === 404) out.push(null);
        else throw e;
      }
    }
    return out;
  }

  async delete(ids) {
    for (const i of ids) await this._h.del(this._p(`/points/${i}`));
  }

  /** One keyset page: {points, count, next_after_id}. */
  points(limit = 100, afterId = undefined) {
    let q = `?limit=${limit}`;
    if (afterId !== undefined && afterId !== null) q += `&after_id=${afterId}`;
    return this._h.get(this._p(`/points${q}`));
  }

  /** Iterate every point via keyset pagination. */
  async *scroll(pageSize = 100) {
    let after = undefined;
    for (;;) {
      const page = await this.points(pageSize, after);
      for (const p of page.points) yield p;
      after = page.next_after_id;
      if (after === undefined || after === null) return;
    }
  }

  flush() { return this._h.post(this._p("/flush")); }

  /**
   * @param {number[]} vector
   * @param {{topK?: number, filter?: object, [k: string]: unknown}} [opts]
   */
  async search(vector, opts = {}) {
    const { topK = 10, filter, ...rest } = opts;
    /** @type {Record<string, unknown>} */
    const body = { vector: Array.from(vector), top_k: topK, ...rest };
    if (filter !== undefined) body.filter = filter;
    return (await this._h.post(this._p("/search"), body)).results;
  }

  async textSearch(query, opts = {}) {
    const { topK = 10, filter } = opts;
    /** @type {Record<string, unknown>} */
    const body = { query, top_k: topK };
    if (filter !== undefined) body.filter = filter;
    return (await this._h.post(this._p("/search/text"), body)).results;
  }

  async hybridSearch(query, vector, opts = {}) {
    const { topK = 10, vectorWeight = 0.5, filter } = opts;
    /** @type {Record<string, unknown>} */
    const body = { query, vector: Array.from(vector), top_k: topK,
      vector_weight: vectorWeight };
    if (filter !== undefined) body.filter = filter;
    return (await this._h.post(this._p("/search/hybrid"), body)).results;
  }

  /** searches: [{vector, top_k, filter?}] — per-item filters. */
  async batchSearch(searches) {
    return (await this._h.post(this._p("/search/batch"), { searches })).results;
  }

  async multiQuerySearch(vectors, opts = {}) {
    const { topK = 10, strategy = "rrf", ...rest } = opts;
    const body = { vectors: vectors.map(v => Array.from(v)), top_k: topK,
      strategy, ...rest };
    return (await this._h.post(this._p("/search/multi"), body)).results;
  }

  // -- graph ------------------------------------------------------------
  /** edges: [{source, target, label, id?, properties?}] */
  upsertEdges(edges) { return this._h.post(this._p("/graph/edges"), { edges }); }
  edges(label, limit = 1000) {
    return this._h.get(this._p(`/graph/edges?label=${label}&limit=${limit}`));
  }
  deleteEdge(edgeId) { return this._h.del(this._p(`/graph/edges/${edgeId}`)); }
  nodeEdges(nodeId) { return this._h.get(this._p(`/graph/nodes/${nodeId}/edges`)); }
  degree(nodeId) { return this._h.get(this._p(`/graph/nodes/${nodeId}/degree`)); }

  traverse(source, opts = {}) {
    const { maxDepth = 3, limit = 100, relTypes } = opts;
    /** @type {Record<string, unknown>} */
    const body = { source, max_depth: maxDepth, limit };
    if (relTypes !== undefined) body.rel_types = relTypes;
    return this._h.post(this._p("/graph/traverse"), body);
  }

  shortestPaths(starts, opts = {}) {
    const { maxHops = 3, limit = 100, relTypes } = opts;
    /** @type {Record<string, unknown>} */
    const body = { starts: Array.from(starts), max_hops: maxHops, limit };
    if (relTypes !== undefined) body.rel_types = relTypes;
    return this._h.post(this._p("/graph/shortest_paths"), body);
  }

  pagerank(opts = {}) {
    const { iters = 3, seeds, ...rest } = opts;
    /** @type {Record<string, unknown>} */
    const body = { iters, ...rest };
    if (seeds !== undefined) body.seeds = Array.from(seeds);
    return this._h.post(this._p("/graph/pagerank"), body);
  }

  /** A MATCH query scoped to THIS collection's edge store. */
  match(pattern) { return this._h.post(this._p("/match"), { match: pattern }); }

  // -- indexes / snapshots ----------------------------------------------
  createIndex(label, property, indexType = "range") {
    return this._h.post(this._p("/indexes"),
      { label, property, index_type: indexType });
  }
  listIndexes() { return this._h.get(this._p("/indexes")); }
  dropIndex(label, property) {
    return this._h.del(this._p(`/indexes/${label}/${property}`));
  }
  retrainIndexes() { return this._h.post(this._p("/indexes/retrain")); }

  snapshot(tag) { return this._h.post(this._p("/snapshots"), { tag }); }
  listSnapshots() { return this._h.get(this._p("/snapshots")); }
  snapshotPoints(tag, limit = 100, afterId = undefined) {
    let q = `?limit=${limit}`;
    if (afterId !== undefined && afterId !== null) q += `&after_id=${afterId}`;
    return this._h.get(this._p(`/snapshots/${tag}/points${q}`));
  }
  restore(tag) { return this._h.post(this._p(`/snapshots/${tag}/restore`)); }
  dropSnapshot(tag) { return this._h.del(this._p(`/snapshots/${tag}`)); }
}
