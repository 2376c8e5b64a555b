"""Python SDK for the graft engine's REST surface.

Standard-library only (urllib + json): the client mirrors the reference
Python binding's object model (crates/velesdb-python/src/lib.rs:198-351
`Database`, collection.rs `Collection`) over the engine's REST wire
contract instead of an embedded core — on Spark there is one engine
behind REST, the CLI and the library, so the SDK is a thin HTTP client
by design.

    >>> from velesdb_graft import Client
    >>> db = Client("http://127.0.0.1:8080")
    >>> col = db.create_collection("docs", vector_col="vector")
    >>> col.upsert([{"id": 1, "vector": [1.0, 0.0], "payload": {"t": "a"}}])
    >>> col.search([1.0, 0.1], top_k=5)
    >>> db.query("SELECT id FROM docs WHERE vector NEAR $q LIMIT 3",
    ...          params={"q": [1.0, 0.0]})
"""

import json
import urllib.request
import urllib.error

__all__ = ["Client", "Collection", "ApiError"]


class ApiError(RuntimeError):
    """Non-2xx response from the server (carries status + body)."""

    def __init__(self, status, body):
        super().__init__(f"HTTP {status}: {body}")
        self.status = status
        self.body = body


class _Http:
    def __init__(self, base_url, timeout=120):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def call(self, method, path, body=None):
        data = json.dumps(body).encode("utf-8") if body is not None else None
        req = urllib.request.Request(
            self.base + path, data=data, method=method,
            headers={"Content-Type": "application/json"} if data else {})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return json.loads(r.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            raise ApiError(e.code, e.read().decode("utf-8", "replace")) from None

    def get(self, path):
        return self.call("GET", path)

    def post(self, path, body=None):
        return self.call("POST", path, body if body is not None else {})

    def delete(self, path):
        return self.call("DELETE", path)


class Client:
    """The reference SDK's `Database` role (lib.rs:198-351) over REST."""

    def __init__(self, base_url, timeout=120):
        self._h = _Http(base_url, timeout)

    # -- database surface ------------------------------------------------
    def health(self):
        return self._h.get("/health")

    def metrics(self):
        return self._h.get("/metrics")

    def list_collections(self):
        return self._h.get("/collections")

    def create_collection(self, name, metric="cosine", storage_mode=None,
                          id_col="id", vector_col=None, graph_schema=None):
        body = {"name": name, "metric": metric, "id_col": id_col}
        if vector_col is not None:
            body["vector_col"] = vector_col
        if storage_mode is not None:
            body["storage_mode"] = storage_mode
        if graph_schema is not None:
            body["graph_schema"] = graph_schema
        self._h.post("/collections", body)
        return Collection(self._h, name)

    def get_collection(self, name):
        """Collection handle, or None if absent (lib.rs:261 contract)."""
        try:
            self._h.get(f"/collections/{name}")
            return Collection(self._h, name)
        except ApiError as e:
            if e.status == 404:
                return None
            raise

    def delete_collection(self, name):
        return self._h.delete(f"/collections/{name}")

    # -- VelesQL ---------------------------------------------------------
    def query(self, velesql, params=None):
        """`POST /query` — the unified VelesQL endpoint (SELECT/NEAR/
        MATCH/aggregates), `params` binding `$name` placeholders."""
        return self._h.post("/query", {"query": velesql,
                                       "params": params or {}})

    def explain(self, velesql):
        return self._h.post("/query/explain", {"query": velesql})

    def events_analytics(self, op, mode="batch", params=None, limit=1000):
        """`POST /analytics/events` — one-shot events analytics with an
        explicit execution mode. `op` is "window" | "sessions" |
        "attribution"; `mode="batch"` (default) runs the transform as
        its plain batch twin (the right call for one-shot queries —
        micro-batch state-store overhead buys nothing without
        incremental arrival), `mode="stream"` runs the identical
        transform as a real micro-batch query to completion. Both
        return the same rows."""
        return self._h.post("/analytics/events", {
            "op": op, "mode": mode, "params": params or {}, "limit": limit})


class Collection:
    """The reference SDK's `Collection` role (collection.rs) over REST."""

    def __init__(self, http, name):
        self._h = http
        self.name = name

    def _p(self, suffix=""):
        return f"/collections/{self.name}{suffix}"

    # -- info / points ---------------------------------------------------
    def info(self):
        return self._h.get(self._p())

    def count(self):
        return self.info()["points_count"]

    def is_empty(self):
        return self._h.get(self._p("/empty"))["is_empty"]

    def upsert(self, points):
        """points: [{"id": int, "vector": [float...], "payload": {...}}]
        — vector/payload optional per the collection's declared shape."""
        return self._h.post(self._p("/points"), {"points": points})

    def get(self, ids):
        """Point dicts for each id; None where the id is absent
        (collection.rs:227 get contract)."""
        out = []
        for i in ids:
            try:
                out.append(self._h.get(self._p(f"/points/{i}")))
            except ApiError as e:
                if e.status == 404:
                    out.append(None)
                else:
                    raise
        return out

    def delete(self, ids):
        for i in ids:
            self._h.delete(self._p(f"/points/{i}"))

    def points(self, limit=100, after_id=None):
        """One keyset page: {points, count, next_after_id}."""
        q = f"?limit={limit}"
        if after_id is not None:
            q += f"&after_id={after_id}"
        return self._h.get(self._p(f"/points{q}"))

    def scroll(self, page_size=100):
        """Iterate every point via keyset pagination."""
        after = None
        while True:
            page = self.points(limit=page_size, after_id=after)
            for p in page["points"]:
                yield p
            after = page.get("next_after_id")
            if after is None:
                return

    def flush(self):
        return self._h.post(self._p("/flush"))

    # -- search ----------------------------------------------------------
    def search(self, vector, top_k=10, filter=None, **with_opts):
        body = {"vector": list(vector), "top_k": top_k}
        if filter is not None:
            body["filter"] = filter
        body.update(with_opts)
        return self._h.post(self._p("/search"), body)["results"]

    def search_with_filter(self, vector, filter, top_k=10):
        """collection.rs:359 naming; filter is the JSON condition DSL
        ({"condition": {"type": "eq", "field": ..., "value": ...}})."""
        return self.search(vector, top_k=top_k, filter=filter)

    def text_search(self, query, top_k=10, filter=None):
        body = {"query": query, "top_k": top_k}
        if filter is not None:
            body["filter"] = filter
        return self._h.post(self._p("/search/text"), body)["results"]

    def hybrid_search(self, query, vector, top_k=10, vector_weight=0.5,
                      filter=None):
        body = {"query": query, "vector": list(vector), "top_k": top_k,
                "vector_weight": vector_weight}
        if filter is not None:
            body["filter"] = filter
        return self._h.post(self._p("/search/hybrid"), body)["results"]

    def batch_search(self, searches):
        """searches: [{"vector": [...], "top_k": n, "filter": {...}}] —
        per-item filters (q57 semantics)."""
        return self._h.post(self._p("/search/batch"),
                            {"searches": searches})["results"]

    def multi_query_search(self, vectors, top_k=10, strategy="rrf", **kw):
        body = {"vectors": [list(v) for v in vectors], "top_k": top_k,
                "strategy": strategy}
        body.update(kw)
        return self._h.post(self._p("/search/multi"), body)["results"]

    # -- graph -----------------------------------------------------------
    def upsert_edges(self, edges):
        """edges: [{"source": id, "target": id, "label": str,
        "id": optional, "properties": {...}}]."""
        return self._h.post(self._p("/graph/edges"), {"edges": edges})

    def edges(self, label, limit=1000):
        return self._h.get(self._p(f"/graph/edges?label={label}&limit={limit}"))

    def delete_edge(self, edge_id):
        return self._h.delete(self._p(f"/graph/edges/{edge_id}"))

    def node_edges(self, node_id):
        return self._h.get(self._p(f"/graph/nodes/{node_id}/edges"))

    def degree(self, node_id):
        return self._h.get(self._p(f"/graph/nodes/{node_id}/degree"))

    def traverse(self, source, max_depth=3, limit=100, rel_types=None):
        body = {"source": source, "max_depth": max_depth, "limit": limit}
        if rel_types is not None:
            body["rel_types"] = rel_types
        return self._h.post(self._p("/graph/traverse"), body)

    def shortest_paths(self, starts, max_hops=3, limit=100, rel_types=None):
        body = {"starts": list(starts), "max_hops": max_hops, "limit": limit}
        if rel_types is not None:
            body["rel_types"] = rel_types
        return self._h.post(self._p("/graph/shortest_paths"), body)

    def pagerank(self, iters=3, seeds=None, **kw):
        body = {"iters": iters}
        if seeds is not None:
            body["seeds"] = list(seeds)
        body.update(kw)
        return self._h.post(self._p("/graph/pagerank"), body)

    def match(self, pattern):
        """A MATCH query scoped to THIS collection's edge store."""
        return self._h.post(self._p("/match"), {"match": pattern})

    # -- indexes / snapshots ---------------------------------------------
    def create_index(self, label, property, index_type="range"):
        return self._h.post(self._p("/indexes"),
                            {"label": label, "property": property,
                             "index_type": index_type})

    def list_indexes(self):
        return self._h.get(self._p("/indexes"))

    def drop_index(self, label, property):
        return self._h.delete(self._p(f"/indexes/{label}/{property}"))

    def retrain_indexes(self):
        return self._h.post(self._p("/indexes/retrain"))

    def snapshot(self, tag):
        return self._h.post(self._p("/snapshots"), {"tag": tag})

    def list_snapshots(self):
        return self._h.get(self._p("/snapshots"))

    def snapshot_points(self, tag, limit=100, after_id=None):
        q = f"?limit={limit}"
        if after_id is not None:
            q += f"&after_id={after_id}"
        return self._h.get(self._p(f"/snapshots/{tag}/points{q}"))

    def restore(self, tag):
        return self._h.post(self._p(f"/snapshots/{tag}/restore"))

    def drop_snapshot(self, tag):
        return self._h.delete(self._p(f"/snapshots/{tag}"))
