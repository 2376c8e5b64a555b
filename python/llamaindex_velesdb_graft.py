"""LlamaIndex VectorStore adapter over the graft engine's REST surface.

Mirrors the reference integration's surface
(integrations/llamaindex/src/llamaindex_velesdb/vectorstore.py:
`VelesDBVectorStore` — add / delete / query / text_query / hybrid_query /
batch_query / velesql / get_nodes / metadata collections) with the
engine's REST client underneath (velesdb_graft.Client) instead of an
embedded core.

LlamaIndex itself is OPTIONAL: when `llama_index.core` is importable the
adapter returns real `TextNode`s and accepts real `VectorStoreQuery`
objects; otherwise lightweight stand-ins with the same field contract
are used, so the adapter is fully exercisable (and tested) without the
dependency. Embeddings always arrive ON the nodes (LlamaIndex's
convention: the caller embeds before `add`).
"""

import hashlib

from velesdb_graft import Client

try:  # real LlamaIndex when present
    from llama_index.core.schema import TextNode  # type: ignore
    from llama_index.core.vector_stores.types import (  # type: ignore
        VectorStoreQuery, VectorStoreQueryResult)
    _HAVE_LLAMAINDEX = True
except ImportError:  # stand-ins with the same field contract
    _HAVE_LLAMAINDEX = False

    class TextNode:  # noqa: D401 - minimal TextNode shape
        """text + id_ + embedding + metadata, the fields consumers read."""

        def __init__(self, text="", id_=None, embedding=None, metadata=None):
            self.text = text
            self.id_ = id_
            self.embedding = embedding
            self.metadata = metadata or {}

        @property
        def node_id(self):
            return self.id_

        def get_content(self, metadata_mode=None):
            return self.text

        def __repr__(self):
            return f"TextNode(id_={self.id_!r}, text={self.text!r})"

    class VectorStoreQuery:  # noqa: D401 - the query fields the adapter reads
        def __init__(self, query_embedding=None, similarity_top_k=10,
                     query_str=None, filters=None):
            self.query_embedding = query_embedding
            self.similarity_top_k = similarity_top_k
            self.query_str = query_str
            self.filters = filters

    class VectorStoreQueryResult:  # noqa: D401 - (nodes, similarities, ids)
        def __init__(self, nodes=None, similarities=None, ids=None):
            self.nodes = nodes or []
            self.similarities = similarities or []
            self.ids = ids or []


def _stable_hash_id(value):
    """String node id → positive 63-bit int (the reference's SHA256
    convention, vectorstore.py:38-56)."""
    digest = hashlib.sha256(str(value).encode("utf-8")).digest()
    return int.from_bytes(digest[:8], byteorder="big") & 0x7FFFFFFFFFFFFFFF


def _int_id(value):
    """One id convention for add/get/delete (see langchain adapter):
    in-range all-digit ids pass through, everything else hashes."""
    s = str(value)
    return int(s) if s.isdigit() and int(s) < 2 ** 63 else _stable_hash_id(s)


class GraftVectorStore:
    """LlamaIndex-compatible vector store over a graft REST server.

    >>> store = GraftVectorStore("http://127.0.0.1:8080", "docs")
    >>> store.add([TextNode(text="alpha", id_="a1", embedding=[1.0, 0.0])])
    >>> store.query(VectorStoreQuery(query_embedding=[1.0, 0.0],
    ...                              similarity_top_k=2))
    """

    stores_text = True  # LlamaIndex protocol flag: nodes round-trip whole

    def __init__(self, base_url, collection_name, metric="cosine",
                 storage_mode=None):
        self._client = Client(base_url)
        self._name = collection_name
        col = self._client.get_collection(collection_name)
        if col is None:
            col = self._client.create_collection(
                collection_name, metric=metric, storage_mode=storage_mode,
                vector_col="vector")
        self._col = col

    @property
    def client(self):
        return self._client

    # -- writes ------------------------------------------------------------
    def add(self, nodes, **kwargs):
        """Upsert embedded nodes; returns the stored string ids. Payload
        carries text, the original node id and ref_doc_id (for delete),
        and the node metadata — the reference's payload contract."""
        points, out = [], []
        for n in nodes:
            if n.embedding is None:
                raise ValueError(f"node {n.id_!r} has no embedding — "
                                 "LlamaIndex embeds before add")
            payload = {"text": n.get_content(), "node_id": str(n.id_)}
            ref = (n.metadata or {}).get("ref_doc_id")
            if ref is not None:
                payload["ref_doc_id"] = str(ref)
            for k, v in (n.metadata or {}).items():
                if k not in payload:
                    payload[k] = v
            points.append({"id": _int_id(n.id_),
                           "vector": [float(x) for x in n.embedding],
                           "payload": payload})
            out.append(str(n.id_))
        self._col.upsert(points)
        return out

    def delete(self, ref_doc_id, **kwargs):
        """Delete every node whose payload carries this ref_doc_id
        (LlamaIndex's document-scoped delete), plus the id itself."""
        rows = self._client.query(
            f"SELECT id FROM {self._name} WHERE ref_doc_id = $r",
            params={"r": str(ref_doc_id)})
        ids = [r["id"] for r in rows.get("results", [])]
        ids.append(_int_id(ref_doc_id))
        self._col.delete(sorted(set(ids)))

    def delete_nodes(self, node_ids, **kwargs):
        self._col.delete([_int_id(i) for i in node_ids])

    # -- reads ---------------------------------------------------------
    def _to_result(self, hits):
        nodes, sims, ids = [], [], []
        for h in hits:
            p = h.get("payload") or {}
            nid = p.get("node_id", str(h["id"]))
            nodes.append(TextNode(
                text=p.get("text", ""), id_=nid,
                metadata={k: v for k, v in p.items()
                          if k not in ("text", "node_id", "vector")}))
            sims.append(h.get("score"))
            ids.append(nid)
        return VectorStoreQueryResult(nodes=nodes, similarities=sims, ids=ids)

    def query(self, query, **kwargs):
        """Vector query (VectorStoreQuery protocol); metadata filters via
        kwargs['filter'] use the server's JSON condition DSL."""
        hits = self._col.search(query.query_embedding,
                                top_k=query.similarity_top_k,
                                filter=kwargs.get("filter"))
        return self._to_result(hits)

    def text_query(self, query_str, top_k=10, filter=None):
        """BM25 text search (reference text_query, vectorstore.py:449)."""
        return self._to_result(
            self._col.text_search(query_str, top_k=top_k, filter=filter))

    def hybrid_query(self, query_str, query_embedding, top_k=10,
                     vector_weight=0.5, filter=None):
        """RRF text+vector fusion (reference hybrid_query)."""
        return self._to_result(self._col.hybrid_search(
            query_str, query_embedding, top_k=top_k,
            vector_weight=vector_weight, filter=filter))

    def batch_query(self, embeddings, top_k=10):
        """One result per query embedding (reference batch_query)."""
        res = self._col.batch_search(
            [{"vector": [float(x) for x in e], "top_k": top_k}
             for e in embeddings])
        return [self._to_result(r["results"]) for r in res]

    def velesql(self, query_str, params=None):
        """Raw VelesQL through the unified endpoint."""
        return self._client.query(query_str, params=params)

    def get_nodes(self, node_ids, **kwargs):
        out = []
        for p in self._col.get([_int_id(i) for i in node_ids]):
            if p is None:
                continue
            # point GETs return the payload FLAT (id + payload columns at
            # the top level), unlike search hits' nested "payload" object
            payload = p.get("payload") or \
                {k: v for k, v in p.items() if k != "id"}
            out.append(TextNode(
                text=payload.get("text", ""),
                id_=payload.get("node_id", str(p["id"])),
                metadata={k: v for k, v in payload.items()
                          if k not in ("text", "node_id", "vector")}))
        return out

    def get_collection_info(self):
        return self._col.info()

    def is_empty(self):
        return self._col.is_empty()

    def flush(self):
        self._col.flush()
