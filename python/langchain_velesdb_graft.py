"""LangChain VectorStore adapter over the graft engine's REST surface.

Mirrors the reference integration's surface
(integrations/langchain/src/langchain_velesdb/vectorstore.py:
`VelesDBVectorStore`) with the engine's REST client underneath
(velesdb_graft.Client) instead of an embedded core.

LangChain itself is OPTIONAL: when `langchain_core` is importable the
class subclasses `VectorStore` and returns real `Document`s; otherwise
lightweight stand-ins with the same field contract are used, so the
adapter is fully exercisable (and tested) without the dependency. The
embedding model is always caller-provided — anything exposing
`embed_documents(texts) -> [[float]]` and `embed_query(text) ->
[float]` (the `langchain_core.embeddings.Embeddings` protocol).
"""

import hashlib
import uuid

from velesdb_graft import Client

try:  # real LangChain when present
    from langchain_core.documents import Document  # type: ignore
    from langchain_core.vectorstores import VectorStore  # type: ignore
    _HAVE_LANGCHAIN = True
except ImportError:  # stand-ins with the same contract
    _HAVE_LANGCHAIN = False

    class Document:  # noqa: D401 - minimal LangChain Document shape
        """page_content + metadata, the fields LangChain consumers read."""

        def __init__(self, page_content, metadata=None):
            self.page_content = page_content
            self.metadata = metadata or {}

        def __repr__(self):
            return f"Document(page_content={self.page_content!r}, metadata={self.metadata!r})"

    class VectorStore:  # noqa: D401 - empty base, interface is duck-typed
        pass


def _stable_hash_id(value):
    """String id → positive 63-bit int, stable across processes (the
    reference's SHA256 convention, vectorstore.py:36-55 — Python's
    hash() is salted per process)."""
    digest = hashlib.sha256(value.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], byteorder="big") & 0x7FFFFFFFFFFFFFFF


def _int_id(value):
    """Caller id → stored integer id, ONE convention for add/get/delete:
    all-digit ids (ints or digit strings) pass through as the integer,
    anything else hashes. add_texts/delete/get_by_ids must all route
    through here or add_texts(ids=["123"]) lands under hash("123") while
    delete(["123"]) targets 123 and silently misses. The passthrough is
    range-gated: a 19+-digit id (or an all-digit uuid hex) would exceed
    the server's int64 id column, so those hash like any other string."""
    s = str(value)
    return int(s) if s.isdigit() and int(s) < 2 ** 63 else _stable_hash_id(s)


class GraftVectorStore(VectorStore):
    """LangChain-compatible vector store over a graft REST server.

    >>> store = GraftVectorStore("http://127.0.0.1:8080", "docs", embedding)
    >>> store.add_texts(["alpha", "beta"], metadatas=[{"s": 1}, {"s": 2}])
    >>> store.similarity_search("alpha", k=2)
    """

    def __init__(self, base_url, collection_name, embedding,
                 metric="cosine", storage_mode=None):
        self._client = Client(base_url)
        self._name = collection_name
        self._embedding = embedding
        self._metric = metric
        self._storage_mode = storage_mode
        self._collection = None

    @property
    def embeddings(self):
        return self._embedding

    def _get_collection(self):
        if self._collection is None:
            col = self._client.get_collection(self._name)
            if col is None:
                col = self._client.create_collection(
                    self._name, metric=self._metric,
                    storage_mode=self._storage_mode, vector_col="vector")
            self._collection = col
        return self._collection

    # -- writes ----------------------------------------------------------
    def add_texts(self, texts, metadatas=None, ids=None, **kwargs):
        texts_list = list(texts)
        if not texts_list:
            return []
        embeddings = self._embedding.embed_documents(texts_list)
        col = self._get_collection()
        result_ids, points = [], []
        for i, (text, vec) in enumerate(zip(texts_list, embeddings)):
            if ids and i < len(ids):
                doc_id = ids[i]
                int_id = _int_id(doc_id)
            else:
                int_id = _stable_hash_id(uuid.uuid4().hex)
                doc_id = str(int_id)
            result_ids.append(doc_id)
            payload = {"text": text}
            if metadatas and i < len(metadatas):
                payload.update(metadatas[i])
            points.append({"id": int_id, "vector": vec, "payload": payload})
        col.upsert(points)
        return result_ids

    def delete(self, ids=None, **kwargs):
        if not ids:
            return False
        self._get_collection().delete([_int_id(i) for i in ids])
        return True

    @classmethod
    def from_texts(cls, texts, embedding, metadatas=None, ids=None,
                   base_url="http://127.0.0.1:8080",
                   collection_name="langchain", **kwargs):
        store = cls(base_url, collection_name, embedding, **kwargs)
        store.add_texts(texts, metadatas=metadatas, ids=ids)
        return store

    # -- reads -----------------------------------------------------------
    @staticmethod
    def _to_document(hit):
        payload = dict(hit.get("payload") or {})
        text = payload.pop("text", "")
        payload.pop("vector", None)
        return Document(page_content=text, metadata=payload)

    def similarity_search(self, query, k=4, **kwargs):
        return [d for d, _ in
                self.similarity_search_with_score(query, k=k, **kwargs)]

    def similarity_search_with_score(self, query, k=4, filter=None, **kwargs):
        vec = self._embedding.embed_query(query)
        hits = self._get_collection().search(vec, top_k=k, filter=filter)
        return [(self._to_document(h), h["score"]) for h in hits]

    def similarity_search_with_filter(self, query, filter, k=4, **kwargs):
        """Reference naming (vectorstore.py:331); `filter` is the JSON
        condition DSL ({"condition": {"type": "eq", ...}})."""
        return self.similarity_search(query, k=k, filter=filter)

    def text_search(self, query, k=4):
        """BM25 over the collection's text column (vectorstore.py:439)."""
        hits = self._get_collection().text_search(query, top_k=k)
        return [self._to_document(h) for h in hits]

    def hybrid_search(self, query, k=4, vector_weight=0.5):
        """RRF-fused text + vector retrieval (vectorstore.py:373)."""
        vec = self._embedding.embed_query(query)
        hits = self._get_collection().hybrid_search(
            query, vec, top_k=k, vector_weight=vector_weight)
        return [self._to_document(h) for h in hits]

    def batch_search(self, queries, k=4):
        vecs = self._embedding.embed_documents(list(queries))
        col = self._get_collection()
        out = col.batch_search([{"vector": v, "top_k": k} for v in vecs])
        return [[self._to_document(h) for h in part["results"]] for part in out]

    def get_by_ids(self, ids, **kwargs):
        int_ids = [_int_id(i) for i in ids]
        docs = []
        for p in self._get_collection().get(int_ids):
            if p is not None:
                payload = {k: v for k, v in p.items()
                           if k not in ("id", "vector")}
                docs.append(Document(page_content=payload.pop("text", ""),
                                     metadata=payload))
        return docs

    def get_collection_info(self):
        return self._get_collection().info()

    def is_empty(self):
        return self._get_collection().is_empty()

    def flush(self):
        self._get_collection().flush()
