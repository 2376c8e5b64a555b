#!/usr/bin/env python3
"""End-to-end smoke of the LangChain adapter against a running server.

Usage: python3 python/smoke_langchain.py http://127.0.0.1:<port>

Runs without langchain installed (the adapter's stand-in Document path);
with langchain_core present the same flows return real Documents. The
embedding model is a deterministic hash-based fake — the adapter's
contract is exercised end-to-end, the embedding quality is irrelevant.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from langchain_velesdb_graft import GraftVectorStore, _stable_hash_id  # noqa: E402

checks = []


def check(name, cond, detail=""):
    checks.append((name, bool(cond)))
    print(f"LCSMOKE {'PASS' if cond else 'FAIL'} {name} {detail}")
    if not cond:
        sys.exit(1)


class FakeEmbeddings:
    """Deterministic 4-dim embeddings: same text → same vector."""

    def embed_query(self, text):
        h = _stable_hash_id(text)
        return [((h >> (8 * i)) & 0xFF) / 255.0 + 0.01 for i in range(4)]

    def embed_documents(self, texts):
        return [self.embed_query(t) for t in texts]


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:8080"
    emb = FakeEmbeddings()
    import uuid
    cn = f"lc_{uuid.uuid4().hex[:8]}"
    store = GraftVectorStore(base, cn, emb)
    try:
        ids = store.add_texts(
            ["spark engines overview", "a note about ducks", "engines of spark"],
            metadatas=[{"lang": "en"}, {"lang": "en"}, {"lang": "fr"}],
            ids=["a", "b", "c"])
        check("add_texts ids", ids == ["a", "b", "c"], str(ids))
        check("info count", store.get_collection_info()["points_count"] == 3)

        docs = store.similarity_search("spark engines overview", k=1)
        check("similarity self-hit",
              docs[0].page_content == "spark engines overview",
              repr(docs[0])[:120])
        scored = store.similarity_search_with_score("a note about ducks", k=1)
        check("with_score", scored[0][1] > 0.999, str(scored[0][1]))

        f = {"condition": {"type": "eq", "field": "lang", "value": "fr"}}
        fdocs = store.similarity_search_with_filter("spark engines overview", f, k=2)
        check("filtered", len(fdocs) >= 1 and
              all(d.metadata["lang"] == "fr" for d in fdocs),
              str([d.metadata for d in fdocs]))

        t = store.text_search("ducks", k=2)
        check("text_search", t and t[0].page_content == "a note about ducks",
              repr(t[:1])[:120])
        hy = store.hybrid_search("spark", k=2)
        check("hybrid", len(hy) >= 1)

        b = store.batch_search(["spark engines overview", "a note about ducks"], k=1)
        check("batch", b[0][0].page_content == "spark engines overview"
              and b[1][0].page_content == "a note about ducks")

        got = store.get_by_ids(["a", "zz"])
        check("get_by_ids", len(got) == 1 and got[0].metadata["lang"] == "en",
              repr(got)[:120])

        check("delete", store.delete(["b"]))
        check("count after delete",
              store.get_collection_info()["points_count"] == 2)

        # digit-string ids must round-trip add -> get -> delete under ONE
        # convention (r12 ADVICE: add hashed "123" while delete targeted 123)
        store.add_texts(["digit id doc"], metadatas=[{"lang": "en"}],
                        ids=["123"])
        dg = store.get_by_ids(["123"])
        check("digit-id get", len(dg) == 1 and
              dg[0].page_content == "digit id doc", repr(dg)[:120])
        check("digit-id delete", store.delete(["123"]))
        check("digit-id gone", not store.get_by_ids(["123"]))

        st2 = GraftVectorStore.from_texts(
            ["one text"], emb, base_url=base, collection_name=cn + "_ft")
        try:
            check("from_texts", st2.get_collection_info()["points_count"] == 1)
        finally:
            st2._client.delete_collection(cn + "_ft")
    finally:
        store._client.delete_collection(cn)
    print(f"LCSMOKE DONE {sum(1 for _, ok in checks if ok)}/{len(checks)} passed")


if __name__ == "__main__":
    main()
