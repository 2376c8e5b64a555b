#!/usr/bin/env python3
"""End-to-end smoke of the LlamaIndex adapter against a running server.

Usage: python3 python/smoke_llamaindex.py http://127.0.0.1:<port>

Runs without llama_index installed (the adapter's stand-in TextNode /
VectorStoreQuery path); with llama_index.core present the same flows
return real TextNodes. Embeddings are deterministic hash-based fakes —
the adapter contract is exercised end-to-end, embedding quality is
irrelevant.
"""

import sys
import uuid

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from llamaindex_velesdb_graft import (  # noqa: E402
    GraftVectorStore, TextNode, VectorStoreQuery, _stable_hash_id)

checks = []


def check(name, cond, detail=""):
    checks.append((name, bool(cond)))
    print(f"LISMOKE {'PASS' if cond else 'FAIL'} {name} {detail}")
    if not cond:
        sys.exit(1)


def fake_embed(text):
    h = _stable_hash_id(text)
    return [((h >> (8 * i)) & 0xFF) / 255.0 + 0.01 for i in range(4)]


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:8080"
    cn = f"li_{uuid.uuid4().hex[:8]}"
    store = GraftVectorStore(base, cn)
    try:
        nodes = [
            TextNode(text="spark engines overview", id_="n1",
                     embedding=fake_embed("spark engines overview"),
                     metadata={"lang": "en", "ref_doc_id": "doc-A"}),
            TextNode(text="a note about ducks", id_="n2",
                     embedding=fake_embed("a note about ducks"),
                     metadata={"lang": "en", "ref_doc_id": "doc-A"}),
            TextNode(text="engines of spark", id_="n3",
                     embedding=fake_embed("engines of spark"),
                     metadata={"lang": "fr", "ref_doc_id": "doc-B"}),
        ]
        ids = store.add(nodes)
        check("add ids", ids == ["n1", "n2", "n3"], str(ids))
        check("info count", store.get_collection_info()["points_count"] == 3)
        check("not empty", not store.is_empty())

        r = store.query(VectorStoreQuery(
            query_embedding=fake_embed("spark engines overview"),
            similarity_top_k=2))
        check("query top is exact match", r.ids[0] == "n1",
              f"{r.ids} {r.similarities}")
        check("query returns text",
              r.nodes[0].get_content() == "spark engines overview")
        check("query metadata round-trips", r.nodes[0].metadata["lang"] == "en")

        f = {"condition": {"type": "eq", "field": "lang", "value": "fr"}}
        rf = store.query(VectorStoreQuery(
            query_embedding=fake_embed("engines"), similarity_top_k=3),
            filter=f)
        check("filtered query", rf.ids == ["n3"], str(rf.ids))

        rt = store.text_query("spark engines", top_k=2)
        check("text query", set(rt.ids) <= {"n1", "n3"} and len(rt.ids) == 2,
              str(rt.ids))

        rh = store.hybrid_query("ducks", fake_embed("a note about ducks"),
                                top_k=2)
        check("hybrid query", "n2" in rh.ids, str(rh.ids))

        rb = store.batch_query([fake_embed("spark engines overview"),
                                fake_embed("a note about ducks")], top_k=1)
        check("batch query", rb[0].ids == ["n1"] and rb[1].ids == ["n2"],
              f"{rb[0].ids} {rb[1].ids}")

        got = store.get_nodes(["n1", "zzz"])
        check("get_nodes present only", [n.id_ for n in got] == ["n1"])

        q = store.velesql(f"SELECT id FROM {cn} WHERE lang = 'en'")
        check("velesql", q["count"] == 2, str(q)[:120])

        store.delete("doc-A")  # document-scoped: removes n1 and n2
        check("delete by ref_doc_id",
              store.get_collection_info()["points_count"] == 1)
        store.delete_nodes(["n3"])
        check("delete_nodes", store.is_empty())
    finally:
        store.client.delete_collection(cn)
    check("cleanup", cn not in store.client.list_collections())
    print(f"LISMOKE DONE {sum(1 for _, ok in checks if ok)}/{len(checks)} passed")


if __name__ == "__main__":
    main()
