#!/usr/bin/env python3
"""End-to-end smoke of the Python SDK against a running graft server.

Usage: python3 python/smoke_client.py http://127.0.0.1:<port>

Covers the reference SDK's core flows (velesdb-python collection.rs):
create → upsert → search / filtered / text / hybrid / batch / multi →
get/delete → scroll → edges + traverse + match + pagerank → snapshot /
restore → VelesQL via /query. Prints one SMOKE line per check; exits
non-zero on the first failure.
"""

import sys
import uuid

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from velesdb_graft import Client, ApiError  # noqa: E402

checks = []


def check(name, cond, detail=""):
    checks.append((name, bool(cond)))
    print(f"SMOKE {'PASS' if cond else 'FAIL'} {name} {detail}")
    if not cond:
        sys.exit(1)


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:8080"
    db = Client(base)
    check("health", db.health().get("status") == "ok" or "ok" in str(db.health()))

    cn = f"pysdk_{uuid.uuid4().hex[:8]}"
    col = db.create_collection(cn, vector_col="vector")
    try:
        check("create+list", cn in db.list_collections())
        check("get_collection none", db.get_collection("py_no_such") is None)

        col.upsert([
            {"id": 1, "vector": [1.0, 0.0],
             "payload": {"text": "alpha document about spark", "lang": "en"}},
            {"id": 2, "vector": [0.0, 1.0],
             "payload": {"text": "beta note on engines", "lang": "fr"}},
            {"id": 3, "vector": [0.7, 0.7],
             "payload": {"text": "gamma spark engines overview", "lang": "en"}},
        ])
        check("count", col.count() == 3, f"got {col.count()}")
        check("is_empty false", col.is_empty() is False)

        hits = col.search([1.0, 0.1], top_k=2)
        check("search order", [h["id"] for h in hits] == [1, 3], str(hits)[:120])

        f = {"condition": {"type": "eq", "field": "lang", "value": "en"}}
        fhits = col.search_with_filter([0.0, 1.0], f, top_k=2)
        check("filtered search", all(h["payload"]["lang"] == "en" for h in fhits)
              and [h["id"] for h in fhits] == [3, 1], str(fhits)[:160])

        t = col.text_search("spark engines", top_k=3)
        check("text search", [h["id"] for h in t][0] == 3, str(t)[:120])

        hy = col.hybrid_search("spark", [1.0, 0.0], top_k=3)
        check("hybrid search", len(hy) >= 1, str(hy)[:120])

        b = col.batch_search([{"vector": [1.0, 0.0], "top_k": 1},
                              {"vector": [0.0, 1.0], "top_k": 1,
                               "filter": f}])
        check("batch search", b[0]["results"][0]["id"] == 1
              and b[1]["results"][0]["id"] == 3, str(b)[:160])

        m = col.multi_query_search([[1.0, 0.0], [0.0, 1.0]], top_k=2)
        check("multi-query fused", len(m) == 2, str(m)[:120])

        got = col.get([1, 99])
        check("get present/absent", got[0]["id"] == 1 and got[1] is None)

        ids = sorted(p["id"] for p in col.scroll(page_size=2))
        check("keyset scroll", ids == [1, 2, 3], str(ids))

        col.upsert_edges([
            {"source": 1, "target": 2, "label": "cites"},
            {"source": 2, "target": 3, "label": "cites"},
        ])
        tr = col.traverse(source=1, max_depth=2)
        check("traverse", len(tr["results"]) >= 2 and tr["stats"]["visited"] >= 2,
              str(tr)[:160])
        mt = col.match("MATCH (a:Point)-[:cites]->(b:Point) RETURN a.id AS s, b.id AS d")
        check("match", mt["count"] == 2, str(mt)[:160])
        pr = col.pagerank(iters=2)
        check("pagerank", len(pr["results"]) >= 1, str(pr)[:160])

        col.snapshot("before")
        col.delete([2])
        check("delete", col.count() == 2)
        sp = col.snapshot_points("before")
        check("snapshot points", sp["count"] == 3, str(sp)[:120])
        col.restore("before")
        check("restore", col.count() == 3)
        check("list snapshots", col.list_snapshots()["snapshots"] == ["before"])

        q = db.query(f"SELECT id FROM {cn} WHERE vector NEAR $q LIMIT 2",
                     params={"q": [1.0, 0.0]})
        check("velesql query", q["count"] == 2, str(q)[:160])
        ex = db.explain(f"SELECT id FROM {cn} LIMIT 5")
        check("explain", "TableScan" in str(ex), str(ex)[:120])

        try:
            col.search("not-a-vector")
            check("error surface", False)
        except ApiError as e:
            check("error surface", e.status == 400, f"HTTP {e.status}")

        # one-shot analytics: batch mode (default) over the events table
        an = db.events_analytics("sessions", limit=5)
        check("events analytics", an["mode"] == "batch" and an["count"] >= 0,
              str(an)[:120])
        try:
            db.events_analytics("sessions", mode="sideways")
            check("analytics bad mode", False)
        except ApiError as e:
            check("analytics bad mode", e.status == 400, f"HTTP {e.status}")
    finally:
        db.delete_collection(cn)
    check("cleanup", cn not in db.list_collections())
    print(f"SMOKE DONE {sum(1 for _, ok in checks if ok)}/{len(checks)} passed")


if __name__ == "__main__":
    main()
