#!/usr/bin/env node
/**
 * End-to-end smoke of the TypeScript SDK against a running graft server
 * (the TS twin of python/smoke_client.py — same flows, same wire).
 *
 * Usage: node sdks/typescript/smoke_client.mjs http://127.0.0.1:<port>
 *
 * Covers: create → upsert → search / filtered / text / hybrid / batch /
 * multi → get/delete → scroll → edges + traverse + match + pagerank →
 * snapshot / restore → VelesQL via /query → error surface. Prints one
 * SMOKE line per check; exits non-zero on the first failure.
 */
import { Client, ApiError } from "./velesdb_graft.mjs";

let passed = 0, total = 0;
function check(name, cond, detail = "") {
  total += 1;
  console.log(`SMOKE ${cond ? "PASS" : "FAIL"} ${name} ${detail}`);
  if (!cond) process.exit(1);
  passed += 1;
}

const base = process.argv[2] ?? "http://127.0.0.1:8080";
const db = new Client(base);
check("health", JSON.stringify(await db.health()).includes("ok"));

const cn = `tssdk_${Math.random().toString(36).slice(2, 10)}`;
const col = await db.createCollection(cn, { vectorCol: "vector" });
try {
  check("create+list", (await db.listCollections()).includes(cn));
  check("getCollection none", (await db.getCollection("ts_no_such")) === null);

  await col.upsert([
    { id: 1, vector: [1.0, 0.0],
      payload: { text: "alpha document about spark", lang: "en" } },
    { id: 2, vector: [0.0, 1.0],
      payload: { text: "beta note on engines", lang: "fr" } },
    { id: 3, vector: [0.7, 0.7],
      payload: { text: "gamma spark engines overview", lang: "en" } },
  ]);
  check("count", (await col.count()) === 3);

  const hits = await col.search([1.0, 0.1], { topK: 2 });
  check("search order", hits.map(h => h.id).join(",") === "1,3",
    JSON.stringify(hits).slice(0, 120));

  const f = { condition: { type: "eq", field: "lang", value: "en" } };
  const fhits = await col.search([0.0, 1.0], { topK: 2, filter: f });
  check("filtered search",
    fhits.every(h => h.payload.lang === "en") &&
      fhits.map(h => h.id).join(",") === "3,1",
    JSON.stringify(fhits).slice(0, 160));

  const t = await col.textSearch("spark engines", { topK: 3 });
  check("text search", t[0].id === 3, JSON.stringify(t).slice(0, 120));

  const hy = await col.hybridSearch("spark", [1.0, 0.0], { topK: 3 });
  check("hybrid search", hy.length >= 1, JSON.stringify(hy).slice(0, 120));

  const b = await col.batchSearch([
    { vector: [1.0, 0.0], top_k: 1 },
    { vector: [0.0, 1.0], top_k: 1, filter: f },
  ]);
  check("batch search",
    b[0].results[0].id === 1 && b[1].results[0].id === 3,
    JSON.stringify(b).slice(0, 160));

  const m = await col.multiQuerySearch([[1.0, 0.0], [0.0, 1.0]], { topK: 2 });
  check("multi-query fused", m.length === 2, JSON.stringify(m).slice(0, 120));

  const got = await col.get([1, 99]);
  check("get present/absent", got[0].id === 1 && got[1] === null);

  const ids = [];
  for await (const p of col.scroll(2)) ids.push(p.id);
  check("keyset scroll", ids.sort().join(",") === "1,2,3", ids.join(","));

  await col.upsertEdges([
    { source: 1, target: 2, label: "cites" },
    { source: 2, target: 3, label: "cites" },
  ]);
  const tr = await col.traverse(1, { maxDepth: 2 });
  check("traverse", tr.results.length >= 2 && tr.stats.visited >= 2,
    JSON.stringify(tr).slice(0, 160));
  const mt = await col.match(
    "MATCH (a:Point)-[:cites]->(b:Point) RETURN a.id AS s, b.id AS d");
  check("match", mt.count === 2, JSON.stringify(mt).slice(0, 160));
  const pr = await col.pagerank({ iters: 2 });
  check("pagerank", pr.results.length >= 1, JSON.stringify(pr).slice(0, 160));

  await col.snapshot("before");
  await col.delete([2]);
  check("delete", (await col.count()) === 2);
  const sp = await col.snapshotPoints("before");
  check("snapshot points", sp.count === 3, JSON.stringify(sp).slice(0, 120));
  await col.restore("before");
  check("restore", (await col.count()) === 3);
  check("list snapshots",
    JSON.stringify((await col.listSnapshots()).snapshots) === '["before"]');

  const q = await db.query(
    `SELECT id FROM ${cn} WHERE vector NEAR $q LIMIT 2`, { q: [1.0, 0.0] });
  check("velesql query", q.count === 2, JSON.stringify(q).slice(0, 160));
  const ex = await db.explain(`SELECT id FROM ${cn} LIMIT 5`);
  check("explain", JSON.stringify(ex).includes("TableScan"),
    JSON.stringify(ex).slice(0, 120));

  try {
    await col.search("not-a-vector");
    check("error surface", false);
  } catch (e) {
    check("error surface", e instanceof ApiError && e.status === 400,
      `HTTP ${e.status}`);
  }

  // one-shot analytics: batch mode (default) over the events table
  const an = await db.eventsAnalytics("sessions", { limit: 5 });
  check("events analytics", an.mode === "batch" && an.count >= 0,
    JSON.stringify(an).slice(0, 120));
  try {
    await db.eventsAnalytics("sessions", { mode: "sideways" });
    check("analytics bad mode", false);
  } catch (e) {
    check("analytics bad mode", e instanceof ApiError && e.status === 400,
      `HTTP ${e.status}`);
  }
} finally {
  await db.deleteCollection(cn);
}
check("cleanup", !(await db.listCollections()).includes(cn));
console.log(`SMOKE DONE ${passed}/${total} passed`);
