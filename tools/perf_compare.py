#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB timing comparison.

Usage: python3 tools/perf_compare.py <sfDir> <oracle_sql.json> <bench.json> [out.md]

Times every oracle SQL in DuckDB (threads = cpu count) against the sfDir
parquet tables, joins with the Spark bench per-query seconds, and prints
a ratio table (ratio = spark / duckdb). Queries where BOTH engines are
under the local-mode job floor (~0.2 s) are floor-dominated: the ratio
there measures Spark's fixed per-job overhead, not the engine.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
FLOOR = 0.25  # seconds: local-mode per-query job floor (irrelevant on a cluster)


def main():
    sf_dir, oracle_path, bench_path = sys.argv[1], sys.argv[2], sys.argv[3]
    out_md = sys.argv[4] if len(sys.argv) > 4 else None
    oracles = json.load(open(oracle_path))
    bench = json.load(open(bench_path))["queries"]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    rows = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warm
            t0 = time.time()
            con.execute(sql).fetchall()
            duck = time.time() - t0
        except Exception as e:
            rows.append((name, None, bench.get(name), None, f"duck err: {e}"))
            continue
        spark = bench.get(name)
        ratio = (spark / duck) if (spark and duck > 0) else None
        rows.append((name, duck, spark, ratio, ""))
    total_duck = sum(r[1] for r in rows if r[1] is not None)
    total_spark = sum(r[2] for r in rows if r[2] is not None)
    lines = []
    lines.append(f"| query | duckdb s | spark s | ratio | note |")
    lines.append(f"|---|---|---|---|---|")
    over = 0
    for name, duck, spark, ratio, err in rows:
        note = err
        if ratio is not None and not note:
            if duck < FLOOR and spark < 3 * FLOOR:
                note = "floor"
            elif ratio <= 2.0:
                note = "ok"
            elif ratio <= 1.0:
                note = "win"
            else:
                note = "OVER"
                over += 1
        ds = f"{duck:.3f}" if duck is not None else "-"
        ss = f"{spark:.3f}" if spark is not None else "-"
        rs = f"{ratio:.2f}" if ratio is not None else "-"
        lines.append(f"| {name} | {ds} | {ss} | {rs} | {note} |")
    lines.append("")
    lines.append(f"TOTAL duckdb {total_duck:.2f}s, spark {total_spark:.2f}s, "
                 f"ratio {total_spark / total_duck:.2f}, non-floor over-2x: {over}")
    text = "\n".join(lines)
    print(text)
    if out_md:
        with open(out_md, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
