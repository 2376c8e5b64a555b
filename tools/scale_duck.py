#!/usr/bin/env python3
"""DuckDB twin of graft.tools.ScaleProbe: times the same oracle SQL at
two dataset dirs and prints per-query scaling exponents, so the Spark
exponents have an engine baseline on the same host.

Usage: python3 tools/scale_duck.py <dirA> <dirB> [oracle_sql.json] [reps]
Handles both single-file tables (driver testdata) and directory tables
(ScaleGen output).
"""
import sys, os, json, time, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    oracle_path = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/target/scaleprobe/oracle_sql.json"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    oracles = json.load(open(oracle_path))
    results = {}
    rows = {}
    for d in (dir_a, dir_b):
        con = connect(d)
        rows[d] = con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
        for name in sorted(oracles):
            sql = oracles[name]
            try:
                con.execute(sql).fetchall()  # warm
                best = min(
                    (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(time.time())
                    for _ in range(reps))
            except Exception as e:
                print(f"DUCKPROBE q={name} dir={d} FAILED {e}")
                continue
            results.setdefault(name, {})[d] = best
            print(f"DUCKPROBE q={name} dir={d} rows={rows[d]} min={best:.3f}")
        con.close()
    import math
    n_ratio = rows[dir_b] / rows[dir_a]
    print("DUCKPROBE exponent table (T ~ rows^e)")
    for name in sorted(results):
        r = results[name]
        if dir_a in r and dir_b in r and r[dir_a] > 0:
            e = math.log(r[dir_b] / r[dir_a]) / math.log(n_ratio)
            print(f"DUCKEXP {name:30s} t0={r[dir_a]:.3f} t1={r[dir_b]:.3f} exp={e:.2f}")


if __name__ == "__main__":
    main()
