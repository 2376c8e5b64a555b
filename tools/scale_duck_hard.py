#!/usr/bin/env python3
"""Hardened single-dir DuckDB prober: each query runs in a FRESH process
with a memory limit and a wall-clock timeout, so one query's spill or
blow-up cannot contaminate the next (the in-process scale_duck.py dies
with the whole batch when one query OOMs the interpreter or fills the
disk with temp spill — observed on the 60x PageRank oracles).

Usage: python3 tools/scale_duck_hard.py <sfDir> <oracle_sql.json> \
          [q1,q2,...] [timeout_s=420] [mem=24GB] [reps=2]

Prints one `DUCKHARD q=<name> min=<s>` line per query, or
`DUCKHARD q=<name> DNF (...)` on timeout / failure.
"""
import sys, os, json, subprocess, tempfile

CHILD = r"""
import duckdb, time, os, sys, json
sf_dir, oracle_path, name, mem, reps = sys.argv[1:6]
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
con.execute(f"SET memory_limit='{mem}'")
for t in ["region","nation","customer","supplier","part",
          "orders","lineitem","events","documents","embeddings"]:
    p = os.path.join(sf_dir, t + ".parquet")
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
sql = json.load(open(oracle_path))[name]
best = None
for _ in range(int(reps)):
    t0 = time.time(); con.execute(sql).fetchall(); dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(f"{best:.3f}")
"""


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    oracles = json.load(open(oracle_path))
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 and sys.argv[3] != "-"
             else sorted(oracles))
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 420.0
    mem = sys.argv[5] if len(sys.argv) > 5 else "24GB"
    reps = sys.argv[6] if len(sys.argv) > 6 else "2"
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD)
        child = f.name
    scratch = tempfile.mkdtemp(prefix="duckhard-")  # spill lands here, not in cwd
    try:
        for name in names:
            if name not in oracles:
                print(f"DUCKHARD q={name} SKIP (no oracle)")
                continue
            try:
                out = subprocess.run(
                    ["python3", child, sf_dir, oracle_path, name, mem, reps],
                    capture_output=True, text=True, timeout=timeout, cwd=scratch)
                if out.returncode == 0:
                    print(f"DUCKHARD q={name} min={out.stdout.strip()}")
                else:
                    print(f"DUCKHARD q={name} DNF ({out.stderr.strip().splitlines()[-1][:160]})")
            except subprocess.TimeoutExpired:
                print(f"DUCKHARD q={name} DNF (>{timeout:.0f} s)")
            # a killed child leaves its temp spill behind — reap it so the
            # next query starts with a clean disk
            subprocess.run(["rm", "-rf", os.path.join(scratch, ".tmp")])
    finally:
        os.unlink(child)
        subprocess.run(["rm", "-rf", scratch])


if __name__ == "__main__":
    main()
