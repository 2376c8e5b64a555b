#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir tables,
then compares: row count, column names, and a value hash with columns sorted
by name, floats rounded to 6 decimals, rows sorted by all columns.
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{round(v, 6):.6f}"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        # driver testdata ships flat files; ScaleGen/user ingests ship
        # parquet DIRECTORIES — glob their part-files
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                   if os.path.isdir(d))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracles:
            print(f"----  {name}: rows={len(got)} (no oracle, rows-only check)")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL  {name}: cols spark={sorted(got_cols)} duckdb={sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows spark={len(got)} duckdb={len(exp)}")
            n_fail += 1
            continue
        hg, he = frame_hash(got_cols, got), frame_hash(exp_cols, exp)
        if hg != he:
            print(f"FAIL  {name}: hash mismatch ({hg} vs {he}), rows={len(got)}")
            gl = sorted("|".join(norm_cell(r[i]) for i in
                        sorted(range(len(got_cols)), key=lambda i: got_cols[i]))
                        for r in got)
            el = sorted("|".join(norm_cell(r[i]) for i in
                        sorted(range(len(exp_cols)), key=lambda i: exp_cols[i]))
                        for r in exp)
            for a, b in zip(gl, el):
                if a != b:
                    print(f"      spark : {a}\n      duckdb: {b}")
                    break
            n_fail += 1
            continue
        print(f"PASS  {name}: rows={len(got)}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
