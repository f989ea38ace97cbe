#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching SQL from oracle_sql.json in DuckDB over the same parquet tables,
canonicalizes (sort columns by name, sort rows, round floats), and
compares. Exit 1 on any mismatch.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.6g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))
             and not d.startswith((".", "_"))]
    for name in names:
        # per-dir guard (r14 judge item #3): a half-written dir (kill
        # mid-write) must score as one failure, never abort the compare
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [c[0] for c in got.description]
        except Exception as e:
            print(f"  {name:32s} UNREADABLE: {str(e)[:120]}")
            failures += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if got_rows else "EMPTY(!)"
            print(f"  {name:32s} {status} rows={len(got_rows)}")
            if not got_rows:
                failures += 1
            continue
        try:
            exp = con.execute(oracles[name])
            exp_rows, exp_cols = exp.fetchall(), [c[0] for c in exp.description]
        except Exception as e:
            print(f"  {name:32s} ORACLE-SQL-ERROR: {e}")
            failures += 1
            continue
        g, gc = canon(got_rows, got_cols)
        e, ec = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"  {name:32s} SCHEMA-MISMATCH spark={gc} duck={ec}")
            failures += 1
        elif g != e:
            print(f"  {name:32s} VALUE-MISMATCH rows spark={len(g)} duck={len(e)}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break
            if len(g) != len(e):
                only_g = set(g) - set(e)
                only_e = set(e) - set(g)
                if only_g: print(f"    spark-only sample: {list(only_g)[:2]}")
                if only_e: print(f"    duck-only sample: {list(only_e)[:2]}")
            failures += 1
        else:
            print(f"  {name:32s} OK rows={len(g)}")
    print(f"{len(names) - failures}/{len(names)} pass")
    sys.exit(1 if failures else 0)

main()
