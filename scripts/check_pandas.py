#!/usr/bin/env python3
"""Pandas-dtype replica of the driver's oracle compare.

The driver loads the Spark result parquet and the DuckDB oracle result
into pandas, sorts columns by name, sorts rows, and hashes values — so
mismatches invisible to a tuple-level compare still fail there:
  * dtype skew: DuckDB HUGEINT results (count_if, SUM(BIGINT)) become
    float64 in pandas while Spark's parquet stays int64 (18 != 18.0);
  * unsortable cells: ndarray / dict cells (array or struct output
    columns) make pandas sort_values throw.

Usage: python3 scripts/check_pandas.py <sfDir> <verifyOutDir> [names...]
Exit 1 on any mismatch. Run after `runMain graft.Verify <sfDir> <outDir>`.
"""
import json, math, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        # shortest round-trip repr: full precision, so this replica agrees
        # with the driver's value-hash compare instead of masking >6-sig-fig
        # diffs (ADVICE r2)
        return repr(v)
    # datetime.date (spark parquet DATE) vs pandas Timestamp (duckdb DATE):
    # strip a bare-midnight time component so both render as the date
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:10] if s[10:] in ("", "T00:00:00") else s[:26]
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
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
             and (not only or d in only)]
    for name in names:
        try:
            got = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            print(f"  {name:32s} SPARK-READ-ERROR: {e}")
            failures += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) else "EMPTY(!)"
            print(f"  {name:32s} {status} rows={len(got)}")
            if not len(got):
                failures += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  {name:32s} ORACLE-SQL-ERROR: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"  {name:32s} SCHEMA-MISMATCH spark={list(got.columns)} "
                  f"duck={list(exp.columns)}")
            failures += 1
            continue
        # dtype-kind check FIRST: a float64-vs-int64 skew (DuckDB HUGEINT)
        # hash-mismatches in the driver even when printed values coincide
        kinds_g = [got[c].dtype.kind for c in got.columns]
        kinds_e = [exp[c].dtype.kind for c in exp.columns]
        # object-vs-datetime64 is benign (parquet DATE reads as object of
        # datetime.date; the driver canonicalizes both — q_date_funcs
        # hash-matched in round 1). int-vs-float is the real killer.
        benign = {("O", "M"), ("M", "O")}
        if any(g != e and (g, e) not in benign
               for g, e in zip(kinds_g, kinds_e)):
            skew = [(c, g, e) for c, g, e in
                    zip(got.columns, kinds_g, kinds_e)
                    if g != e and (g, e) not in benign]
            print(f"  {name:32s} DTYPE-MISMATCH {skew}")
            failures += 1
            continue
        # the driver's sort — this is where ndarray/dict cells explode
        try:
            got_s = got.sort_values(list(got.columns)).reset_index(drop=True)
            exp_s = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        except Exception as e:
            print(f"  {name:32s} SORT-ERROR (unhashable output cell?): {e}")
            failures += 1
            continue
        if len(got_s) != len(exp_s):
            print(f"  {name:32s} ROWCOUNT spark={len(got_s)} duck={len(exp_s)}")
            failures += 1
            continue
        # dtype-sensitive value compare: repr of the canonicalized cell,
        # so int64 18 vs float64 18.0 is a FAIL (as in the driver's hash)
        bad = None
        for c in got_s.columns:
            for i in range(len(got_s)):
                a = canon_cell(got_s[c].iloc[i])
                b = canon_cell(exp_s[c].iloc[i])
                if a != b:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"  {name:32s} VALUE-MISMATCH col={c} row={i} "
                  f"spark={a} duck={b}")
            failures += 1
        else:
            print(f"  {name:32s} OK rows={len(got_s)}")
    print(("FAIL " + str(failures)) if failures else "ALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
