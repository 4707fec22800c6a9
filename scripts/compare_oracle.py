#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the same testdata
tables, and compare schema + row multiset (column-name-sorted, like the
driver). Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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
                    v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        try:
            eng = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            eng_rows, eng_cols = eng.fetchall(), [c[0] for c in eng.description]
        except Exception as e:
            print(f"FAIL {name}: engine parquet unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "rows-only" + (" (EMPTY!)" if len(eng_rows) == 0 else "")
            print(f"OK   {name}: {status}, {len(eng_rows)} rows")
            n_rows_only += 1
            continue
        try:
            ora = con.execute(oracle[name])
            ora_rows, ora_cols = ora.fetchall(), [c[0] for c in ora.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(eng_cols) != sorted(ora_cols):
            print(f"FAIL {name}: schema {sorted(eng_cols)} != {sorted(ora_cols)}")
            n_fail += 1
            continue
        ec, oc = canon(eng_rows, eng_cols), canon(ora_rows, ora_cols)
        if ec == oc:
            print(f"OK   {name}: {len(eng_rows)} rows match")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (engine {len(ec)} vs oracle {len(oc)})")
            diff = [(a, b) for a, b in zip(ec, oc) if a != b][:3]
            for a, b in diff:
                print(f"   engine: {a[:200]}")
                print(f"   oracle: {b[:200]}")
            if len(ec) != len(oc):
                only_e = set(ec) - set(oc)
                only_o = set(oc) - set(ec)
                for x in list(only_e)[:2]: print(f"   only-engine: {x[:200]}")
                for x in list(only_o)[:2]: print(f"   only-oracle: {x[:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
