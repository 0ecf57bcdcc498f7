#!/usr/bin/env python3
"""Dev-only emulation of the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), replays
each oracle SQL in DuckDB over the same sf tables, and compares: columns
sorted by name, rows sorted, values hashed. NOT part of the shipped
library — the Scala engine has no python dependency.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
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
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.10g}"
            elif isinstance(v, bytes):
                v = v.hex()
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_bad += 1; continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_bad += 1
        elif gr != er:
            diffs = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"FAIL {name}: rows differ (got {len(gr)} vs exp {len(er)})")
            for i in diffs:
                print(f"    got[{i}]={gr[i]}\n    exp[{i}]={er[i]}")
            if len(gr) != len(er) and gr and er:
                print(f"    first got={gr[0]}\n    first exp={er[0]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(gr)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
