#!/usr/bin/env python3
"""Local strict mimic of the driver's duckdb-oracle compare.

Usage: verify_local.py <sfDir> <outDir> [query ...]

Reads outDir/oracle_sql.json, runs each SQL in duckdb with views for
the parquet fixture tables, loads the Spark parquet result, sorts
columns by name and rows by all columns, and compares values EXACTLY
(bit-level for floats). Stricter than any plausible driver compare.
"""
import sys, json, math, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(norm(v) for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def norm(v):
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want_rel = con.execute(sql)
            want_cols = [c[0] for c in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1; continue
        tab = pq.read_table(files[0])
        got_cols = tab.column_names
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns differ: spark={sorted(got_cols)} duck={sorted(want_cols)}")
            n_fail += 1; continue
        order = sorted(got_cols)
        got_rows = [tuple(row[c] for c in order) for row in tab.to_pylist()]
        want_idx = [want_cols.index(c) for c in order]
        want_rows = [tuple(r[i] for i in want_idx) for r in want]
        g, w = canon(got_rows), canon(want_rows)
        if len(g) != len(w):
            print(f"FAIL {name}: row count spark={len(g)} duck={len(w)}")
            n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:")
            print(f"  cols : {order}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
