#!/usr/bin/env python3
"""One-time sf1-equivalent hash sweep (r8 verdict #8).

Usage: sf1_sweep.py <scaleDir> <outDir> <query> [timeout_s]

Like tools/verify_local.py but for the ScaleFixture corpora, whose
tables are parquet DIRECTORIES and whose table set is a subset of the
driver fixture's. Run one query per invocation (wrap in `timeout` so
an oracle that is super-linear at this scale records as infeasible
rather than hanging the sweep). Exit 0 = hash-verified, 1 = mismatch,
2 = oracle error.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_local import canon, TABLES


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    # cap + spill dir (r13): without a limit DuckDB never spills its
    # blocking operators and the OS OOM-kills the sweep under
    # concurrent load. Override via BIGCOMPARE_MEM.
    con.execute(f"PRAGMA memory_limit='{os.environ.get('BIGCOMPARE_MEM', '48GB')}'")
    spill = os.environ.get("BIGCOMPARE_SPILL", "/tmp/duck_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"PRAGMA temp_directory='{spill}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else (
            f"'{p}'" if os.path.exists(p) else None)
        if src is None:
            continue
        if t == "events":
            # the ScaleFixture stores ts as BIGINT NANOS (the
            # nanosAsLong layout; the Spark loader truncates ns->us);
            # expose the TIMESTAMP the oracle SQL's epoch_us(ts) expects
            con.execute(f"CREATE VIEW {t} AS SELECT event_id, "
                        f"make_timestamp(ts // 1000) AS ts, user_id, "
                        f"event_type, value, props FROM {src}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    try:
        rel = con.execute(sql)
        want_cols = [c[0] for c in rel.description]
        want = rel.fetchall()
    except Exception as e:
        print(f"ORACLE-ERROR {name}: {str(e)[:200]}")
        return 2
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        return 1
    tab = pq.read_table(files[0])
    got_cols = tab.column_names
    if sorted(got_cols) != sorted(want_cols):
        print(f"FAIL {name}: cols spark={sorted(got_cols)} duck={sorted(want_cols)}")
        return 1
    order = sorted(got_cols)
    got_rows = [tuple(row[c] for c in order) for row in tab.to_pylist()]
    want_idx = [want_cols.index(c) for c in order]
    want_rows = [tuple(r[i] for i in want_idx) for r in want]
    g, w = canon(got_rows), canon(want_rows)
    if len(g) != len(w):
        print(f"FAIL {name}: row count spark={len(g)} duck={len(w)}")
        return 1
    bad = [(a, b) for a, b in zip(g, w) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first:")
        print(f"  cols : {order}\n  spark: {bad[0][0]}\n  duck : {bad[0][1]}")
        return 1
    print(f"PASS {name} ({len(g)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
