#!/usr/bin/env python3
"""Whole-result compare for answer-volume-bound queries (r9 ×100
sweep): a2/g4 at the ×100 corpus emit 60–180 M rows — materializing
them as Python tuples (sf1_sweep's canon) is the bottleneck, not the
oracle. This variant keeps EVERYTHING inside DuckDB: run the oracle
SQL, load the Spark parquet, and compare with two EXCEPT ALL
set-differences plus row counts. Exit 0 = identical multisets.

Usage: bigcompare.py <scaleDir> <outDir> <query>
"""
import sys, json, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_local import TABLES


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    # cap the allocator and give it a spill dir: the r13 x1000 sweep
    # saw the OS OOM-kill un-capped runs (DuckDB only spills blocking
    # operators when a limit is set). Override via BIGCOMPARE_MEM.
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
        ts_kind = dict(
            (r[0], r[1]) for r in
            con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall())
        if t == "events" and ts_kind.get("ts") == "BIGINT":
            # ScaleFixture stores ts as int64 NANOS (see sf1_sweep)
            con.execute(f"CREATE VIEW {t} AS SELECT event_id, "
                        f"make_timestamp(ts // 1000) AS ts, user_id, "
                        f"event_type, value, props FROM {src}")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    con.execute(f"CREATE TEMP TABLE want AS ({sql})")
    cols = [r[0] for r in con.execute("DESCRIBE want").fetchall()]
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    con.execute(f"CREATE TEMP TABLE got AS SELECT {sel} FROM "
                f"'{out_dir}/{name}/*.parquet'")
    nw = con.execute("SELECT count(*) FROM want").fetchone()[0]
    ng = con.execute("SELECT count(*) FROM got").fetchone()[0]
    if nw != ng:
        print(f"FAIL {name}: rows spark={ng} duck={nw}")
        return 1
    d1 = con.execute(f"SELECT count(*) FROM (SELECT {sel} FROM want "
                     f"EXCEPT ALL SELECT {sel} FROM got)").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM (SELECT {sel} FROM got "
                     f"EXCEPT ALL SELECT {sel} FROM want)").fetchone()[0]
    if d1 or d2:
        print(f"FAIL {name}: {d1} oracle-only / {d2} spark-only rows of {nw}")
        return 1
    print(f"PASS {name} ({nw} rows, duckdb set-difference)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
