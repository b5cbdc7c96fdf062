#!/usr/bin/env python3
"""Replay the driver's correctness compare locally: for every query in a
graft.Verify dump, run its oracle SQL in DuckDB over the same parquet
tables and compare rows/schema/values (columns sorted by name, rows as a
sorted multiset, exact value equality).

Usage: check_oracles.py <sfDir> <verifyOutDir>
"""
import sys
import json
import glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def frame(con, sql):
    t = con.execute(sql).fetch_arrow_table()
    cols = sorted(t.column_names)
    rows = sorted(tuple(norm(t.column(c)[i].as_py()) for c in cols)
                  for i in range(t.num_rows))
    return cols, rows


def main(sf, out):
    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{sf}/{tb}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    missing = []
    for d in sorted(glob.glob(f"{out}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            continue
        if name not in oracles:
            missing.append(name)
            continue
        got_cols, got_rows = frame(
            con, f"SELECT * FROM read_parquet('{files[0]}')")
        try:
            exp_cols, exp_rows = frame(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        ok = got_cols == exp_cols and got_rows == exp_rows
        if not ok:
            failures += 1
            print(f"FAIL {name}: cols {got_cols == exp_cols} "
                  f"rows {len(got_rows)}/{len(exp_rows)}")
            if got_cols != exp_cols:
                print("  spark:", got_cols, "\n  oracle:", exp_cols)
            else:
                diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
                for g, e in diff[:3]:
                    print("  spark:", g, "\n  oracle:", e)
        else:
            print(f"ok   {name} ({len(got_rows)} rows)")
    if missing:
        print("NO ORACLE:", ", ".join(missing))
    print(f"== {failures} failures, {len(missing)} without oracle ==")
    sys.exit(1 if failures or missing else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
