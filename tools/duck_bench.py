#!/usr/bin/env python3
"""Same-suite DuckDB comparator for graft.Bench: time every oracle SQL
(dumped by graft.Verify as oracle_sql.json) over the target-SF parquet
with N threads. Dev measurement tool only — the shipped library is Scala;
this reproduces the BENCH_NOTES.md head-to-head, honestly warmed the same
way (one untimed pass per query for buffer/catalog warm-up).

Usage: duck_bench.py [sf_dir] [oracle_sql.json] [threads]
Prints one JSON line: {"total": sec, "queries": {name: sec, ...}}
"""
import sys, json, glob, os, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32

con = duckdb.connect()
con.execute(f"SET threads={threads}")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
for name, sql in sorted(oracle.items()):  # warm-up pass, off the clock
    try:
        con.sql(sql).fetchall()
    except Exception as e:
        print(f"WARMUP FAIL {name}: {e}", file=sys.stderr)

times = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.sql(sql).fetchall()
        times[name] = time.time() - t0
    except Exception:
        times[name] = -1.0
print(json.dumps({"total": sum(t for t in times.values() if t > 0),
                  "queries": times}))
