#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the test parquet tables and diff against the Spark result
parquet written by graft.Verify. Dev tool only (the shipped library is
Scala; this mirrors the driver's Python-side check)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        fails.append((name, "no spark output")); continue
    try:
        orel = con.sql(sql)
        oarrow = orel.arrow()
        odf = oarrow.to_pandas()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    try:
        srel = con.sql(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
        sarrow = srel.arrow()
        sdf = sarrow.to_pandas()
    except Exception as e:
        fails.append((name, f"spark read error: {e}")); continue
    # dtype-strict: the driver hashes TYPED values, so decimal128 vs int64
    # (DuckDB HUGEINT from sum(BIGINT) without a cast) must fail here too,
    # not be masked by pandas float coercion (r12 q98 lesson).
    otypes = {f.name: str(f.type) for f in oarrow.schema}
    stypes = {f.name: str(f.type) for f in sarrow.schema}
    def _canon(t):
        # timestamp tz-representation and large_string/string differences
        # are serialization details the driver's hash does not see
        return (t.replace("large_string", "string")
                 .replace("timestamp[us, tz=UTC]", "timestamp[us]")
                 .replace("timestamp[ns, tz=UTC]", "timestamp[ns]")
                 .replace("timestamp[ns]", "timestamp[us]"))
    dt_diffs = [(c, otypes.get(c), stypes.get(c)) for c in sorted(otypes)
                if c in stypes and _canon(otypes[c]) != _canon(stypes[c])]
    if dt_diffs:
        fails.append((name, f"dtype differs (driver hash would mismatch): {dt_diffs}")); continue
    # driver compare: sort columns by name, then hash values
    o = odf[sorted(odf.columns)]
    s = sdf[sorted(sdf.columns)]
    if sorted(odf.columns) != sorted(sdf.columns):
        fails.append((name, f"columns differ: oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}")); continue
    if len(o) != len(s):
        fails.append((name, f"rowcount differ: oracle={len(o)} spark={len(s)}")); continue
    diff_cols = []
    for c in o.columns:
        ov, sv = o[c].tolist(), s[c].tolist()
        for i, (a, b) in enumerate(zip(ov, sv)):
            if a is None and b is None: continue
            try:
                import math
                an = a is None or (isinstance(a, float) and math.isnan(a))
                bn = b is None or (isinstance(b, float) and math.isnan(b))
                if an and bn: continue
                if an != bn:
                    diff_cols.append((c, i, a, b)); break
            except Exception: pass
            if isinstance(a, float) or isinstance(b, float):
                if a != b:  # exact: driver hashes, so exact match matters
                    diff_cols.append((c, i, a, b)); break
            elif str(a) != str(b):
                diff_cols.append((c, i, a, b)); break
    if diff_cols:
        fails.append((name, f"value diffs: {diff_cols[:3]}"))
    else:
        passes.append((name, len(o)))

for n, rows in passes: print(f"PASS {n} ({rows} rows)")
for n, why in fails: print(f"FAIL {n}: {why}")
print(f"\n{len(passes)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
