#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: for each SparkEntry query,
compare the Verify.scala parquet dump against the DuckDB oracle SQL.
Columns sorted by name, rows sorted, values normalized. Dev tool only —
the engine itself never depends on this."""
import json, sys, glob, os
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
out_dir = args[0] if len(args) > 0 else "/tmp/verify_out"
sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
# --only=a,b / --skip=a,b: select queries (the sf0.1 gate needs this —
# a few graph-family DuckDB replays exceed the box's memory at sf0.1;
# those pin to sf0.01 and are compared in their own bounded run).
# --mem=24GB: bound DuckDB so a heavy replay errors instead of having
# the kernel OOM-kill the whole compare.
only, skip, mem = None, set(), None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        only = set(a[7:].split(","))
    elif a.startswith("--skip="):
        skip = set(a[7:].split(","))
    elif a.startswith("--mem="):
        mem = a[6:]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
if mem:
    con.execute(f"SET memory_limit='{mem}'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "timestamp"):  # datetime
        return v.timestamp()
    if hasattr(v, "as_py"):
        return norm(v.as_py())
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out

fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if (only is not None and name not in only) or name in skip:
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet written")
        fails += 1
        continue
    sd = con.execute(f"SELECT * FROM '{d}/*.parquet'")
    s_cols = [c[0] for c in sd.description]
    s_rows = sd.fetchall()
    if name not in oracle:
        print(f"  ok  {name}: rows-only ({len(s_rows)} rows, no oracle)")
        continue
    try:
        od = con.execute(oracle[name])
        o_cols = [c[0] for c in od.description]
        o_rows = od.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    # The driver's bridge goes through pandas, where DuckDB HUGEINT
    # (e.g. bare sum(int)) lands as float64 and hashes as "42.0" vs the
    # Spark parquet's int64 "42". Python's 42 == 42.0 hides that here,
    # so compare dtype *kinds* through the same pandas path the driver
    # uses and fail on int-vs-float drift.
    s_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
    o_df = con.execute(oracle[name]).df()
    kind = lambda df, c: ("num-int" if df[c].dtype.kind in "iu" else
                          "num-float" if df[c].dtype.kind == "f" else "other")
    drift = [c for c in s_df.columns if c in o_df.columns
             and kind(s_df, c) != kind(o_df, c)
             and "num" in kind(s_df, c) and "num" in kind(o_df, c)]
    if drift:
        print(f"FAIL {name}: int/float dtype drift on {drift} "
              f"(driver's pandas hash would differ — cast the oracle)")
        fails += 1
        continue
    sc, sr = canon(s_cols, s_rows)
    oc, orr = canon(o_cols, o_rows)
    if sc != oc:
        print(f"FAIL {name}: schema {sc} != {oc}")
        fails += 1
    elif len(sr) != len(orr):
        print(f"FAIL {name}: rowcount {len(sr)} != {len(orr)}")
        fails += 1
    elif sr != orr:
        diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        print(f"FAIL {name}: values differ, e.g. {diff}")
        fails += 1
    else:
        print(f"  ok  {name}: {len(sr)} rows match")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
