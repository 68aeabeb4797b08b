#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare with the Spark result parquet.
Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
# Verify dual-keys every oracle ("qNN_x" and "qNN_x.parquet") for driver
# compatibility; collapse to the bare form here so paths resolve once.
oracles = {k: v for k, v in oracles.items()
           if not (k.endswith(".parquet") and k.removesuffix(".parquet") in oracles)}

def canon(df):
    df = df[sorted(df.columns)]
    return df

def values_match(a, b):
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    # the driver's compare is TYPE-sensitive: an int64 Spark column vs a
    # HUGEINT->float64 DuckDB column hash-mismatches even when every value is
    # equal (bit us on q61 in round 4). Compare dtype families so that class
    # of bug fails locally too; width differences (int32 vs int64) stay fine.
    def family(k):
        return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, k)
    for c in a.columns:
        fa, fb = family(a[c].dtype.kind), family(b[c].dtype.kind)
        if fa != fb:
            return False, f"col {c} dtype family {a[c].dtype} vs {b[c].dtype}"
    for c in a.columns:
        x, y = a[c], b[c]
        for i in range(len(x)):
            vx, vy = x.iloc[i], y.iloc[i]
            if pd.isna(vx) and pd.isna(vy):
                continue
            if isinstance(vx, float) or isinstance(vy, float):
                try:
                    fx, fy = float(vx), float(vy)
                except (TypeError, ValueError):
                    return False, f"col {c} row {i}: {vx!r} vs {vy!r}"
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if fx != fy:
                    return False, f"col {c} row {i}: {vx!r} vs {vy!r}"
            elif str(vx) != str(vy):
                return False, f"col {c} row {i}: {vx!r} vs {vy!r}"
    return True, ""

# CHECK_ONLY=q26,q61 restricts to matching names (iteration aid, mirrors
# Verify's SPARK_GRAFT_ONLY so a filtered Verify output checks cleanly)
import os
_only = os.environ.get("CHECK_ONLY")
if _only:
    pref = _only.split(",")
    oracles = {k: v for k, v in oracles.items()
               if any(k.startswith(p) for p in pref)}

results = {}
for name in sorted(oracles):
    path = f"{out_dir}/{name}.parquet"
    files = glob.glob(f"{path}/*.parquet")
    entry = {}
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) if files else None
        if spark_df is None:
            entry["error"] = "no spark output"
            results[name] = entry
            continue
        duck_df = con.execute(oracles[name]).df()
        s, d = canon(spark_df), canon(duck_df)
        entry["rows_spark"] = len(s)
        entry["rows_duck"] = len(d)
        entry["rows_match"] = len(s) == len(d)
        entry["schema_spark"] = list(s.columns)
        entry["schema_duck"] = list(d.columns)
        entry["schema_match"] = list(s.columns) == list(d.columns)
        if entry["rows_match"] and entry["schema_match"]:
            ok, why = values_match(s, d)
            entry["hash_match"] = ok
            if not ok:
                entry["mismatch"] = why
        else:
            entry["hash_match"] = False
    except Exception as e:
        entry["error"] = str(e)[:500]
    results[name] = entry

# no-oracle queries: rows>0 check (CHECK_ONLY filters this pass too, so a
# filtered run against a full Verify output dir reports no extra queries)
all_qs = sorted(set(x.split("/")[-1].removesuffix(".parquet")
                    for x in glob.glob(f"{out_dir}/q*.parquet")))
if _only:
    all_qs = [q for q in all_qs if any(q.startswith(p) for p in pref)]
for name in all_qs:
    if name in results:
        continue
    files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    results[name] = {"rows_spark": n, "rows_only": True, "nonempty": n > 0}

n_pass = sum(1 for r in results.values() if r.get("hash_match") or r.get("nonempty"))
print(json.dumps(results, indent=1, default=str))
print(f"\nPASS {n_pass}/{len(results)}", file=sys.stderr)
for name, r in results.items():
    if not (r.get("hash_match") or r.get("nonempty")):
        print(f"FAIL {name}: {json.dumps(r, default=str)[:300]}", file=sys.stderr)
