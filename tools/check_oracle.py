#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB (tables
registered as views over the sf parquet dir), loads the corresponding
Spark result parquet, sorts columns by name and rows by value, and
compares cell-by-cell. Mirrors the driver contract: "sorts columns by
name before hashing values".

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb

def canon(v):
    # canonical value form for hashing/compare
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def load_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    results = {}
    names = sorted(set(list(oracles) +
                       [os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                        if os.path.isdir(d)]))
    for name in names:
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            results[name] = "MISSING spark result"
            continue
        try:
            scols, srows = load_rows(con, f"SELECT * FROM '{spark_dir}/*.parquet'")
        except Exception as e:
            results[name] = f"SPARK READ ERROR: {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows)"
            continue
        try:
            ocols, orows = load_rows(con, oracles[name])
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {str(e)[:300]}"
            continue
        if scols != ocols:
            results[name] = f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            results[name] = (f"VALUE MISMATCH at sorted-row {bad}:\n"
                             f"    spark : {srows[bad]}\n    oracle: {orows[bad]}\n"
                             f"    cols  : {scols}")
        else:
            results[name] = f"OK ({len(srows)} rows)"

    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for name in sorted(results):
        status = results[name]
        mark = "PASS" if status.startswith(("OK", "rows-only")) else "FAIL"
        print(f"[{mark}] {name}: {status}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
