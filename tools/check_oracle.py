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

# Hash-canonical emitted types (round-8 lesson): the driver's hasher
# canonicalizes integer widths, float widths and timestamp precisions,
# but NOT 128-bit values — a HUGEINT or DECIMAL(38,0) output column
# hashes differently from an equal-valued BIGINT (the g9/m13 red rows),
# and the old python `repr` compare here was blind to it. Every query
# must therefore EMIT only types in this set, and the canonical forms
# must match column-for-column between the Spark dump and the oracle.
_INT_T = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
          "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_FLT_T = {"FLOAT", "REAL", "DOUBLE"}

def canon_type(t):
    """Canonical class for a DuckDB-declared type, or None when the type
    sits outside the driver hasher's canonicalization (HUGEINT, DECIMAL,
    BLOB, ...) — emitting such a column is a gate failure even when every
    value compares equal."""
    t = t.strip().upper()
    if t.endswith("[]"):
        inner = canon_type(t[:-2])
        return None if inner is None else inner + "[]"
    if t in _INT_T:
        return "BIGINT"
    if t in _FLT_T:
        return "DOUBLE"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t in ("VARCHAR", "BOOLEAN", "DATE"):
        return t
    if t == "JSON":
        # DuckDB's JSON is VARCHAR-backed (c1/e2 oracles build event
        # payloads with json_object); the driver hashes it as a string
        return "VARCHAR"
    return None

def declared_types(con, sql):
    """Name-sorted [(name, declared_type)] for a query, sans execution."""
    desc = con.execute(f"DESCRIBE SELECT * FROM (\n{sql}\n) graft_desc_sub "
                       "LIMIT 0").fetchall()
    return sorted((name, typ) for name, typ, *_ in desc)

def type_fail(side, types):
    """FAIL string for whitelist violations in [(name, type)], or None."""
    bad = [f"{n} {t}" for n, t in types if canon_type(t) is None]
    if bad:
        return (f"NON-CANONICAL {side} TYPE (outside the driver hasher's "
                f"canonicalization): {', '.join(bad)}")
    return None

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
        spark_sql = f"SELECT * FROM '{spark_dir}/*.parquet'"
        try:
            scols, srows = load_rows(con, spark_sql)
            stypes = declared_types(con, spark_sql)
        except Exception as e:
            results[name] = f"SPARK READ ERROR: {e}"
            continue
        tf = type_fail("SPARK", stypes)
        if tf:
            results[name] = tf
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows)"
            continue
        try:
            ocols, orows = load_rows(con, oracles[name])
            otypes = declared_types(con, oracles[name])
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {str(e)[:300]}"
            continue
        tf = type_fail("ORACLE", otypes)
        if tf:
            results[name] = tf
            continue
        tdiff = [(sn, st, ot) for (sn, st), (_, ot) in zip(stypes, otypes)
                 if canon_type(st) != canon_type(ot)]
        if scols == ocols and tdiff:
            results[name] = ("TYPE MISMATCH (equal values would still "
                             "hash-differ): " +
                             "; ".join(f"{n}: spark {st} vs oracle {ot}"
                                       for n, st, ot in tdiff))
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
