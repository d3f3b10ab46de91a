#!/usr/bin/env python3
"""Compare a Verify output dir against an oracle_cache.py cache dir.

Schema compare: name-sorted column lists must match. Value compare:
the DuckDB-computed order-independent digest (count + sum of row
hashes over type-canonicalized columns) must match; when the cache
also holds the full canonical rows (small results), they are compared
cell-by-cell exactly like check_oracle.py for better diagnostics.

Usage: compare_cached.py <verifyOutDir> <cacheDir> [query ...]
"""
import sys, os, glob, pickle

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
from check_oracle import load_rows, declared_types, canon_type, type_fail
from oracle_cache import digest


def main():
    out_dir, cache_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    names = sorted(os.path.basename(p)[:-4]
                   for p in glob.glob(os.path.join(cache_dir, "*.pkl")))
    n_ok, n_bad = 0, 0
    for name in names:
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"[FAIL] {name}: MISSING spark result", flush=True); n_bad += 1
            continue
        with open(os.path.join(cache_dir, name + ".pkl"), "rb") as f:
            o = pickle.load(f)
        try:
            sub = f"(SELECT * FROM '{spark_dir}/*.parquet') graft_spark_sub"
            scols, stypes, sn, sh = digest(con, sub)
        except Exception as e:
            print(f"[FAIL] {name}: SPARK READ ERROR: {e}", flush=True); n_bad += 1
            continue
        # round-8 emitted-type contract: the value digest canonicalizes
        # int/float widths away, which is exactly the seam the driver's
        # hasher does NOT tolerate — so declared types are checked here,
        # independently of the values. Whitelist both sides, then require
        # canonical-class equality column-for-column.
        tf = type_fail("SPARK", stypes)
        if not o.get("types"):
            # pre-round-9 cache pickle: no declared oracle types, so the
            # canonical-class equality check below silently degrades to
            # spark-side-only — surface it instead of downgrading the
            # contract without a trace
            print(f"[WARN] {name}: cache entry has no oracle types "
                  "(pre-round-9 pickle) — oracle-side type check skipped; "
                  "regenerate via oracle_cache.py", flush=True)
        otf = type_fail("ORACLE", o["types"]) if o.get("types") else None
        tdiff = ([(a, st, ot) for (a, st), (_, ot) in zip(stypes, o["types"])
                  if canon_type(st) != canon_type(ot)]
                 if o.get("types") and scols == o["cols"] else [])
        if tf or otf:
            print(f"[FAIL] {name}: {tf or otf}", flush=True)
            n_bad += 1
        elif tdiff:
            print(f"[FAIL] {name}: TYPE MISMATCH (equal values would "
                  "still hash-differ): " +
                  "; ".join(f"{a}: spark {st} vs oracle {ot}"
                            for a, st, ot in tdiff), flush=True)
            n_bad += 1
        elif scols != o["cols"]:
            print(f"[FAIL] {name}: SCHEMA spark={scols} oracle={o['cols']}")
            n_bad += 1
        elif sn != o["n"]:
            print(f"[FAIL] {name}: ROWCOUNT spark={sn} oracle={o['n']}")
            n_bad += 1
        elif sh != o["digest"]:
            if o["full"] is not None:
                ocols, orows = o["full"]
                _, srows = load_rows(con, f"SELECT * FROM '{spark_dir}/*.parquet'")
                bad = next((i for i, (a, b) in enumerate(zip(srows, orows))
                            if a != b), None)
                if bad is None:
                    # digest seam with cell-identical rows: a type-level
                    # difference the python compare tolerates but the
                    # driver's hasher does NOT — this branch passed as a
                    # [WARN] in round 8 and let g9/m13 through a 5-scale
                    # ladder into two red driver rows. It is a FAIL.
                    print(f"[FAIL] {name}: TYPE SEAM — digest differs but "
                          f"{sn} canonical rows are cell-identical; the "
                          "emitted types hash differently at equal value",
                          flush=True)
                    n_bad += 1
                    continue
                print(f"[FAIL] {name}: VALUE at sorted-row {bad}:\n"
                      f"    spark : {srows[bad]}\n    oracle: {orows[bad]}\n"
                      f"    cols  : {ocols}", flush=True)
            else:
                print(f"[FAIL] {name}: DIGEST mismatch over {sn} rows "
                      f"(spark {sh} vs oracle {o['digest']})", flush=True)
            n_bad += 1
        else:
            kind = "digest" if o["full"] is None else "full"
            print(f"[PASS] {name}: OK ({sn} rows, {kind})", flush=True)
            n_ok += 1
    errs = sorted(glob.glob(os.path.join(cache_dir, "*.err")))
    for e in errs:
        print(f"[ORACLE-ERR] {os.path.basename(e)[:-4]}: {open(e).read()[:150]}")
    print(f"\n{n_ok}/{n_ok + n_bad} pass; {len(errs)} oracle errors")
    sys.exit(0 if (n_bad == 0 and not errs) else 1)


if __name__ == "__main__":
    main()
