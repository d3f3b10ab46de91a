#!/usr/bin/env python3
"""Precompute DuckDB oracle results for a scale dir into a cache, so the
oracle side can run concurrently with the Spark Verify dump at soak
scales. Compare later with compare_cached.py.

Small results (< FULL_LIMIT rows) are cached in the exact canonical
form check_oracle.py uses (columns sorted by name, rows sorted by
canonical value tuples) for cell-level diagnostics. Every result also
gets an order-independent digest computed INSIDE DuckDB —
(count, sum(hash(ROW(cols...)))) over name-sorted, type-canonicalized
columns — which is what makes multi-million-row outputs comparable at
soak scale without materializing them through Python. Both sides of
the compare go through the same DuckDB conversion, so engine-seam
float formatting never enters the digest.

Usage: oracle_cache.py <sfDir> <oracleSqlJson> <cacheDir> [threads] [query ...]
"""
import sys, json, os, pickle, time, glob

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb
from check_oracle import load_rows, canon_type, type_fail

FULL_LIMIT = 300_000

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "HUGEINT"}


def canonical_cols(con, from_clause):
    """Name-sorted (name, quoted_expr, declared_type) with type
    canonicalization for the digest exprs. The declared types ride along
    so compare_cached can enforce the round-8 emitted-type contract
    (canonical-class equality + whitelist) on BOTH sides of a digest
    compare — the seam the value digest alone cannot see is exactly the
    one it normalizes away."""
    desc = con.execute(f"DESCRIBE SELECT * FROM {from_clause} LIMIT 0").fetchall()
    cols = []
    for name, typ, *_ in desc:
        q = '"' + name.replace('"', '""') + '"'
        t = typ.upper()
        if t in INT_TYPES:
            expr = f"CAST({q} AS BIGINT)"
        elif t in ("FLOAT", "REAL", "DOUBLE"):
            expr = f"CAST({q} AS DOUBLE)"
        elif t.startswith("TIMESTAMP"):
            # TIMESTAMP vs TIMESTAMP_NS hash differently at equal value
            # (the sf generator writes events.ts as ns, Spark emits µs);
            # epoch_us truncates both to the same BIGINT — the same
            # equivalence the python-side datetime compare applies
            expr = f"CAST(epoch_us({q}) AS BIGINT)"
        else:
            expr = q
        cols.append((name, expr, typ))
    cols.sort(key=lambda c: c[0])
    return cols


def digest(con, from_clause):
    cols = canonical_cols(con, from_clause)
    exprs = ", ".join(e for _, e, _ in cols)
    n, h = con.execute(
        f"SELECT count(*), sum(CAST(hash(ROW({exprs})) AS HUGEINT)) "
        f"FROM {from_clause}").fetchone()
    return [c for c, _, _ in cols], [(c, t) for c, _, t in cols], n, h


def main():
    sf_dir, sql_json, cache_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    only = set(sys.argv[5:])
    os.makedirs(cache_dir, exist_ok=True)
    with open(sql_json) as f:
        oracles = json.load(f)
    # fresh connection PER QUERY: after one oracle trips the memory
    # limit, the connection's buffer pool stays poisoned and every later
    # query errors "bad allocation" (observed at sf10 — one d3 OOM
    # cascaded into 90+ spurious errors). A per-query connection also
    # bounds DuckDB's footprint (the soak runs next to a 48g Spark JVM;
    # an unbounded d-family oracle was OOM-killed at 87 GB RSS).
    mem = os.environ.get("ORACLE_CACHE_MEM", "24GB")
    # pid-unique spill dir: two concurrent cache processes sharing one
    # temp_directory delete each other's spill files (observed: DuckDB
    # abort() mid-query)
    tmp = os.path.join(cache_dir, f"duck_tmp_{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)

    def fresh_con():
        con = duckdb.connect()
        con.execute(f"SET threads TO {threads}")
        con.execute(f"SET memory_limit='{mem}'")
        # row order is irrelevant (the compare canonically sorts / the
        # digest is order-independent) and order preservation is a major
        # DuckDB memory driver on wide pipelines
        con.execute("SET preserve_insertion_order=false")
        con.execute(f"SET temp_directory='{tmp}'")
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(p)[:-len(".parquet")]
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
        return con

    for name in sorted(oracles):
        if only and name not in only:
            continue
        out = os.path.join(cache_dir, name + ".pkl")
        if os.path.exists(out):
            print(f"[skip] {name} (cached)", flush=True)
            continue
        t0 = time.time()
        con = fresh_con()
        try:
            sub = f"(\n{oracles[name]}\n) graft_oracle_sub"
            # fail BEFORE the (possibly hours-long) digest scan: a
            # non-canonical oracle output type is a gate failure however
            # the values land, so don't pay for them
            tf = type_fail("ORACLE", [(c, t) for c, _, t
                                      in canonical_cols(con, sub)])
            if tf:
                raise RuntimeError(tf)
            cols, types, n, h = digest(con, sub)
            full = None
            if n < FULL_LIMIT:
                full = load_rows(con, oracles[name])
            with open(out, "wb") as f:
                pickle.dump({"cols": cols, "types": types, "n": n,
                             "digest": h, "full": full}, f)
            kind = "full" if full else "digest"
            print(f"[ok] {name}: {n} rows ({kind}) in {time.time()-t0:.1f}s",
                  flush=True)
        except Exception as e:
            with open(os.path.join(cache_dir, name + ".err"), "w") as f:
                f.write(str(e))
            print(f"[err] {name}: {str(e)[:200]}", flush=True)
        finally:
            con.close()


if __name__ == "__main__":
    main()
