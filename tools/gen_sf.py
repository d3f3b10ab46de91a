#!/usr/bin/env python3
"""Generate a K×-scaled copy of a testdata sf dir (default 10×) for the
scale soak: every table is a union of K key-shifted copies of the base.

Design constraints (so scaling is LINEAR, not pathological):
- Join keys shift consistently per copy (custkey offsets match between
  customer/orders and events.user_id; orderkey between orders/lineitem;
  partkey/suppkey likewise), so every join's selectivity is preserved.
- region/nation stay single (dimensions; nationkeys are reused by every
  copy, which keeps the dim-join fan-in realistic).
- documents: copy k>0 suffixes every 3rd word with "_k", so EVERY
  3-gram shingle window contains a modified word -> shingle sets are
  copy-distinct. Without this, 10 identical copies of each doc make
  every per-shingle df 10x and every pairwise family (d2/d3/d6/d8)
  quadratic in the copy count -- a pathological corpus, not a scale
  test. n_chars is recomputed from the rewritten text.
- embeddings: copy k>0 vectors are md5-derived pseudo-random in
  [-1, 1) (copy-0 kept verbatim), so same-vector copies don't sit at
  cosine 1.0 and the d5 pair count scales linearly.
- events.ts is written as TIMESTAMP_NS to preserve the parquet
  TIMESTAMP(NANOS) physical type Tables.events expects
  (nanosAsLong=true + div-1000); all other timestamps keep their
  values (physical unit may differ from the base -- both engines read
  the same file, and Spark treats MILLIS/MICROS identically).

Usage: gen_sf.py <base_sf_dir> <out_dir> [K]
"""
import os
import sys

import duckdb


def main() -> None:
    base, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def src(t: str) -> str:
        return f"read_parquet('{base}/{t}.parquet')"

    def copy(t: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)

    # per-table key strides: max(key) + 1 of the base
    def stride(t: str, c: str) -> int:
        return con.execute(
            f"SELECT max({c}) + 1 FROM {src(t)}").fetchone()[0]

    ck = stride("customer", "c_custkey")
    sk = stride("supplier", "s_suppkey")
    pk = stride("part", "p_partkey")
    ok = stride("orders", "o_orderkey")
    ek = stride("events", "event_id")
    dk = stride("documents", "doc_id")
    vk = stride("embeddings", "vec_id")
    ks = f"(SELECT UNNEST(range({k})) AS k) ks"

    copy("region", f"SELECT * FROM {src('region')}")
    copy("nation", f"SELECT * FROM {src('nation')}")
    copy("customer", f"""
        SELECT c_custkey + k * {ck} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')} CROSS JOIN {ks}""")
    copy("supplier", f"""
        SELECT s_suppkey + k * {sk} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src('supplier')} CROSS JOIN {ks}""")
    copy("part", f"""
        SELECT p_partkey + k * {pk} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src('part')} CROSS JOIN {ks}""")
    copy("orders", f"""
        SELECT o_orderkey + k * {ok} AS o_orderkey,
               o_custkey + k * {ck} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')} CROSS JOIN {ks}""")
    copy("lineitem", f"""
        SELECT l_orderkey + k * {ok} AS l_orderkey,
               l_partkey + k * {pk} AS l_partkey,
               l_suppkey + k * {sk} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')} CROSS JOIN {ks}""")
    # user_id shifts by the CUSTOMER stride: events.user_id joins
    # c_custkey (w10), and every copy's users stay inside its copy's
    # customer range. Written via pyarrow: DuckDB's parquet writer demotes
    # TIMESTAMP_NS to MICROS, but Tables.events requires the physical
    # TIMESTAMP(NANOS) type (nanosAsLong=true + div-1000) — arrow
    # timestamp[ns] + parquet 2.6 preserves it.
    import pyarrow.parquet as pq
    tbl = con.execute(f"""
        SELECT event_id + k * {ek} AS event_id,
               ts::TIMESTAMP_NS AS ts,
               user_id + k * {ck} AS user_id,
               event_type, value, props
        FROM {src('events')} CROSS JOIN {ks}""").arrow()
    assert str(tbl.schema.field("ts").type) == "timestamp[ns]", tbl.schema
    pq.write_table(tbl, f"{out}/events.parquet", version="2.6",
                   coerce_timestamps=None)
    print(f"events: {tbl.num_rows} rows", flush=True)
    copy("documents", f"""
        SELECT doc_id + k * {dk} AS doc_id,
               CASE WHEN k = 0 THEN text ELSE
                 array_to_string(list_transform(string_split(text, ' '),
                   (w, i) -> CASE WHEN i % 3 = 0 THEN w || '_' || k
                             ELSE w END), ' ')
               END AS text,
               lang, source,
               CASE WHEN k = 0 THEN n_chars ELSE
                 length(array_to_string(list_transform(string_split(text, ' '),
                   (w, i) -> CASE WHEN i % 3 = 0 THEN w || '_' || k
                             ELSE w END), ' '))
               END AS n_chars
        FROM {src('documents')} CROSS JOIN {ks}""")
    copy("embeddings", f"""
        SELECT vec_id + k * {vk} AS vec_id,
               CASE WHEN k = 0 THEN embedding ELSE
                 list_transform(range(1, len(embedding) + 1), i ->
                   ((('0x' || substring(md5('sf' || k || ':' || vec_id || ':' || i), 1, 8))::BIGINT
                     % 2000000) - 1000000) / 1000000.0)::FLOAT[]
               END AS embedding,
               label
        FROM {src('embeddings')} CROSS JOIN {ks}""")

    # physical-type sanity: events.ts must stay TIMESTAMP(NANOS)
    t = con.execute(
        f"SELECT logical_type FROM parquet_schema('{out}/events.parquet') "
        "WHERE name = 'ts'").fetchone()[0]
    assert "Nano" in str(t), f"events.ts lost NANOS: {t}"
    print(f"done -> {out} (K={k}); events.ts: {t}", flush=True)


if __name__ == "__main__":
    main()
