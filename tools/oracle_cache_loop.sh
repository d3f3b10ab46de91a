#!/bin/bash
# One oracle_cache.py SUBPROCESS per query: DuckDB memory accounting is
# per-process in practice (closed in-process connections were observed
# leaving the next connect() unable to allocate), so each oracle gets a
# fresh OS process and the kernel reclaims everything between queries.
# Usage: oracle_cache_loop.sh <sfDir> <oracleSqlJson> <cacheDir> [threads]
set -u
SF="$1"; JSON="$2"; CACHE="$3"; THREADS="${4:-8}"
mkdir -p "$CACHE"
for name in $(python3 -c "import json,sys; print('\n'.join(sorted(json.load(open('$JSON')))))"); do
  [ -f "$CACHE/$name.pkl" ] && continue
  [ -f "$CACHE/$name.err" ] && continue
  timeout 3600 python3 tools/oracle_cache.py "$SF" "$JSON" "$CACHE" "$THREADS" "$name"
  rc=$?
  if [ $rc -ne 0 ] && [ ! -f "$CACHE/$name.pkl" ] && [ ! -f "$CACHE/$name.err" ]; then
    echo "process failure rc=$rc" > "$CACHE/$name.err"
    echo "[err] $name: process failure rc=$rc"
  fi
done
echo "LOOP_DONE"
# (spill dirs are pid-unique and transient; clean them manually once NO
# cache run is live -- an end-of-loop rm would race a concurrent loop)
