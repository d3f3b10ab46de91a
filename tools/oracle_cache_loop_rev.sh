#!/bin/bash
# Reverse-order twin of oracle_cache_loop.sh: iterates the sorted query
# list BACKWARDS so a concurrent forward loop and this one sweep toward
# each other instead of colliding on the same next-missing query (two
# identical loops were measured duplicating a 400s oracle). Same skip
# rules; same one-subprocess-per-query memory hygiene.
set -u
SF="$1"; JSON="$2"; CACHE="$3"; THREADS="${4:-8}"
mkdir -p "$CACHE"
for name in $(python3 -c "import json,sys; print('\n'.join(sorted(json.load(open('$JSON')), reverse=True)))"); do
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
