#!/bin/bash
# Reverse-order twin of oracle_cache_loop.sh: iterates the sorted query
# list BACKWARDS so a concurrent forward loop and this one sweep toward
# each other instead of colliding on the same next-missing query (two
# identical loops were measured duplicating a 400s oracle). Same skip
# rules; same one-subprocess-per-query memory hygiene; same retry-solo
# on allocation-flavored failures (see the forward loop's header).
set -u
SF="$1"; JSON="$2"; CACHE="$3"; THREADS="${4:-8}"
ATT_TIMEOUT="${ORACLE_ATTEMPT_TIMEOUT:-3600}"
mkdir -p "$CACHE"

attempt() { # $1 = query name
  timeout "$ATT_TIMEOUT" python3 tools/oracle_cache.py "$SF" "$JSON" "$CACHE" "$THREADS" "$1"
  local rc=$?
  if [ $rc -ne 0 ] && [ ! -f "$CACHE/$1.pkl" ] && [ ! -f "$CACHE/$1.err" ]; then
    echo "process failure rc=$rc" > "$CACHE/$1.err"
    echo "[err] $1: process failure rc=$rc"
  fi
}

for name in $(python3 -c "import json,sys; print('\n'.join(sorted(json.load(open('$JSON')), reverse=True)))"); do
  [ -f "$CACHE/$name.pkl" ] && continue
  # cleared .err = fresh attempt = fresh retry budget; a marker whose
  # claiming PID is still a live loop means the query is mid-retry in
  # the peer — skip, don't duplicate (see forward loop)
  if [ ! -f "$CACHE/$name.err" ] && [ -f "$CACHE/$name.retried" ]; then
    cpid="$(cat "$CACHE/$name.retried" 2>/dev/null)"
    if [ -n "$cpid" ] && kill -0 "$cpid" 2>/dev/null && \
       tr '\0' ' ' < "/proc/$cpid/cmdline" 2>/dev/null | grep -q "oracle_cache_loop"; then
      continue  # live peer loop owns this retry
    fi
    # dead claimant: atomic mv takeover — exactly one loop wins the
    # rename, so two loops observing the same dead PID can never both
    # re-attempt (see forward loop for the full rationale)
    if mv "$CACHE/$name.retried" "$CACHE/$name.retried.stale.$$" 2>/dev/null; then
      rm -f "$CACHE/$name.retried.stale.$$"
    else
      continue  # a peer won the takeover; it owns this attempt
    fi
  fi
  [ -f "$CACHE/$name.err" ] && continue
  attempt "$name"
  # Allocation-flavored deaths and kernel OOM-kills (rc=137); timeout
  # rc=124 must not re-run. The retry is claimed via an atomic noclobber
  # marker carrying OUR PID so the concurrent forward loop can never
  # duplicate it (see the forward loop's header).
  if [ ! -f "$CACHE/$name.pkl" ] && [ -f "$CACHE/$name.err" ] && \
     grep -qiE "bad allocation|out of memory|failed to allocate|rc=137" "$CACHE/$name.err"; then
    if ( set -o noclobber; echo $$ > "$CACHE/$name.retried" ) 2>/dev/null; then
      echo "[retry-solo] $name: allocation-flavored failure — clearing dead spill dirs and retrying once"
      rm -f "$CACHE/$name.err"
      for d in "$CACHE"/duck_tmp_*; do
        [ -d "$d" ] || continue
        pid="${d##*duck_tmp_}"
        if kill -0 "$pid" 2>/dev/null && \
           tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q "oracle_cache.py"; then
          continue
        fi
        rm -rf "$d"
      done
      attempt "$name"
    fi
  fi
done
echo "LOOP_DONE"
