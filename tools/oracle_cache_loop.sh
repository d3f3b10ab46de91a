#!/bin/bash
# One oracle_cache.py SUBPROCESS per query: DuckDB memory accounting is
# per-process in practice (closed in-process connections were observed
# leaving the next connect() unable to allocate), so each oracle gets a
# fresh OS process and the kernel reclaims everything between queries.
#
# Retry-solo (round-9 d13 lesson, SURVEY §7.13): DuckDB's sf10
# "bad allocation" / OOM deaths can be flaky allocator state, not data
# fan-out — d13's oracle died twice then completed identically
# configured (peak RSS 8.4 GB). When an attempt errs with an
# allocation-flavored message, this loop now clears the .err, removes
# stale duck_tmp spill dirs, and retries ONCE more before recording the
# failure — the manual recipe, automated.
# Usage: oracle_cache_loop.sh <sfDir> <oracleSqlJson> <cacheDir> [threads]
# ORACLE_ATTEMPT_TIMEOUT (seconds, default 3600) bounds each attempt —
# sf100 heavy oracles (d13/d14 project ~2h solo) need it raised or the
# timeout kill masquerades as a query failure.
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

for name in $(python3 -c "import json,sys; print('\n'.join(sorted(json.load(open('$JSON')))))"); do
  [ -f "$CACHE/$name.pkl" ] && continue
  # an operator clearing a .err asks for a FRESH attempt — that includes a
  # fresh retry budget, so drop any stale .retried claim marker from a
  # previous round (otherwise the next allocation failure gets no retry).
  # BUT "no .err + .retried present" is also exactly what a PEER loop
  # mid-retry looks like (it removed the .err it just claimed): the
  # marker carries the claiming loop's PID, and we only clear it when
  # that PID is dead — a live claimant means the query is in flight, so
  # skip it entirely rather than duplicate the run.
  if [ ! -f "$CACHE/$name.err" ] && [ -f "$CACHE/$name.retried" ]; then
    cpid="$(cat "$CACHE/$name.retried" 2>/dev/null)"
    if [ -n "$cpid" ] && kill -0 "$cpid" 2>/dev/null && \
       tr '\0' ' ' < "/proc/$cpid/cmdline" 2>/dev/null | grep -q "oracle_cache_loop"; then
      continue  # live peer loop owns this retry
    fi
    # Dead claimant: take over ATOMICALLY via rename — two loops making
    # the same dead-PID observation would otherwise both rm the marker
    # and both re-attempt (the duplicated multi-hundred-second run the
    # marker exists to prevent). mv of the same source succeeds in
    # exactly one process; the loser skips and the winner proceeds with
    # a fresh retry budget (the marker is consumed, not held).
    if mv "$CACHE/$name.retried" "$CACHE/$name.retried.stale.$$" 2>/dev/null; then
      rm -f "$CACHE/$name.retried.stale.$$"
    else
      continue  # a peer won the takeover; it owns this attempt
    fi
  fi
  [ -f "$CACHE/$name.err" ] && continue
  attempt "$name"
  # Retry allocation-flavored deaths AND kernel OOM-kills (a SIGKILLed
  # subprocess surfaces as bash rc=137 with no allocator message — the
  # most common failure class this retry exists for). rc=124 (the 3600s
  # timeout kill) is explicitly excluded: a legit timeout must not get a
  # second full-hour attempt. The retry is claimed via an atomic
  # noclobber marker carrying OUR PID so a concurrent fwd/rev loop can
  # never clobber the .err this loop just wrote and duplicate the re-run
  # (and so the stale-marker cleanup above can tell in-flight from dead).
  if [ ! -f "$CACHE/$name.pkl" ] && [ -f "$CACHE/$name.err" ] && \
     grep -qiE "bad allocation|out of memory|failed to allocate|rc=137" "$CACHE/$name.err"; then
    if ( set -o noclobber; echo $$ > "$CACHE/$name.retried" ) 2>/dev/null; then
      echo "[retry-solo] $name: allocation-flavored failure — clearing dead spill dirs and retrying once"
      rm -f "$CACHE/$name.err"
      # only reap spill dirs whose owning pid is gone AND was actually an
      # oracle process: bare kill -0 is fooled by pid reuse, leaving a dead
      # loop's multi-GB spill dir in place on exactly the OOM path that
      # needs the disk back
      for d in "$CACHE"/duck_tmp_*; do
        [ -d "$d" ] || continue
        pid="${d##*duck_tmp_}"
        if kill -0 "$pid" 2>/dev/null && \
           tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q "oracle_cache.py"; then
          continue  # live oracle process owns this spill dir
        fi
        rm -rf "$d"
      done
      attempt "$name"
    fi
  fi
done
echo "LOOP_DONE"
# (spill dirs are pid-unique and transient; clean them manually once NO
# cache run is live -- an end-of-loop rm would race a concurrent loop)
