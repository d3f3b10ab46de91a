#!/bin/bash
# Round-14 follow-up: after r14_seq.sh (sf100 ANN bench -> sf10 bench ->
# d14 oracle) exits, retry the d13 sf100 oracle STRICTLY SOLO at reduced
# thread count (its 8-thread attempt died of the DuckDB per-thread
# allocator class at 82 GB RSS — the d14-sf10 lesson says threads, not
# the buffer budget, are the knob), then compare and emit the r14
# parity file. Per-step RC lines like r14_seq.sh.
set -u
cd /root/repo
LOG() { echo "[d13retry $(date +%H:%M:%S)] $*"; }
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  LOG "waiting for sequencer pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
rm -rf /dev/shm/graft_* /root/sparktmp/graft_* sfgen/ocache_sf100/duck_tmp_* 2>/dev/null
rm -f sfgen/ocache_sf100/d13_incremental_minhash.err \
      sfgen/ocache_sf100/d13_incremental_minhash.retried

LOG "step: d13 sf100 oracle retry (100GB, 6 threads, solo, auto-retry loop)"
export ORACLE_CACHE_MEM=100GB
bash tools/oracle_cache_loop.sh sfgen/sf100 sfgen/osql_sf100_d1314.json \
  sfgen/ocache_sf100 6 > sfgen/ocache_sf100_d13_r14b.log 2>&1
LOG "loop rc=$? (see sfgen/ocache_sf100_d13_r14b.log)"
rm -rf sfgen/ocache_sf100/duck_tmp_* 2>/dev/null

LOG "step: d13/d14 digest compare + r14 parity file"
python3 tools/compare_cached.py sfgen/vout_sf100 sfgen/ocache_sf100 \
  > sfgen/parity_sf100_r14.txt 2>&1
LOG "compare rc=$?"
LOG "DONE"
