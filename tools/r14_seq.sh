#!/bin/bash
# Round-14 run sequencer: waits for the in-flight d13 sf100 oracle,
# then chains the Spark-side measurement queue so the box never idles
# between solo runs. Unlike r13_seq.sh this checks EVERY step's exit
# code and prints a per-step PASS/FAIL line, so the log distinguishes
# completed from failed steps (ADVICE r13); the waited PID's cmdline is
# verified to still be the oracle process (PID-reuse guard).
set -u
cd /root/repo
LOG() { echo "[seq $(date +%H:%M:%S)] $*"; }
STEP_RC() { # $1 step name, $2 rc
  if [ "$2" -eq 0 ]; then LOG "step '$1' PASS (rc=0)"; else LOG "step '$1' FAIL (rc=$2)"; fi
}
clean_scratch() { rm -rf /dev/shm/graft_* /root/sparktmp/graft_* 2>/dev/null; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  LOG "waiting for oracle pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null && \
        tr '\0' ' ' < "/proc/$WAIT_PID/cmdline" 2>/dev/null | grep -q "oracle_cache.py"; do
    sleep 30
  done
  LOG "pid $WAIT_PID gone (or no longer an oracle process)"
fi
clean_scratch

LOG "step: d13 sf100 digest compare"
python3 tools/compare_cached.py sfgen/vout_sf100 sfgen/ocache_sf100 d13_incremental_minhash \
  > sfgen/compare_d13_sf100_r14.log 2>&1
STEP_RC "d13-compare" $?

LOG "step: sf100 ANN solo bench (s21+w23, derived planes)"
SPARK_DRIVER_MEM=40g SPARK_GRAFT_SF_DIR=sfgen/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SCRATCH_DISK=/root/sparktmp \
  SPARK_GRAFT_BENCH_ONLY=s21_incremental_ann_apply,w23_stream_incremental_ann \
  SPARK_GRAFT_BENCH_OUT=/root/repo/sfgen/bench_sf100_ann_r14.json \
  sbt -batch "runMain graft.Bench" > sfgen/bench_sf100_ann_r14.log 2>&1
STEP_RC "sf100-ann-bench" $?
clean_scratch

LOG "step: full sf10 bench refresh at HEAD (r10-comparable config)"
SPARK_GRAFT_SF_DIR=sfgen/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/sfgen/bench_sf10_r14.json \
  sbt -batch "runMain graft.Bench" > sfgen/bench_sf10_r14.log 2>&1
STEP_RC "sf10-bench" $?
clean_scratch

LOG "step: d14 sf100 oracle (100GB + 8 threads, solo)"
ORACLE_CACHE_MEM=100GB python3 tools/oracle_cache.py \
  sfgen/sf100 sfgen/osql_sf100_d1314.json sfgen/ocache_sf100 8 d14_retire_reprobe \
  > sfgen/ocache_sf100_d14_r14.log 2>&1
STEP_RC "d14-oracle" $?
rm -rf sfgen/ocache_sf100/duck_tmp_* 2>/dev/null

LOG "step: d14 sf100 digest compare"
python3 tools/compare_cached.py sfgen/vout_sf100 sfgen/ocache_sf100 d14_retire_reprobe \
  > sfgen/compare_d14_sf100_r14.log 2>&1
STEP_RC "d14-compare" $?

LOG "ALL STEPS ATTEMPTED (read per-step PASS/FAIL above)"
