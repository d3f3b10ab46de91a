#!/bin/bash
# Round-13 run sequencer: chains the Spark-side measurement queue once
# the in-flight sf100 missing-set bench exits, so the box never idles
# between solo runs. Each step is a fresh forked JVM; logs under sfgen/.
set -u
cd /root/repo
# wait on the EXPLICIT pid of the in-flight run (pgrep -f on the class
# name false-matched sibling watcher shells whose cmdline quoted it)
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[seq] waiting for pid $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
rm -rf /dev/shm/graft_* /root/sparktmp/graft_* 2>/dev/null

echo "[seq] d14 sf10 spark dump"
SPARK_DRIVER_MEM=40g \
  sbt -batch "runMain graft.Verify sfgen/sf10 sfgen/vout_sf10_d14 d14_retire_reprobe" \
  > sfgen/vout_sf10_d14.log 2>&1
rm -rf /dev/shm/graft_* /root/sparktmp/graft_* 2>/dev/null

echo "[seq] sf0.1 bench re-emit (fixed record line)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/sfgen/bench_sf01_r13.json \
  sbt -batch "runMain graft.Bench" > sfgen/bench_sf01_r13.log 2>&1
rm -rf /dev/shm/graft_* /root/sparktmp/graft_* 2>/dev/null

echo "[seq] full sf0.01 verify dump"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_r13" \
  > sfgen/verify_r13.log 2>&1
rm -rf /dev/shm/graft_* /root/sparktmp/graft_* 2>/dev/null

echo "[seq] sf1 bench refresh"
SPARK_GRAFT_SF_DIR=sfgen/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/sfgen/bench_sf1_r13.json \
  sbt -batch "runMain graft.Bench" > sfgen/bench_sf1_r13.log 2>&1
rm -rf /dev/shm/graft_* /root/sparktmp/graft_* 2>/dev/null

# r10-comparable config: CPUS=32, default shuffle partitions and heap
echo "[seq] sf10 bench refresh"
SPARK_GRAFT_SF_DIR=sfgen/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/sfgen/bench_sf10_r13.json \
  sbt -batch "runMain graft.Bench" > sfgen/bench_sf10_r13.log 2>&1
rm -rf /dev/shm/graft_* /root/sparktmp/graft_* 2>/dev/null
echo "[seq] ALL DONE"
