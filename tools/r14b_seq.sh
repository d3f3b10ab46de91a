#!/bin/bash
# Round-14 session-B sequencer (fresh box — sfgen was scratch and died
# with the container): after gen_sf rebuilds sfgen/sf{1,10,100}
# deterministically, dump the Spark side for the open parity tail
# (d13/d14 — verdict item 2 — plus the cheap half of the heavy set:
# d3/d6/g4), regenerate the osql subsets FROM HEAD (the g-family egc
# rank rule and ANN plane derivation changed this round — committed
# pre-r14 snapshots are stale), then run the DuckDB oracles strictly
# solo in ascending projected cost. Per-step RC lines like r14_seq.sh.
# g1/g10 sf100 oracles (~2-4h each projected from g1's 762.6s sf10
# solo) do not fit one session alongside d13+d14 (~2h each) — they
# remain documented-queued; their dump is skipped too (2,300s engine
# time that pays off only when the oracle side can run).
set -u
cd /root/repo
LOG() { echo "[seqB $(date +%H:%M:%S)] $*"; }
STEP_RC() { if [ "$2" -eq 0 ]; then LOG "step '$1' PASS (rc=0)"; else LOG "step '$1' FAIL (rc=$2)"; fi; }
clean_scratch() { rm -rf /dev/shm/graft_* /root/sparktmp/graft_* sfgen/ocache_sf100/duck_tmp_* 2>/dev/null; }

DUMP_SET="d13_incremental_minhash d14_retire_reprobe d3_dedup_minhash_lsh d6_dedup_clusters g4_triangles"

LOG "step: sf100 Spark dump ($DUMP_SET)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SCRATCH_DISK=/root/sparktmp SPARK_GRAFT_NO_COALESCE=1 \
  sbt -batch "runMain graft.Verify sfgen/sf100 sfgen/vout_sf100 $DUMP_SET" \
  > sfgen/vout_sf100_r14b.log 2>&1
STEP_RC "sf100-dump" $?
clean_scratch

LOG "step: osql subsets from the HEAD dump"
python3 - <<'EOF'
import json
o = json.load(open('sfgen/vout_sf100/oracle_sql.json'))
json.dump({'d14_retire_reprobe': o['d14_retire_reprobe']},
          open('sfgen/osql_sf100_d14.json', 'w'))
json.dump({'d13_incremental_minhash': o['d13_incremental_minhash']},
          open('sfgen/osql_sf100_d13.json', 'w'))
json.dump({k: o[k] for k in ('d3_dedup_minhash_lsh', 'd6_dedup_clusters',
                             'g4_triangles')},
          open('sfgen/osql_sf100_heavy14.json', 'w'))
print('osql subsets written')
EOF
STEP_RC "osql-subsets" $?

export ORACLE_CACHE_MEM=100GB
export ORACLE_ATTEMPT_TIMEOUT=14400

LOG "step: d14 sf100 oracle (100GB, 8 threads, solo, 4h cap)"
bash tools/oracle_cache_loop.sh sfgen/sf100 sfgen/osql_sf100_d14.json \
  sfgen/ocache_sf100 8 > sfgen/ocache_sf100_d14_r14b.log 2>&1
STEP_RC "d14-oracle-loop" $?
clean_scratch
python3 tools/compare_cached.py sfgen/vout_sf100 sfgen/ocache_sf100 \
  d14_retire_reprobe > sfgen/compare_d14_sf100_r14b.log 2>&1
STEP_RC "d14-compare" $?

# d13 goes straight to 6 threads: its 8-thread attempt died of the
# DuckDB per-thread allocator class at 82 GB RSS last session — the
# d14-sf10 lesson says threads, not the buffer budget, are the knob.
LOG "step: d13 sf100 oracle (100GB, 6 threads, solo, 4h cap)"
bash tools/oracle_cache_loop.sh sfgen/sf100 sfgen/osql_sf100_d13.json \
  sfgen/ocache_sf100 6 > sfgen/ocache_sf100_d13_r14b.log 2>&1
STEP_RC "d13-oracle-6thr" $?
clean_scratch
python3 tools/compare_cached.py sfgen/vout_sf100 sfgen/ocache_sf100 \
  d13_incremental_minhash > sfgen/compare_d13_sf100_r14b.log 2>&1
STEP_RC "d13-compare" $?

LOG "step: heavy trio oracles (d3, d6, g4 — ascending projected cost)"
bash tools/oracle_cache_loop.sh sfgen/sf100 sfgen/osql_sf100_heavy14.json \
  sfgen/ocache_sf100 8 > sfgen/ocache_sf100_heavy_r14b.log 2>&1
STEP_RC "heavy-oracle-loop" $?
clean_scratch

LOG "step: full r14 parity file"
python3 tools/compare_cached.py sfgen/vout_sf100 sfgen/ocache_sf100 \
  > sfgen/parity_sf100_r14.txt 2>&1
STEP_RC "parity-file" $?
LOG "ALL STEPS ATTEMPTED (read per-step PASS/FAIL above)"
