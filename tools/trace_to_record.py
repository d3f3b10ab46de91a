#!/usr/bin/env python3
"""Build a (possibly partial) sf100 bench record from the bench trace.

The bench writes its JSON only at the end of the run; on a soak that
outlives the round budget this recovers per-query wall times from the
SPARK_GRAFT_BENCH_TRACE start lines (time between consecutive starts =
the earlier query's wall). The final in-flight query is NOT recorded.
If the bench's own JSON exists, prefer it verbatim.

Usage: trace_to_record.py <bench_log> <out_json> [sf_dir]
"""
import json, sys, re

log, out = sys.argv[1], sys.argv[2]
sf = sys.argv[3] if len(sys.argv) > 3 else "sfgen/sf100"
starts = []
fails = set()
for line in open(log, errors="replace"):
    m = re.match(r"\[bench\] (\d+) start (\S+)", line)
    if m:
        starts.append((int(m.group(1)) / 1000.0, m.group(2)))
    m = re.match(r"\[bench\] (\S+) FAILED:", line)
    if m:
        fails.add(m.group(1))
qs = {}
dups = set()
for (t0, n), (t1, _) in zip(starts, starts[1:]):
    if n in qs:
        # a chunk re-run after a crash-recovered session starts the same
        # query twice: sum the gaps (both attempts burned wall clock) and
        # flag the name so the record says which numbers are multi-attempt
        dups.add(n)
        qs[n] = round(qs[n] + (t1 - t0), 3)
    else:
        qs[n] = round(t1 - t0, 3)
note = (
    "recovered from trace start lines; per-query wall = gap to next "
    "start (includes between-query overhead); last in-flight query "
    "excluded; session chunk teardown+startup overhead lands in the "
    "LAST query of the previous family (the gap runs to the next "
    "family's first start)"
)
if dups:
    note += "; multi-attempt (gaps summed): " + ",".join(sorted(dups))
rec = {
    "metric": "total", "value": round(sum(qs.values()), 3), "unit": "sec",
    "n_queries": len(qs), "partial": True,
    "note": note,
    "errors": sorted(fails),
    "queries": dict(sorted(qs.items(), key=lambda kv: -kv[1])),
    "sf": sf,
}
json.dump(rec, open(out, "w"), indent=1)
print(f"{len(qs)} queries, total {rec['value']}s, errors {sorted(fails)}")
