#!/usr/bin/env bash
# Re-record the clean-interval yardstick floor (Bench.YardstickRefSec):
# N standalone JVMs (default 5), each taking 3 in-JVM probe samples on
# an otherwise idle machine; prints every JVM's samples and the global
# minimum — the candidate ref. This mechanizes the prose re-record
# procedure from BASELINE.md (r11 verdict finding #2): when a bench
# run prints `ref_stale: true` (a sample >3 % under the recorded ref),
# run this, paste the reported min into Bench.YardstickRefSec, and
# note the re-record in BASELINE.md.
#
# Usage: tools/record_yardstick.sh [n_jvms]   (SPARK_GRAFT_CPUS=32 default)
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-5}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
for i in $(seq 1 "$N"); do
  sbt -batch "runMain graft.Yardstick 3" 2>&1 \
    | grep '"samples"' | sed 's/^\[info\] //'
done | python3 -c '
import json, sys
mins = []
for line in sys.stdin:
    d = json.loads(line)
    mins.append(d["min"])
    print("jvm %d: samples=%s min=%s" % (len(mins), d["samples"], d["min"]))
if not mins:
    sys.exit("no samples captured — check the sbt output")
print(f"global min across {len(mins)} JVMs: {min(mins):.3f} s"
      "  -> candidate Bench.YardstickRefSec")
'
