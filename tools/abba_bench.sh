#!/usr/bin/env bash
# Same-sitting ABBA bench adjudication — the mechanized form of the
# escalation rule ("stop attributing to the machine"): run the FULL
# Bench (cold + timed passes + isolated block, each leg self-bracketed
# by its own yardstick phases) against a reference commit and HEAD in
# A B B A order, then compare per-query best-of-arm totals over the
# whole surface. This is the instrument that separates a real plan
# regression from a host whose floor moved between sittings: raw
# seconds do NOT transfer across days even at equal interval-index
# readings (measured r14: byte-identical r13 code read 134.5 s on the
# r13 day at band [1.13, 1.26] and 151-160 s on the r14 day at
# [1.02, 1.18] — the CPU-bound yardstick probe is blind to whatever
# slowed the bulk workload ~15%), so cross-day raw-second bars are
# adjudicated HERE, on matched brackets, never by division.
#
# Usage: tools/abba_bench.sh <ref-commit> [workdir=/tmp/graft_abba]
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${1:?usage: abba_bench.sh <ref-commit> [workdir]}"
WORK="${2:-/tmp/graft_abba}"
REPO="$(pwd)"

if [ ! -d "$WORK/.git" ]; then
  git clone -q "$REPO" "$WORK"
fi
git -C "$WORK" fetch -q origin 2>/dev/null || true
git -C "$WORK" checkout -q "$REF"
(cd "$WORK" && sbt -batch compile >/dev/null)

OPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run_leg() { # tag dir
  echo "=== leg $1 ($2) start $(date -u +%H:%M:%S) ==="
  (cd "$2" && SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPTS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
    graft.Bench > "/tmp/abba_$1.log" 2>&1)
}
run_leg A1 "$WORK"
run_leg B1 "$REPO"
run_leg B2 "$REPO"
run_leg A2 "$WORK"

python3 - <<'EOF'
import json, collections
def parse(tag):
    lines=[l for l in open(f'/tmp/abba_{tag}.log')
           if '"metric":"total"' in l and l.startswith('{"queries"')]
    return json.loads(lines[0])
legs={t:parse(t) for t in ('A1','B1','B2','A2')}
for t,j in legs.items():
    print(t, 'warm', round(j['value'],1), 'passes', j['passes'],
          'pass band', j['interval_phases']['pass'],
          'iso band', j['interval_phases']['isolated'])
def best(j):
    q=dict(j['queries'])
    for k,v in j['isolated'].items(): q[k]=min(q.get(k,v), v)
    return q
A=collections.defaultdict(lambda:1e9); B=collections.defaultdict(lambda:1e9)
for t in ('A1','A2'):
    for k,v in best(legs[t]).items(): A[k]=min(A[k],v)
for t in ('B1','B2'):
    for k,v in best(legs[t]).items(): B[k]=min(B[k],v)
common=set(A)&set(B)
sa=sum(A[k] for k in common); sb=sum(B[k] for k in common)
print(f'\ncommon {len(common)}  A(ref) {sa:.1f}s  B(HEAD) {sb:.1f}s  B/A {sb/sa:.3f}')
deltas=sorted(((B[k]-A[k], A[k], B[k], k) for k in common), reverse=True)
print('top +deltas (HEAD slower):')
for d,a,b,k in deltas[:10]: print(f'  {k:34s} A {a:5.2f} -> B {b:5.2f}  (+{d:4.2f})')
print('top -deltas (HEAD faster):')
for d,a,b,k in deltas[-10:]: print(f'  {k:34s} A {a:5.2f} -> B {b:5.2f}  ({d:5.2f})')
only=sorted((set(A)^set(B)))
if only: print('not in both arms:', only)
EOF
