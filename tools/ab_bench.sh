#!/bin/bash
# Detached-checkout A/B bench harness — the standard attribution method
# for round-over-round drift (PLANS.md r17 split/cc, r18 PQ/LOPQ and
# smoke-exponent controls): run the same query subset on two exact
# commits, each in its own detached worktree (the working tree's
# in-flight edits never contaminate a side), interleaved twice in one
# host session, loadavg logged per side. If HEAD-side numbers differ
# from the committed artifact but the two SIDES agree, it's host
# regime; if the sides differ consistently, it's code.
#
# Usage: tools/ab_bench.sh <shaA> <shaB> <query-regex> [sfDir] [reps]
# Results land in /tmp/ab_bench/<shaA>.json etc.
set -u
A=${1:?usage: ab_bench.sh <shaA> <shaB> <query-regex> [sfDir] [reps]}
B=${2:?}
REGEX=${3:?}
cd "$(dirname "$0")/.."
OUT=/tmp/ab_bench
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=${4:-/root/testdata/sf0.1}
export SPARK_GRAFT_ONLY="$REGEX"
export SPARK_GRAFT_REPS=${5:-3}
export SPARK_GRAFT_SKIP_PBF=1

run_side () {
  local name=$1 dir=$2
  echo "=== $name: loadavg before: $(cat /proc/loadavg)" >> "$OUT/log.txt"
  (cd "$dir" && sbt -batch "runMain graft.Bench") > "$OUT/$name.out" 2>&1
  echo "=== $name: loadavg after: $(cat /proc/loadavg)" >> "$OUT/log.txt"
  grep -o '{"metric".*' "$OUT/$name.out" | head -1 > "$OUT/$name.json"
}

for sha in "$A" "$B"; do
  if [ ! -d "/tmp/ab-$sha" ]; then
    git worktree add --detach "/tmp/ab-$sha" "$sha" >> "$OUT/log.txt" 2>&1
  fi
  (cd "/tmp/ab-$sha" && sbt -batch compile) >> "$OUT/log.txt" 2>&1
done

run_side "$A" "/tmp/ab-$A"
run_side "$B" "/tmp/ab-$B"
# second interleave separates host drift from code
run_side "${A}_2" "/tmp/ab-$A"
run_side "${B}_2" "/tmp/ab-$B"
echo DONE >> "$OUT/log.txt"
for f in "$OUT/$A.json" "$OUT/$B.json" "$OUT/${A}_2.json" "$OUT/${B}_2.json"; do
  echo "== $f"; cat "$f"
done
