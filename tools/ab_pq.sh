#!/bin/bash
# A/B attribution for the residual-PQ/LOPQ steady-bench drift (VERDICT r17
# item 1): run the four q_s_(ivfpq_resid|lopq)* queries at sf0.1, reps=3
# (min), on the exact r17 commit (a79f593) and the exact r16 commit
# (ef88b15), both as detached worktrees (so the working tree's in-flight
# edits never contaminate a side), interleaved twice back-to-back in the
# same host session, loadavg recorded before/after each side.
set -u
cd /root/repo
OUT=/tmp/ab_pq
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_ONLY='q_s_(ivfpq_resid|lopq)'
export SPARK_GRAFT_REPS=3
export SPARK_GRAFT_SKIP_PBF=1

run_side () {
  local name=$1 dir=$2
  echo "=== $name: loadavg before: $(cat /proc/loadavg)" >> "$OUT/log.txt"
  (cd "$dir" && sbt -batch "runMain graft.Bench") > "$OUT/$name.out" 2>&1
  echo "=== $name: loadavg after: $(cat /proc/loadavg)" >> "$OUT/log.txt"
  grep -o '{"metric".*' "$OUT/$name.out" | head -1 > "$OUT/$name.json"
}

for side in r17:a79f593 r16:ef88b15; do
  name=${side%%:*}; sha=${side##*:}
  if [ ! -d "/tmp/ab-$name" ]; then
    git worktree add --detach "/tmp/ab-$name" "$sha" >> "$OUT/log.txt" 2>&1
  fi
  (cd "/tmp/ab-$name" && sbt -batch compile) >> "$OUT/log.txt" 2>&1
done

run_side r17 /tmp/ab-r17
run_side r16 /tmp/ab-r16
# second interleave to separate host drift from code
run_side r17b /tmp/ab-r17
run_side r16b /tmp/ab-r16
echo DONE >> "$OUT/log.txt"
