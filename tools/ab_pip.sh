#!/bin/bash
# A/B attribution for the pip containment-join SCALESMOKE drift
# (VERDICT r18 item 1): SCALESMOKE_r18 read pip_sec_hi 18.9 s vs 6.2 s
# in r17 at IDENTICAL pair counts (exponent 1.647 vs 0.825) with
# Geo.containsJoin untouched since r15 — the one number whose
# host-regime explanation exceeded its own stated noise bound.
#
# Method (same as tools/ab_pq.sh, the r18-accepted protocol): detached
# worktrees at the exact r17 commit (a79f593) and HEAD, the standalone
# PipProbe main (graft.tools.PipProbe — identical fixture to
# ScaleSmoke.pip, min-of-3 interleaved lo/hi) copied into the r17 side
# (it post-dates a79f593; it only CALLS that commit's Geo.containsJoin,
# so the code under test is the checkout's), both sides interleaved
# twice in one host session, loadavg logged inside each probe run.
#
# Usage: tools/ab_pip.sh [headSha]   (results in /tmp/ab_pip/)
set -u
cd "$(dirname "$0")/.."
HEADSHA=${1:-$(git rev-parse HEAD)}
R17=a79f593
OUT=/tmp/ab_pip
mkdir -p "$OUT"
: > "$OUT/log.txt"

for side in r17:$R17 head:$HEADSHA; do
  name=${side%%:*}; sha=${side##*:}
  if [ ! -d "/tmp/abpip-$name" ]; then
    git worktree add --detach "/tmp/abpip-$name" "$sha" >> "$OUT/log.txt" 2>&1
  fi
  # the probe main post-dates r17 — inject it (it only calls the
  # checkout's Geo.containsJoin; the measured code is the commit's)
  cp src/main/scala/graft/tools/PipProbe.scala \
     "/tmp/abpip-$name/src/main/scala/graft/tools/PipProbe.scala"
  (cd "/tmp/abpip-$name" && sbt -batch compile) >> "$OUT/log.txt" 2>&1
done

run_side () {
  local name=$1 dir=$2
  echo "=== $name: loadavg before: $(cat /proc/loadavg)" >> "$OUT/log.txt"
  (cd "$dir" && sbt -batch "runMain graft.tools.PipProbe 2 3") \
    > "$OUT/$name.out" 2>&1
  echo "=== $name: loadavg after: $(cat /proc/loadavg)" >> "$OUT/log.txt"
  grep -o '{"metric":"pip_probe".*' "$OUT/$name.out" | head -1 > "$OUT/$name.json"
}

run_side r17 /tmp/abpip-r17
run_side head /tmp/abpip-head
# second interleave separates host drift from code
run_side r17b /tmp/abpip-r17
run_side headb /tmp/abpip-head
echo DONE >> "$OUT/log.txt"
for f in r17 head r17b headb; do
  echo "== $f"; cat "$OUT/$f.json"
done
