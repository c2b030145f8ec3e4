#!/bin/bash
# Mechanical round close-out (VERDICT r17 item 2 — six rounds of
# modified-uncommitted bench/leak artifacts at round end): stage every
# round artifact the driver or builder landed in the working tree and
# commit them with a standard message. Run as the LAST step of a round
# (or any time artifacts sit dirty). Usage: tools/closeout.sh [round#]
set -u
cd "$(dirname "$0")/.."
ROUND=${1:-}
PATTERNS=(BENCH_COLD.json BENCH_STEADY.json LEAKCHECK.json COPYCHECK.json
  PROGRESS.jsonl)
# round-stamped artifacts (driver sweeps + builder smokes), tracked or not
for f in BENCH_r*.json CORRECTNESS_r*.json LLMSMOKE_r*.json \
         SCALESMOKE_r*.json STREAMSMOKE_r*.json WARCSMOKE_r*.json \
         MPSMOKE_r*.json BCSMOKE_r*.json; do
  [ -e "$f" ] && PATTERNS+=("$f")
done
CHANGED=()
for f in "${PATTERNS[@]}"; do
  # porcelain is non-empty for unstaged, staged-but-uncommitted, AND
  # untracked states — git diff --quiet alone misses staged artifacts
  if [ -e "$f" ] && [ -n "$(git status --porcelain -- "$f" 2>/dev/null)" ]; then
    CHANGED+=("$f")
  fi
done
if [ ${#CHANGED[@]} -eq 0 ]; then
  echo "[closeout] no dirty round artifacts — clean"
  exit 0
fi
git add -- "${CHANGED[@]}"
MSG="Record round${ROUND:+ $ROUND} artifacts: ${CHANGED[*]}"
git commit -q -m "$MSG

No-Verification-Needed: artifact-only commit (bench/correctness/smoke
JSON records), no source change." && echo "[closeout] committed: ${CHANGED[*]}"
