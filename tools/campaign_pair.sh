#!/bin/bash
# One or more same-window ScalingBench levels on HEAD, appended to the
# round log in the established [bench]/[scaling]-lines-only format.
set -e
cd /root/repo
LOG=BENCH/round5-runs.log
S=${1:?stage label}
shift
for c in "$@"; do
  echo "=== $S: local[$c] $(date +%H:%M:%S) sha=$(git rev-parse --short HEAD) ===" >> "$LOG"
  tools/scaling_run.sh $c 24000000 2>&1 | grep -E '^\[(bench|scaling)\]' >> "$LOG"
done
