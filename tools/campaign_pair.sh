#!/bin/bash
# One or more same-window ScalingBench levels on HEAD, appended to the
# round log in the established [bench]/[scaling]-lines-only format.
# pipefail: without it a crashed ScalingBench whose partial output still
# matched the grep would be recorded as a clean protocol run, silently
# polluting the SHA-keyed scaling record.
set -eo pipefail
cd /root/repo
LOG=BENCH/round5-runs.log
S=${1:?stage label}
shift
for c in "$@"; do
  echo "=== $S: local[$c] $(date +%H:%M:%S) sha=$(git rev-parse --short HEAD) ===" >> "$LOG"
  # `|| true` on grep alone: zero matching lines must not abort the stage
  # (pipefail still fails the pipeline when the BENCH RUN itself dies)
  tools/scaling_run.sh $c 24000000 2>&1 | { grep -E '^\[(bench|scaling)\]' || true; } >> "$LOG"
done
