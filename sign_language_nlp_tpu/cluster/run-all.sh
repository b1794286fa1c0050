#!/usr/bin/env bash
# Submit all experiments (reference cluster/run-all.sh: wipes cached
# working files, then launches every task).
set -euo pipefail
HERE=$(cd "$(dirname "$0")" && pwd)

# Clear transient dataset caches (reference run-all.sh:6-8):
rm -f "${TMPDIR:-/tmp}"/*.dataset.tmp || true

for task in "$HERE"/tasks/*.task; do
  # shellcheck disable=SC1090
  source "$task"
  echo "Launching: $TASK_CONFIG"
  "$HERE/run-task.sh" "$TASK_CONFIG" ${TASK_FLAGS:-} \
    > "run-${TASK_CONFIG}.log" 2>&1 &
  echo "  pid $!"
done
wait
