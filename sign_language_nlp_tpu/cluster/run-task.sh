#!/usr/bin/env bash
# Run one experiment on the local host (single TPU slice or CPU).
# Usage: run-task.sh <config-name> [extra flags...]
# Reference analogue: cluster/run-task.sh (module loads + singularity
# exec are unnecessary here — the program is self-contained).
set -euo pipefail

CONFIG=${1:?usage: run-task.sh <config-name> [flags...]}
shift || true
REPO_DIR=$(cd "$(dirname "$0")/../.." && pwd)

cd "$REPO_DIR"
exec python -m sign_language_nlp_tpu.main \
  --config "configs/${CONFIG}.yaml" "$@"
