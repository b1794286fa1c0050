#!/usr/bin/env bash
# Launch one experiment across every worker of a TPU pod slice.
# Each worker runs the SAME program; JAX's multi-process runtime wires
# them up (coordinator = worker 0), and each takes a strided share of
# the grid cells. Replaces the reference's scheduler+workers+code-upload
# dance (az-start-scheduler.sh / az-start-workers.sh /
# az-run-task-dist.sh).
#
# The workdir MUST resolve to shared storage (NFS / gcsfuse mount)
# visible to every worker: manifest shards and the final artifacts merge
# through it. Override with `--workdir <shared-path>` in extra flags.
#
# Usage: launch-pod.sh <tpu-name> <zone> <config-name> [extra flags...]
set -euo pipefail

TPU_NAME=${1:?usage: launch-pod.sh <tpu-name> <zone> <config> [flags...]}
ZONE=${2:?zone required}
CONFIG=${3:?config required}
shift 3 || true

NUM_WORKERS=$(gcloud compute tpus tpu-vm describe "$TPU_NAME" \
  --zone "$ZONE" --format 'value(networkEndpoints.length())')
COORD_HOST=$(gcloud compute tpus tpu-vm describe "$TPU_NAME" \
  --zone "$ZONE" \
  --format 'value(networkEndpoints[0].ipAddress)'):8476

echo "Launching '$CONFIG' on $TPU_NAME ($NUM_WORKERS workers), " \
     "coordinator $COORD_HOST"

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/sign_language_nlp_tpu && nohup python -m \
sign_language_nlp_tpu.main --config configs/${CONFIG}.yaml \
--workdir ./work/${CONFIG}-pod \
--dask_args \"{'coordinator': '${COORD_HOST}', \
'num_processes': ${NUM_WORKERS}, \
'process_id': \$(hostname | grep -o '[0-9]*\$')}\" $* \
> ~/run-${CONFIG}.log 2>&1 &"
