#!/usr/bin/env bash
# Show running experiments + mesh/devices (reference status-cluster.sh).
set -euo pipefail
echo "== local experiment processes =="
pgrep -af "sign_language_nlp_tpu.main" || echo "(none)"
echo "== devices =="
python - <<'PY'
import jax
for d in jax.devices():
    print(" ", d)
PY
