#!/usr/bin/env bash
# Stop every running experiment (reference cancel-all.sh). Completed
# (candidate x fold) cells stay in the workdir manifest, so a re-launch
# resumes instead of restarting.
pkill -f "sign_language_nlp_tpu.main" && echo "cancelled" || echo "(none running)"
