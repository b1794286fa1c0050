#!/usr/bin/env bash
# Tail every experiment log (reference tail-all.sh).
exec tail -f run-*.log
