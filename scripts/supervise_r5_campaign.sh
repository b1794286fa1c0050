#!/bin/bash
# JAX-free supervisor for the round-5 campaign. Interactive sessions
# monitoring the campaign have repeatedly died on gateway 529s, leaving
# nothing to relaunch a crashed stage (e.g. the axon INTERNAL wedge
# kills the grid process; a fresh process resumes cleanly from the
# content-addressed manifest). This loop NEVER touches JAX itself — it
# only inspects pidfiles and stage stamps — so it can run alongside any
# tunnel holder without violating the one-JAX-client rule (CLAUDE.md).
#
# Deference order (checked every poll):
#   1. /tmp/bench.pid alive      -> the round-end bench owns the tunnel;
#                                   it preempts + re-arms by itself.
#   2. /tmp/watchdog.pid alive   -> a probe/launch watchdog owns
#                                   relaunching (bench re-arms one too).
#   3. /tmp/r5_campaign.pid alive-> the campaign is running.
#   4. all stage stamps present  -> nothing left to do; exit.
#   5. otherwise                 -> arm the watchdog
#                                   (scripts/wait_tpu_and_run_grid.sh,
#                                   WATCHDOG_DELAY_S=120 so its first
#                                   probe never races a JAX client that
#                                   exited without clearing a pidfile).
# Logs: work/r5-supervisor.log.
# Test knobs (tests/test_bench_guard.py): SUP_ROOT fakes the repo root,
# SUP_PIDDIR fakes /tmp, SUP_POLLS/SUP_SLEEP shrink the loop, SUP_DRYRUN
# logs instead of launching the watchdog.
cd "${SUP_ROOT:-/root/repo}"
PIDDIR="${SUP_PIDDIR:-/tmp}"
LOG=work/r5-supervisor.log
STAMPS="compact-ab bucket-ab grid-transformer grid-gru grid-lstm grid-200-emb128"

alive() { [ -f "$1" ] && kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null; }

all_stamped() {
  for s in $STAMPS; do
    [ -f "work/r5-stamps/$s" ] || return 1
  done
  return 0
}

echo "[supervisor] start pid $$ $(date)" >> $LOG
# ~12h lifetime bound: 720 polls x 60s.
for i in $(seq 1 "${SUP_POLLS:-720}"); do
  if all_stamped; then
    echo "[supervisor] all stages stamped — exiting $(date)" >> $LOG
    exit 0
  fi
  if alive "$PIDDIR/bench.pid"; then
    : # bench owns the tunnel
  elif alive "$PIDDIR/watchdog.pid"; then
    : # watchdog owns relaunching
  elif alive "$PIDDIR/r5_campaign.pid"; then
    : # campaign running
  else
    echo "[supervisor] no bench/watchdog/campaign alive with stages unstamped — arming watchdog $(date)" >> $LOG
    if [ -n "$SUP_DRYRUN" ]; then
      echo "[supervisor] DRYRUN: would arm watchdog" >> $LOG
    else
      WATCHDOG_DELAY_S=120 nohup bash scripts/wait_tpu_and_run_grid.sh \
        >> work/full-grid-r5.log 2>&1 &
      echo $! > "$PIDDIR/watchdog.pid"
      echo "[supervisor] watchdog pid $(cat "$PIDDIR/watchdog.pid")" >> $LOG
    fi
    sleep "${SUP_SLEEP:-240}"
  fi
  sleep "${SUP_SLEEP:-60}"
done
echo "[supervisor] lifetime bound reached $(date)" >> $LOG
