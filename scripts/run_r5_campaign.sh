#!/bin/bash
# Round-5 device campaign, in VERDICT r4 priority order, adjusted for
# the fresh round-5 container: work/ (manifests, corpora, compile
# cache) did NOT survive the round boundary, so every grid restarts
# from zero — which frees the transformer stage to run directly on the
# HARD corpus (VERDICT #1's "non-saturating test metrics" done
# criterion + weak #3 in one run, and S=48 is ~2.5x cheaper per epoch
# than lowdiv's S=120). Each stage is resumable (grid stages by
# content-addressed manifest) and records a stamp on success so a
# watchdog relaunch skips finished stages. ONE JAX process at a time
# (CLAUDE.md): stages run strictly sequentially.
# Logs: work/r5-campaign.log (driver) + per-stage .out/.log files.
cd /root/repo
mkdir -p work/r5-stamps
LOG=work/r5-campaign.log

# Preempt tunnel-down CPU fallback A/Bs by exact pid-file pid (never
# by pattern): a CPU hog under a TPU grid costs ~20x between-chunk
# host overhead on this one-core host.
for pf in /tmp/compab_cpu.pid /tmp/bucket_ab_cpu.pid; do
  if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
    echo "[campaign] preempting CPU fallback job pid $(cat "$pf") ($pf)" >> $LOG
    kill "$(cat "$pf")" 2>/dev/null
    rm -f "$pf"
  fi
done

run_stage() {
  local name="$1"; shift
  if [ -f "work/r5-stamps/$name" ]; then
    echo "[campaign] skip $name (stamped)" >> $LOG
    return 0
  fi
  echo "[campaign] start $name $(date)" >> $LOG
  echo "=== attempt $(date) ===" >> "work/r5-$name.out"
  echo "=== attempt $(date) ===" >> "work/r5-$name.log"
  "$@" >> "work/r5-$name.out" 2>> "work/r5-$name.log"
  local rc=$?
  echo "[campaign] end $name rc=$rc $(date)" >> $LOG
  if [ $rc -eq 0 ]; then
    touch "work/r5-stamps/$name"
  fi
  return $rc
}

# Refresh GRID_r05.json from whatever manifests exist — called after
# every stage so evidence lands even if a later stage (or the round)
# dies mid-campaign. Same job list as bench.py's round-end snapshot.
snapshot_grid() {
  python scripts/snapshot_grid_progress.py >> $LOG 2>&1
}

# 1. Short measured A/Bs first (VERDICT #4: the round must not close
#    without TPU numbers; these fit any ~30-min tunnel window). The
#    compaction A/B may already have been run manually this round —
#    its stamp is then pre-seeded by the operator.
run_stage compact-ab python scripts/run_compaction_ab.py
run_stage bucket-ab python scripts/run_bucket_ab.py

# 2. The FULL 1,620-fit transformer grid on the hard corpus, with
#    full-scope refit + test (VERDICT #1 + weak #3).
run_stage grid-transformer python scripts/run_full_grid.py \
  --corpus work/synth-corpus-hard || exit 1
snapshot_grid

# 3. The RNN grids at scale on the hard corpus (VERDICT #3).
run_stage grid-gru python scripts/run_full_grid.py \
  --family gru --corpus work/synth-corpus-hard || exit 1
snapshot_grid
run_stage grid-lstm python scripts/run_full_grid.py \
  --family lstm --corpus work/synth-corpus-hard || exit 1
snapshot_grid

# 4. One tier at the reference's TRUE budget: emb128, 200/30, exact
#    compaction, hard corpus (VERDICT #2). Sized per weak #5: the CPU
#    rehearsal showed rel-threshold ES lets cells run to the full 200
#    epochs, so the wall is ~5x the 40-epoch tier's; the stage runs
#    LAST so a round-end bench preempt costs only this stage's tail —
#    the manifest preserves every finished cell either way. The
#    projection (from stage 2's measured emb128 s/epoch) is recorded
#    in BASELINE.md before this fires; R5_200_CV re-scopes folds.
run_stage grid-200-emb128 python scripts/run_full_grid.py \
  --emb-subset 128 --max-epochs 200 --patience 30 \
  --compact-granularity 1 ${R5_200_CV:+--cv $R5_200_CV} \
  --workdir work/full-grid-200-emb128 --corpus work/synth-corpus-hard \
  || exit 1
snapshot_grid

echo "[campaign] ALL STAGES DONE $(date)" >> $LOG
