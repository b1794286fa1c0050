#!/bin/bash
# Round-4 device campaign, in VERDICT priority order. Each stage is
# resumable (grid stages by manifest) and records a stamp on success so
# a watchdog relaunch skips finished stages. ONE JAX process at a time
# (CLAUDE.md): stages run strictly sequentially.
# Logs: work/r4-campaign.log (driver) + per-stage .out/.log files.
cd /root/repo
mkdir -p work/r4-stamps
LOG=work/r4-campaign.log

# Tunnel-down CPU fallback A/Bs (run_compaction_ab / run_bucket_ab on
# the CPU platform) load the single host core; a concurrent TPU grid
# pays ~20x between-chunk host overhead (round-3 measured 3.2 s ->
# ~60 s/chunk with a CPU hog), and contention ruins the A/B's wall
# measurements anyway — the TPU arms below supersede them. Preempt by
# EXACT pid-file pid only (never by pattern; CLAUDE.md).
for pf in /tmp/compab_cpu.pid /tmp/bucket_ab_cpu.pid; do
  if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
    echo "[campaign] preempting CPU fallback job pid $(cat "$pf") ($pf)" >> $LOG
    kill "$(cat "$pf")" 2>/dev/null
    rm -f "$pf"
  fi
done

run_stage() {
  local name="$1"; shift
  if [ -f "work/r4-stamps/$name" ]; then
    echo "[campaign] skip $name (stamped)" >> $LOG
    return 0
  fi
  echo "[campaign] start $name $(date)" >> $LOG
  # Append + attempt header: a watchdog relaunch must never wipe the
  # failed attempt's logs (they are the INTERNAL-failure evidence).
  echo "=== attempt $(date) ===" >> "work/r4-$name.out"
  echo "=== attempt $(date) ===" >> "work/r4-$name.log"
  "$@" >> "work/r4-$name.out" 2>> "work/r4-$name.log"
  local rc=$?
  echo "[campaign] end $name rc=$rc $(date)" >> $LOG
  if [ $rc -eq 0 ]; then
    touch "work/r4-stamps/$name"
  fi
  return $rc
}

# Refresh GRID_r04.json from whatever manifests exist — called after
# every stage so evidence lands even if a later stage (or the round)
# dies mid-campaign.
snapshot_grid() {
  python - <<'PYEOF' 2>> $LOG
import json, subprocess, sys
out = {}
for fam in ("transformer", "lstm", "gru"):
    try:
        r = subprocess.run(
            [sys.executable, "scripts/summarize_grid_progress.py",
             "--family", fam], capture_output=True, text=True, timeout=300)
        if r.returncode == 0:
            out[fam] = json.loads(r.stdout)
    except Exception:
        pass
# Extra transformer workdirs (200/30 tier; hard-corpus full grid).
# The emb128 tier passes its --emb-subset so totals reflect the
# restricted 540-fit / 18-group scope, not the full 1,620-fit grid.
for name, wd, extra in (
        ("transformer_200_emb128", "work/full-grid-200-emb128",
         ["--emb-subset", "128"]),
        ("transformer_hard", "work/full-grid-transformer-hard", [])):
    try:
        r = subprocess.run(
            [sys.executable, "scripts/summarize_grid_progress.py",
             "--workdir", wd] + extra,
            capture_output=True, text=True, timeout=300)
        if r.returncode == 0:
            out[name] = json.loads(r.stdout)
    except Exception:
        pass
if out:
    open("GRID_r04.json", "w").write(json.dumps(out, indent=1))
PYEOF
}

# 1. Finish the transformer grid (manifest resume -> 1,620/1,620) and
#    its full-scope refit+test (VERDICT #1).
run_stage grid-transformer python scripts/run_full_grid.py || exit 1
snapshot_grid

# 2. Short measured A/Bs while the tunnel is warm: exact-bucket
#    compaction (VERDICT #6) and auto N-bucket planning (VERDICT #7).
run_stage compact-ab python scripts/run_compaction_ab.py
run_stage bucket-ab python scripts/run_bucket_ab.py

# 3. One tier at the reference's TRUE budget: emb128, 200/30,
#    compaction on, hard corpus (VERDICT #2 + weak #2).
run_stage grid-200-emb128 python scripts/run_full_grid.py \
  --emb-subset 128 --max-epochs 200 --patience 30 \
  --compact-granularity 1 \
  --workdir work/full-grid-200-emb128 --corpus work/synth-corpus-hard \
  || exit 1
snapshot_grid

# 4. The RNN grids at scale on the hard corpus (VERDICT #3).
run_stage grid-gru python scripts/run_full_grid.py \
  --family gru --corpus work/synth-corpus-hard || exit 1
snapshot_grid
run_stage grid-lstm python scripts/run_full_grid.py \
  --family lstm --corpus work/synth-corpus-hard || exit 1
snapshot_grid

# 5. Stretch: the FULL 1,620-fit transformer grid on the hard corpus
#    (S=48 — ~2.5x cheaper per epoch than lowdiv's S=120), so the
#    full-scope refit+test carries non-trivial metrics (VERDICT r3
#    weak #2's ideal closure, beyond the lowdiv completion of stage 1).
run_stage grid-transformer-hard python scripts/run_full_grid.py \
  --workdir work/full-grid-transformer-hard \
  --corpus work/synth-corpus-hard || exit 1
snapshot_grid

echo "[campaign] ALL STAGES DONE $(date)" >> $LOG
