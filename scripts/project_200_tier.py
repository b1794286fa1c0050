"""Project the 200/30 emb128-tier wall from measured grid data and
recommend a scope (VERDICT r4 weak #5 / next-round #2: size the stage
BEFORE the campaign fires it unattended; re-scope via R5_200_CV if it
exceeds the tunnel budget).

Inputs: the round-5 transformer grid manifest (same corpus, same
emb128 shapes, 40-epoch budget) — per-cell `fit_time` and `epochs`
give measured s/epoch per emb128 shape group on the actual device.
Model: the CPU dress rehearsal (scripts/probe_compaction_200.py,
BASELINE.md round-4 row) showed rel-threshold early stopping lets
~5/6 cells run the FULL 200 epochs, so the projection multiplies
measured s/epoch by 200 (minus a small credit for the ~1/6 stopping
near epoch 95, offset by exact compaction shedding their slots).

Run:  python scripts/project_200_tier.py [--budget-h 6]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="work/full-grid-transformer",
                    help="a finished/partial 40-epoch grid over the "
                         "same corpus to measure s/epoch from")
    ap.add_argument("--budget-h", type=float, default=6.0,
                    help="tunnel budget for the stage, hours")
    args = ap.parse_args()

    from scripts.run_full_grid import FAMILIES
    from sign_language_nlp_tpu.search.grid import build_param_grid
    from sign_language_nlp_tpu.utils import get_hash

    _, grid_model_args, _ = FAMILIES["transformer"]
    grid = build_param_grid({"lr": [0.1, 0.01, 0.001],
                             "model_args": dict(grid_model_args)})
    by_hash = {get_hash(c): c for c in grid.candidates()}

    mpath = Path(args.workdir, "grid_search_manifest.json")
    if not mpath.exists():
        print(json.dumps({"error": f"no manifest at {mpath}"}))
        return
    manifest = json.loads(mpath.read_text())

    fit_s = epochs = cells = 0
    for key, rec in manifest.items():
        if key == "__globals__":
            continue
        c = by_hash.get(key.rsplit(":", 1)[0])
        if c is None or c["module__embedding_size"] != 128:
            continue
        fit_s += float(rec.get("fit_time", 0.0))
        epochs += int(rec.get("epochs", 0))
        cells += 1
    if not epochs:
        print(json.dumps({"error": "no emb128 cells in manifest yet"}))
        return

    s_per_epoch = fit_s / epochs
    # 540 fits (108 candidates x 5 folds); rehearsal says ~5/6 run all
    # 200 epochs, ~1/6 stop near epoch 95: expected epochs/cell ~= 182.
    exp_epochs_per_cell = (5 * 200 + 95) / 6
    for cv in (5, 3, 2):
        n_cells = 108 * cv
        proj_s = n_cells * exp_epochs_per_cell * s_per_epoch
        fits = proj_s <= args.budget_h * 3600
        print(json.dumps({
            "cv": cv, "cells": n_cells,
            "measured_s_per_epoch_emb128": round(s_per_epoch, 4),
            "measured_from_cells": cells,
            "projected_wall_h": round(proj_s / 3600, 2),
            "fits_budget": fits, "budget_h": args.budget_h}))


if __name__ == "__main__":
    main()
