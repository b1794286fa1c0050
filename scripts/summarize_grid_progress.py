"""Summarize a (possibly partial) full-grid run from its manifest.

The manifest keys are content-addressed (hash(candidate):fold), so this
recomputes the reference grid's candidate hashes and joins: per-shape-
group fit counts, epochs, total attributed fit seconds, and score
ranges — the per-shape-group breakdown VERDICT r2 #1 asks for, available
even mid-run or after a preemption. `--family lstm|gru` summarizes the
reference's RNN workloads (VERDICT r3 #3; 162 candidates × 5 folds,
27 shape groups — no num_heads axis).

Run: python scripts/summarize_grid_progress.py [--workdir ...]
     python scripts/summarize_grid_progress.py --family gru
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from scripts.run_full_grid import FAMILIES

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="transformer",
                    choices=sorted(FAMILIES))
    ap.add_argument("--workdir", default=None,
                    help="default: the family's fixed workdir")
    ap.add_argument("--cv", type=int, default=5,
                    help="folds per candidate (the 200/30 tier may be "
                         "re-scoped to fewer — VERDICT r4 weak #5)")
    ap.add_argument("--emb-subset", default=None,
                    help="comma list of embedding sizes the run was "
                         "restricted to (mirrors run_full_grid.py) — "
                         "totals then reflect the restricted scope")
    args = ap.parse_args()
    _, grid_model_args, default_workdir = FAMILIES[args.family]
    if args.workdir is None:
        args.workdir = default_workdir

    from sign_language_nlp_tpu.search.grid import build_param_grid
    from sign_language_nlp_tpu.utils import get_hash

    grid_model_args = dict(grid_model_args)
    if args.emb_subset:
        grid_model_args["embedding_size"] = [
            int(x) for x in args.emb_subset.split(",")]
    grid = build_param_grid({
        "lr": [0.1, 0.01, 0.001],
        "model_args": grid_model_args,
    })
    candidates = list(grid.candidates())
    by_hash = {get_hash(c): c for c in candidates}
    has_heads = "num_heads" in grid_model_args
    n_shape_axes = len(grid_model_args["embedding_size"]) * \
        len(grid_model_args["hidden_size"]) * \
        len(grid_model_args["num_layers"])
    n_groups_total = n_shape_axes * (
        len(grid_model_args["num_heads"]) if has_heads else 1)

    # A missing manifest is a stage that has not started: emit a
    # zero-progress summary (so GRID_r0N.json shows the planned scope)
    # instead of crashing the campaign's snapshot step.
    manifest_path = Path(args.workdir, "grid_search_manifest.json")
    manifest = (json.loads(manifest_path.read_text())
                if manifest_path.exists() else {})
    groups: dict = {}
    for key, rec in manifest.items():
        if key == "__globals__":  # reserved trajectory-globals record
            continue
        h, _fold = key.rsplit(":", 1)
        c = by_hash.get(h)
        if c is None:
            continue
        gk = (c["module__embedding_size"], c["module__hidden_size"],
              c["module__num_layers"],
              c["module__num_heads"] if has_heads else None)
        g = groups.setdefault(gk, {"fits": 0, "fit_s": 0.0,
                                   "epochs": 0, "best": -1e30})
        g["fits"] += 1
        g["fit_s"] += float(rec.get("fit_time", 0.0))
        g["epochs"] += int(rec.get("epochs", 0))
        g["best"] = max(g["best"], float(rec["score"]))

    # Fits per complete group: in-group candidates (lr x dropout [x
    # heads' sibling axes] sharing the shape) x 5 folds.
    per_group_fits = len(candidates) * args.cv // n_groups_total
    rows = sorted(
        ({"emb": k[0], "ffn": k[1], "layers": k[2],
          **({"heads": k[3]} if has_heads else {}),
          "fits": v["fits"], "fit_s": round(v["fit_s"], 1),
          "epochs": v["epochs"], "best_score": round(v["best"], 4)}
         for k, v in groups.items()),
        key=lambda r: -r["fit_s"])
    total = {"family": args.family,
             "cells_done": sum(g["fits"] for g in groups.values()),
             "cells_total": len(candidates) * args.cv,
             "groups_started": len(groups),
             "groups_total": n_groups_total,
             "groups_complete": sum(1 for g in groups.values()
                                    if g["fits"] == per_group_fits),
             "fit_s_total": round(sum(g["fit_s"]
                                      for g in groups.values()), 1),
             "epochs_total": sum(g["epochs"] for g in groups.values())}
    print(json.dumps({"total": total, "per_group": rows}, indent=1))


if __name__ == "__main__":
    main()
