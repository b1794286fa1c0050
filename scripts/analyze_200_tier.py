"""Analyze the 200/30 emb128 tier against the 40/10 tier (VERDICT r4
next-round #2 done criterion): epochs-to-stop histogram, compaction
engagement count (from the stage log), and best-candidate comparison
vs the 40-epoch grid over the same corpus.

Run:  python scripts/analyze_200_tier.py
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _best_candidate(workdir: str, emb: int | None = 128):
    """(best mean score, candidate dict) over manifest cells, restricted
    to one embedding tier so the comparison is apples-to-apples."""
    from scripts.run_full_grid import FAMILIES
    from sign_language_nlp_tpu.search.grid import build_param_grid
    from sign_language_nlp_tpu.utils import get_hash

    _, gma, _ = FAMILIES["transformer"]
    grid = build_param_grid({"lr": [0.1, 0.01, 0.001],
                             "model_args": dict(gma)})
    by_hash = {get_hash(c): c for c in grid.candidates()}
    mpath = Path(workdir, "grid_search_manifest.json")
    if not mpath.exists():
        return None, None, {}
    manifest = json.loads(mpath.read_text())
    per_cand: dict = {}
    epochs_hist: Counter = Counter()
    for key, rec in manifest.items():
        if key == "__globals__":
            continue
        h = key.rsplit(":", 1)[0]
        c = by_hash.get(h)
        if c is None or (emb is not None
                         and c["module__embedding_size"] != emb):
            continue
        per_cand.setdefault(h, []).append(float(rec["score"]))
        epochs_hist[int(rec.get("epochs", 0))] += 1
    if not per_cand:
        return None, None, {}
    means = {h: sum(v) / len(v) for h, v in per_cand.items()}
    best = max(means, key=means.get)
    return round(means[best], 4), by_hash[best], epochs_hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir-200", default="work/full-grid-200-emb128")
    ap.add_argument("--workdir-40", default="work/full-grid-transformer")
    ap.add_argument("--log-200", default="work/r5-grid-200-emb128.log")
    args = ap.parse_args()

    s200, c200, hist = _best_candidate(args.workdir_200)
    s40, c40, _ = _best_candidate(args.workdir_40)

    # Epochs-to-stop histogram, bucketed by 20:
    hb: Counter = Counter()
    for e, n in hist.items():
        hb[20 * (e // 20)] += n
    full_budget = sum(n for e, n in hist.items() if e >= 200)

    # Compaction engagements from the stage log:
    compactions = 0
    lp = Path(args.log_200)
    if lp.exists():
        compactions = len(re.findall(r"population compacted to",
                                     lp.read_text()))

    def cand_str(c):
        if not c:
            return None
        return {k.replace("module__", ""): v for k, v in c.items()}

    print(json.dumps({
        "tier_200": {"best_mean_score": s200,
                     "best_candidate": cand_str(c200),
                     "cells": sum(hist.values()),
                     "epochs_to_stop_hist_by20":
                         {str(k): v for k, v in sorted(hb.items())},
                     "cells_at_full_budget": full_budget,
                     "compaction_engagements": compactions},
        "tier_40_same_corpus": {"best_mean_score": s40,
                                "best_candidate": cand_str(c40)},
        "same_selection": (cand_str(c200) == cand_str(c40)
                           if c200 and c40 else None)}, indent=1))


if __name__ == "__main__":
    main()
