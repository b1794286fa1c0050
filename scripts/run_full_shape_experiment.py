"""Full-workload-shape experiment: a reference-sized synthetic corpus
through the complete pipeline on the real device.

Generates (once) a ~2,000-sample / 100-class ASL-Phono-shaped corpus,
then runs the CLI pipeline with a small-but-real grid. Reports
wall-clock per phase and final test metrics; appends a row to
BASELINE.md by hand afterwards.

Usage: python scripts/run_full_shape_experiment.py [--grid small|medium]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = Path("work/synth-corpus")

GRIDS = {
    # 4 candidates × 5 folds = 20 fits, one shape group:
    "small": {"lr": [0.1, 0.03], "model_args": {"dropout": [0.1, 0.5]}},
    # 8 candidates incl. 2 shape groups:
    "medium": {"lr": [0.1, 0.03], "model_args": {
        "dropout": [0.1, 0.5], "embedding_size": [128, 64]}},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="small", choices=list(GRIDS))
    ap.add_argument("--model", default="model.Transformer")
    ap.add_argument("--max-epochs", type=int, default=30)
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--compat", default="{}",
                    help='compat_args JSON, e.g. \'{"tgt_input": "bos"}\' '
                         "for the non-leak decoder input path")
    ap.add_argument("--train-args", default="{}",
                    help='train_args JSON, e.g. '
                         '\'{"length_bucketing": true}\'')
    ap.add_argument("--max-population", type=int, default=32)
    ap.add_argument("--corpus", default=str(CORPUS),
                    help="corpus directory (e.g. work/synth-corpus-"
                         "longtail for ragged-length runs)")
    args = ap.parse_args()
    compat = json.loads(args.compat)
    train_args = json.loads(args.train_args)
    corpus = Path(args.corpus)

    # Per-model (and per-quirk-set, per-corpus) workdir so manifests
    # don't cross-resume between configurations:
    tag = "-".join([args.model.split(".")[-1],
                    *([corpus.name] if corpus != CORPUS else []),
                    *[f"{k}={v}" for k, v in sorted(compat.items())],
                    *[f"{k}={v}" for k, v in sorted(train_args.items())]])
    workdir = Path(f"work/full-shape-exp-{tag}")

    if not corpus.exists():
        if corpus != CORPUS:
            raise SystemExit(f"corpus dir {corpus} does not exist")
        from scripts.make_synth_corpus import make_corpus

        make_corpus(str(CORPUS), args.classes, args.samples, seed=1)

    from sign_language_nlp_tpu.pipeline import run
    from sign_language_nlp_tpu.utils import log, set_verbosity
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    set_verbosity(2)

    run_args = {
        "seed": 1, "debug": False, "cuda": False, "verbose": 2,
        "n_jobs": -1, "cv": 5, "lr": None,
        "scoring": ["neg_log_loss", "accuracy", "precision_weighted",
                    "recall_weighted", "f1_weighted"],
        "max_epochs": args.max_epochs, "batch_size": 50,
        "test_size": 0.15,
        "early_stopping": {"patience": 10, "threshold": 1e-4,
                           "threshold_mode": "rel"},
        "gradient_clipping": {"gradient_clip_value": 0.5},
        "lr_scheduler": {"policy": "ReduceLROnPlateau", "factor": 0.2,
                         "patience": 5},
        "model": args.model,
        "model_args": {"embedding_size": 128, "hidden_size": 128,
                       "num_layers": 2, "dropout": 0.1, "num_heads": 4},
        "criterion": "torch.nn.CrossEntropyLoss",
        "optimizer": "torch.optim.SGD",
        "optimizer_args": {"nesterov": False, "momentum": 0.9},
        "grid_args": GRIDS[args.grid],
        "dataset_args": {
            "dataset_dir": str(corpus),
            "fields": ["orientation_dh", "orientation_ndh", "movement_dh",
                       "movement_ndh", "handshape_dh", "handshape_ndh"],
            "samples_min_freq": 2, "composition_strategy": "as_words",
            "reuse_transient": True, "balance_dataset": True,
            "use_native": True,
        },
        "workdir": str(workdir),
        "mesh_args": {"max_population": args.max_population},
        "precision_args": {},
        "compat_args": compat,
        "train_args": train_args,
    }

    t0 = time.time()
    run(run_args)
    wall = time.time() - t0
    log(f"TOTAL WALL: {wall:.1f}s")
    out = json.loads((workdir / "test_output.json").read_text())
    print(json.dumps({"wall_s": round(wall, 1), **out}))


if __name__ == "__main__":
    main()
