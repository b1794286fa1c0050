"""Reference-scale experiment: the transformer grid's HEAVIEST shape
group (emb 1024, ffn 512, 6 layers, 8 heads — config-transformer.yaml's
top corner) run as one population: 6 candidates (lr × dropout) × 5
folds = 30 fits + refit, at reference training settings (batch 50,
ReduceLROnPlateau, early stopping).

Uses a realistic-vocabulary corpus: per-class signature variants keep
the composed-token vocabulary at ASL-Phono scale (~1-3k tokens), unlike
the fully-random synthetic corpus (~80k) whose embedding tables dwarf
the real workload's.

Run: python scripts/run_reference_scale_group.py [--max-epochs 60]
"""
from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIELDS = ["orientation_dh", "orientation_ndh", "movement_dh",
          "movement_ndh", "handshape_dh", "handshape_ndh"]
POOLS = {
    "orientation": ["left", "right", "up", "down", "front", "back",
                    "left_back", "left_down_front"],
    "movement": ["left", "right", "up_down", "front_back", "circular",
                 "none"],
    "handshape": ["L", "A", "B", "C", "five", "one", "flat_b", "open_a"],
}


def make_low_diversity_corpus(out_dir: str, n_classes=100, n_samples=2000,
                              seed=1) -> None:
    """Frames pick one of 3 per-class whole-frame variants (fields are
    correlated), so the composed-token vocab stays ASL-scale."""
    rng = random.Random(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    classes = []
    for c in range(n_classes):
        variants = []
        for _ in range(3):
            variants.append({f: {"value": rng.choice(POOLS[f.split("_")[0]])}
                             for f in FIELDS})
        classes.append((f"sign{c:03d}", variants))
    per_class = max(2, n_samples // n_classes)
    for label, variants in classes:
        for i in range(per_class):
            frames = []
            for _ in range(rng.randint(8, 120)):
                frame = dict(rng.choice(variants))
                if rng.random() < 0.02:  # occasional null
                    f = rng.choice(FIELDS)
                    frame = dict(frame)
                    frame[f] = None
                frames.append(frame)
            (out / f"{label}-{i:04d}.json").write_text(
                json.dumps({"label": label,
                            "frames": {"phonology": frames}}))
    print(f"corpus: {n_classes} classes x {per_class} samples -> {out}")


def make_hard_corpus(out_dir: str, n_classes=100, n_samples=2000,
                     seed=1, overlap=2, noise=0.30, len_lo=6,
                     len_hi=48) -> None:
    """A corpus whose test metrics CANNOT saturate (VERDICT r3 weak #2:
    the lowdiv corpus's full-grid E2E hit acc/F1 = 1.0, proving
    plumbing rather than selection). Same ASL-scale composed-token
    vocabulary trick as `make_low_diversity_corpus`, but classes sit on
    a ring over a GLOBAL variant list and neighboring classes share
    `overlap` of their 3 variants — a sample whose frames all land on
    shared variants is irreducibly ambiguous — plus `noise` of frames
    drawn from the global pool (uninformative), at SHORT lengths
    (len_lo..len_hi — less evidence per sample; a first cut at
    noise=0.15 / len 8-120 still measured 0.993 test acc). Weak
    candidates are hurt more than strong ones, so grid selection
    discriminates."""
    if overlap not in (0, 1, 2):
        raise ValueError(f"overlap must be 0, 1 or 2 (got {overlap})")
    # Ring stride: class c's 3 variants sit at pool slots
    # c*stride .. c*stride+2, so adjacent classes share (3 - stride)
    # slots. stride=1 (overlap=2, the default) reproduces the original
    # construction byte-for-byte; overlap=0 gives disjoint classes.
    stride = 3 - overlap
    rng = random.Random(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pool = []
    for _ in range(n_classes * stride):
        pool.append({f: {"value": rng.choice(POOLS[f.split("_")[0]])}
                     for f in FIELDS})
    per_class = max(2, n_samples // n_classes)
    for c in range(n_classes):
        label = f"sign{c:03d}"
        variants = [pool[(c * stride + k) % len(pool)] for k in range(3)]
        for i in range(per_class):
            frames = []
            for _ in range(rng.randint(len_lo, len_hi)):
                if rng.random() < noise:
                    frame = dict(rng.choice(pool))
                else:
                    frame = dict(rng.choice(variants))
                if rng.random() < 0.02:  # occasional null
                    f = rng.choice(FIELDS)
                    frame = dict(frame)
                    frame[f] = None
                frames.append(frame)
            (out / f"{label}-{i:04d}.json").write_text(
                json.dumps({"label": label,
                            "frames": {"phonology": frames}}))
    print(f"hard corpus: {n_classes} classes x {per_class} samples "
          f"(overlap {overlap}, noise {noise}) -> {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-epochs", type=int, default=60)
    args = ap.parse_args()

    corpus = Path("work/synth-corpus-lowdiv")
    if not corpus.exists():
        make_low_diversity_corpus(str(corpus))

    from sign_language_nlp_tpu.pipeline import run
    from sign_language_nlp_tpu.utils import log, set_verbosity
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    set_verbosity(1)

    workdir = "work/ref-scale-group"
    run_args = {
        "seed": 1, "debug": False, "cuda": False, "verbose": 1,
        "n_jobs": -1, "cv": 5, "lr": None,
        "scoring": ["neg_log_loss", "accuracy", "precision_weighted",
                    "recall_weighted", "f1_weighted"],
        "max_epochs": args.max_epochs, "batch_size": 50,
        "test_size": 0.15,
        "early_stopping": {"patience": 30, "threshold": 1e-4,
                           "threshold_mode": "rel"},
        "gradient_clipping": {"gradient_clip_value": 0.5},
        "lr_scheduler": {"policy": "ReduceLROnPlateau", "factor": 0.2,
                         "patience": 5},
        "model": "model.Transformer",
        # The heaviest grid corner (config-transformer.yaml:46-53):
        "model_args": {"embedding_size": 1024, "hidden_size": 512,
                       "num_layers": 6, "dropout": 0.1, "num_heads": 8},
        "criterion": "torch.nn.CrossEntropyLoss",
        "optimizer": "torch.optim.SGD",
        "optimizer_args": {"nesterov": False, "momentum": 0.9},
        "grid_args": {"lr": [0.1, 0.01, 0.001],
                      "model_args": {"dropout": [0.5, 0.1]}},
        "dataset_args": {
            "dataset_dir": str(corpus), "fields": FIELDS,
            "samples_min_freq": 2, "composition_strategy": "as_words",
            "reuse_transient": True, "balance_dataset": True,
            "use_native": True,
        },
        "workdir": workdir,
        "mesh_args": {"max_population": 32},
        "precision_args": {"compute_dtype": "bfloat16"},
        "compat_args": {"scan_layers": True},
    }
    t0 = time.time()
    run(run_args)
    wall = time.time() - t0
    log(f"TOTAL WALL: {wall:.1f}s")
    out = json.loads(Path(workdir, "test_output.json").read_text())
    print(json.dumps({"wall_s": round(wall, 1), **out}))


if __name__ == "__main__":
    main()
