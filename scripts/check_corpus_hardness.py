"""Empirical non-saturation check for a synthetic corpus (VERDICT r3
weak #2): fit a small-but-capable GRU on a train split and report
held-out accuracy/F1. A corpus is 'hard enough' when a converged
capable model lands clearly below 1.0 (target band ~0.80-0.97) — then
grid selection discriminates candidates instead of proving plumbing.

Run:  python scripts/check_corpus_hardness.py [--corpus work/synth-corpus-hard]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="work/synth-corpus-hard")
    ap.add_argument("--max-epochs", type=int, default=30)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    corpus = Path(args.corpus)
    if not corpus.exists():
        from scripts.run_reference_scale_group import make_hard_corpus

        make_hard_corpus(str(corpus))

    from sign_language_nlp_tpu.data import AslDataset
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.ops.metrics import accuracy, f1_weighted
    from sign_language_nlp_tpu.training.engine import (
        PopulationTrainer, TrainConfig, TrainTask)
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    dataset = AslDataset.build(dataset_args={
        "dataset_dir": str(corpus),
        "fields": ["orientation_dh", "orientation_ndh", "movement_dh",
                   "movement_ndh", "handshape_dh", "handshape_ndh"],
        "samples_min_freq": 2, "composition_strategy": "as_words",
        "reuse_transient": True, "use_native": True,
    }, batch_first=True).stoi()
    tokens = np.asarray(dataset.tokens)
    lengths = np.asarray(dataset.lengths)
    labels = np.asarray(dataset.labels_idx)
    N = len(labels)
    rng = np.random.default_rng(0)
    perm = rng.permutation(N)
    n_test = int(0.15 * N)
    test_rows, rest = perm[:n_test], perm[n_test:]
    n_val = max(1, len(rest) // 10)
    valid_rows, train_rows = rest[:n_val], rest[n_val:]

    model = build_model("model.EncoderDecoderGRUAttn",
                        len(dataset.src_vocab), len(dataset.tgt_vocab),
                        dataset.src_vocab.pad_index,
                        dataset.tgt_vocab.pad_index,
                        model_args={"embedding_size": 64,
                                    "hidden_size": 64, "num_layers": 2})
    cfg = TrainConfig(batch_size=50, max_epochs=args.max_epochs,
                      verbose=1, optimizer_args={"momentum": 0.9},
                      gradient_clipping={"gradient_clip_value": 0.5},
                      early_stopping={"patience": 10, "threshold": 1e-4},
                      lr_scheduler={"factor": 0.2, "patience": 5},
                      scoring=("accuracy",), length_bucketing=True)
    tr = PopulationTrainer(model, dataset.tgt_vocab.pad_index,
                           len(dataset.tgt_vocab), cfg)
    task = TrainTask(train_rows=[train_rows], valid_rows=[valid_rows],
                     lr=np.array([0.1], np.float32),
                     dropout=np.array([0.1], np.float32))
    out = tr.fit((tokens, lengths, labels), task)
    lp, _ = tr.predict_log_probs(out["best_params"],
                                 (tokens, lengths, labels), [test_rows])
    pred = np.asarray(lp)[0].argmax(-1)
    y = labels[test_rows]
    acc = float(accuracy(y, pred))
    f1 = float(f1_weighted(y, pred, num_classes=len(dataset.tgt_vocab)))
    va = np.asarray(out["history"]["valid_accuracy"])[:, 0]
    print(json.dumps({
        "corpus": str(corpus), "n_rows": int(N),
        "vocab": len(dataset.src_vocab),
        "epochs": int(np.asarray(out["epochs_run"])[0]),
        "best_valid_acc": round(float(va.max()), 4),
        "test_acc": round(acc, 4), "test_f1": round(f1, 4),
        "saturated": bool(acc >= 0.995)}))


if __name__ == "__main__":
    main()
