"""A/B: length bucketing on a long-tailed corpus, on the real device.

Both the reference and the round-1 engine pay S_max compute on every
row (DESIGN.md padding note). On a lognormal-length corpus (median ~28
frames, tail to 240) the short bucket holds most rows at a fraction of
the sequence length — this measures the actual wall-clock win of
`TrainConfig.length_bucketing` for the RNN family (scan length ∝ S)
and the transformer (attention ∝ S²).

Methodology: P-cell population, fixed epoch count, no early stopping;
one untimed fit first (compiles both geometries), then median of 3
timed fits. Prints one JSON line per (model, mode) plus a summary.

Usage:  python scripts/run_bucketing_ab.py [--small]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for CPU smoke validation")
    ap.add_argument("--pop", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--models", default="gru,transformer")
    args = ap.parse_args()

    if args.small:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from sign_language_nlp_tpu.data import AslDataset
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.training.engine import (
        PopulationTrainer, TrainConfig, TrainTask, plan_bucket_seq)
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()

    corpus = Path("work/synth-corpus-longtail-small"
                  if args.small else "work/synth-corpus-longtail")
    n_samples = 120 if args.small else 2000
    n_classes = 10 if args.small else 100
    if not corpus.exists():
        from scripts.make_synth_corpus import make_corpus

        make_corpus(str(corpus), n_classes, n_samples, seed=2,
                    length_dist="lognormal")

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
    N, S = tokens.shape
    cut = plan_bucket_seq(lengths, S)
    short_frac = float((lengths <= (cut or 0)).mean())
    log(f"corpus: N={N} S_max={S} len p50={np.percentile(lengths, 50):.0f}"
        f" p95={np.percentile(lengths, 95):.0f} bucket_cut={cut}"
        f" short_frac={short_frac:.2f}")

    P = args.pop
    rng = np.random.default_rng(0)
    rows = np.arange(N)
    train_rows = [rng.permutation(rows)[: int(0.8 * N)] for _ in range(P)]
    valid_rows = [np.setdiff1d(rows, tr)[:max(1, N // 10)]
                  for tr in train_rows]
    lrs = np.geomspace(0.02, 0.2, P).astype(np.float32)

    margs_by_model = {
        "gru": {"embedding_size": 16 if args.small else 128,
                "hidden_size": 16 if args.small else 128,
                "num_layers": 1 if args.small else 2},
        "transformer": {"embedding_size": 16 if args.small else 128,
                        "hidden_size": 16 if args.small else 128,
                        "num_layers": 1 if args.small else 2,
                        "num_heads": 2 if args.small else 4},
    }

    results = {}
    for name in args.models.split(","):
        model = build_model(name, len(dataset.src_vocab),
                            len(dataset.tgt_vocab),
                            dataset.src_vocab.pad_index,
                            dataset.tgt_vocab.pad_index,
                            model_args=margs_by_model[name])
        for bucketing in (False, True):
            cfg = TrainConfig(
                batch_size=50, max_epochs=args.epochs, verbose=0,
                optimizer_args={"momentum": 0.9},
                gradient_clipping={"gradient_clip_value": 0.5},
                length_bucketing=bucketing, keep_best_params=False)
            tr = PopulationTrainer(model, dataset.tgt_vocab.pad_index,
                                   len(dataset.tgt_vocab), cfg)
            task = TrainTask(train_rows=train_rows,
                             valid_rows=valid_rows, lr=lrs,
                             dropout=np.full(P, 0.1, np.float32))
            data = (tokens, lengths, labels)
            t0 = time.time()
            tr.fit(data, task)  # warm-up: compiles, fills caches
            warm = time.time() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                out = tr.fit(data, task)
                times.append(time.time() - t0)
            med = float(np.median(times))
            final = float(np.mean(out["history"]["valid_loss"][-1]))
            key = f"{name}:{'bucketed' if bucketing else 'flat'}"
            results[key] = med
            rec = {"model": name, "bucketing": bucketing,
                   "warmup_s": round(warm, 2),
                   "fit_s_median": round(med, 3),
                   "fit_s_all": [round(t, 3) for t in times],
                   "epochs": args.epochs, "pop": P,
                   "final_valid_loss_mean": round(final, 4)}
            log(json.dumps(rec))

    summary = {"metric": "length_bucketing_speedup", "unit": "x",
               "bucket_cut": cut, "short_frac": round(short_frac, 3)}
    for name in args.models.split(","):
        flat, bkt = results[f"{name}:flat"], results[f"{name}:bucketed"]
        summary[f"{name}_speedup"] = round(flat / bkt, 3)
        summary[f"{name}_flat_s"] = round(flat, 3)
        summary[f"{name}_bucketed_s"] = round(bkt, 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
