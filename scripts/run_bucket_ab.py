"""A/B: auto N-bucket planning vs the single median cut on a
multi-modal length corpus (VERDICT r3 weak #5 / next-round #7).

Three arms on the same trimodal-length population (modes ~13/60/110,
50/30/20% of rows):
  flat    — no length bucketing (every row pads to S_max)
  median  — single bucket_percentile=50 cut (lands inside the short
            mode; the medium mode still pads to S_max)
  auto    — bucket_percentiles="auto" (plan_bucket_seqs_auto picks the
            cuts from the corpus length histogram by exact DP over
            padded tokens, extra buckets gated on a >=10% win)

Measures warm wall-clock per arm (two passes — the first pays the
per-geometry compiles) plus the planner's chosen cuts and each arm's
final valid accuracy (trajectories must stay equivalent: bucketing is
a geometry change, not a math change, for mask-strict models).

Run:  python scripts/run_bucket_ab.py [--small]
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
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--pop", type=int, default=16)
    ap.add_argument("--max-epochs", type=int, default=30)
    ap.add_argument("--model", default="gru")
    ap.add_argument("--platform", default=None, choices=("cpu",),
                    help="force the CPU platform at full scale (a "
                         "tunnel-down fallback measurement; env vars "
                         "alone are overridden by the axon "
                         "sitecustomize)")
    args = ap.parse_args()

    if args.small or args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.small:
        args.max_epochs = 6
        args.pop = 4

    from sign_language_nlp_tpu.data import AslDataset
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.training.engine import (
        PopulationTrainer, TrainConfig, TrainTask, plan_bucket_seqs_auto)
    from sign_language_nlp_tpu.utils.holder import (
        flush_partial, register_holder)
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    # Preemption contract (VERDICT r4 #5/#8): per-arm partials + sidecar.
    partials = Path("work/ab-partials/bucketing.jsonl")
    register_holder(partials=partials, resumable=False,
                    note="bucket A/B — arms flushed per-completion")

    corpus = Path("work/synth-corpus-trimodal-small"
                  if args.small else "work/synth-corpus-trimodal")
    if not corpus.exists():
        from scripts.make_synth_corpus import make_corpus

        make_corpus(str(corpus), 10 if args.small else 100,
                    120 if args.small else 2000, seed=3,
                    length_dist="trimodal")

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
    P = args.pop
    seq_len = tokens.shape[1]
    auto_cuts = plan_bucket_seqs_auto(lengths, seq_len)
    log(f"corpus: N={N} S={seq_len} "
        f"length modes p10/p50/p90 = "
        f"{np.percentile(lengths, [10, 50, 90]).astype(int).tolist()}; "
        f"auto cuts = {auto_cuts}")

    rng = np.random.default_rng(0)
    rows = np.arange(N)
    train_rows = [rng.permutation(rows)[: int(0.8 * N)] for _ in range(P)]
    valid_rows = [np.setdiff1d(rows, tr)[: max(1, N // 10)]
                  for tr in train_rows]
    lrs = np.geomspace(0.05, 0.3, P).astype(np.float32)

    emb = 16 if args.small else 128
    model = build_model(args.model, len(dataset.src_vocab),
                        len(dataset.tgt_vocab),
                        dataset.src_vocab.pad_index,
                        dataset.tgt_vocab.pad_index,
                        model_args={"embedding_size": emb,
                                    "hidden_size": emb,
                                    "num_layers": 1 if args.small else 2})

    arms = (("flat", False, None), ("median", True, None),
            ("auto", True, "auto"))
    results, accs = {}, {}
    for arm, bucketing, percentiles in arms:
        cfg = TrainConfig(
            batch_size=50, max_epochs=args.max_epochs, verbose=1,
            optimizer_args={"momentum": 0.9},
            gradient_clipping={"gradient_clip_value": 0.5},
            scoring=("accuracy",), keep_best_params=False,
            length_bucketing=bucketing,
            bucket_percentiles=percentiles)
        tr = PopulationTrainer(model, dataset.tgt_vocab.pad_index,
                               len(dataset.tgt_vocab), cfg)
        task = TrainTask(train_rows=train_rows, valid_rows=valid_rows,
                         lr=lrs, dropout=np.full(P, 0.1, np.float32))
        data = (tokens, lengths, labels)
        walls = []
        for rep in range(2):
            t0 = time.time()
            out = tr.fit(data, task)
            walls.append(time.time() - t0)
        results[arm] = walls[-1]
        accs[arm] = round(float(np.asarray(
            out["history"]["valid_accuracy"])[-1].mean()), 4)
        rec = {"arm": arm, "wall_s": round(walls[-1], 1),
               "cold_wall_s": round(walls[0], 1),
               "pop": P, "max_epochs": args.max_epochs, "emb": emb,
               "corpus_rows": int(N), "auto_cuts": list(auto_cuts),
               "mean_valid_acc": accs[arm]}
        log(json.dumps(rec))
        flush_partial(partials, rec)

    import jax

    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "auto_bucket_speedup_vs_median", "unit": "x",
        "platform": dev.platform, "device_kind": dev.device_kind,
        "value": round(results["median"] / results["auto"], 3),
        "speedup_vs_flat": round(results["flat"] / results["auto"], 3),
        "median_vs_flat": round(results["flat"] / results["median"], 3),
        "flat_s": round(results["flat"], 1),
        "median_s": round(results["median"], 1),
        "auto_s": round(results["auto"], 1),
        "auto_cuts": list(auto_cuts),
        "acc": accs, "pop": P, "max_epochs": args.max_epochs}))


if __name__ == "__main__":
    main()
