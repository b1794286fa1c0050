"""A/B: population compaction on a genuinely long-tailed workload.

Round-1 finding (DESIGN.md §6b): synthetic corpora early-stop too
uniformly to show compaction's win — every cell finished within ~10
epochs of each other, so shedding finished cells saved nothing and the
bucket compile cost 2.3×. This harness *engineers* the staggered-stop
regime the reference's real workload has (patience-30 / 200-epoch
fits): a population mixing converged cells (good lr — early-stop
quickly) with slow-burning cells (tiny lr — never stop), at
max_epochs>=100. Measures wall-clock compact=False vs compact=True on
the same population.

Usage:  python scripts/run_compaction_ab.py [--small]
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
    ap.add_argument("--max-epochs", type=int, default=120)
    ap.add_argument("--model", default="gru")
    ap.add_argument("--platform", default=None, choices=("cpu",),
                    help="force the CPU platform at the full population "
                    "mix (tunnel-down fallback). The compaction ratio is "
                    "slot accounting — it depends on the pop-16 staggered "
                    "mix and the 120-epoch tail, not on emb width — so "
                    "pair with --emb/--corpus-rows to fit one CPU core.")
    ap.add_argument("--emb", type=int, default=None,
                    help="override embedding/hidden size (default 128, "
                    "16 with --small)")
    ap.add_argument("--corpus-rows", type=int, default=None,
                    help="subsample the corpus to this many rows")
    args = ap.parse_args()

    if args.small or args.platform == "cpu":
        # Env var alone is ignored (the axon sitecustomize re-forces
        # the platform at import); config-update is required.
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.small:
        args.max_epochs = 30
        args.pop = 8

    from sign_language_nlp_tpu.data import AslDataset
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.training.engine import (
        PopulationTrainer, TrainConfig, TrainTask)
    from sign_language_nlp_tpu.utils.holder import (
        flush_partial, register_holder)
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    # Preemption contract (VERDICT r4 #5/#8): each arm's result is
    # flushed to disk the moment it completes, and the sidecar tells
    # the bench's preempt path where those partials live.
    partials = Path("work/ab-partials/compaction.jsonl")
    register_holder(partials=partials, resumable=False,
                    note="compaction A/B — arms flushed per-completion")

    corpus = Path("work/synth-corpus-longtail-small"
                  if args.small else "work/synth-corpus-longtail")
    if not corpus.exists():
        from scripts.make_synth_corpus import make_corpus

        make_corpus(str(corpus), 10 if args.small else 100,
                    120 if args.small else 2000, seed=2,
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
    if args.corpus_rows and args.corpus_rows < len(labels):
        sub = np.random.default_rng(7).permutation(
            len(labels))[:args.corpus_rows]
        tokens, lengths, labels = tokens[sub], lengths[sub], labels[sub]
    N = len(labels)
    P = args.pop

    rng = np.random.default_rng(0)
    rows = np.arange(N)
    train_rows = [rng.permutation(rows)[: int(0.8 * N)] for _ in range(P)]
    valid_rows = [np.setdiff1d(rows, tr)[: max(1, N // 10)]
                  for tr in train_rows]
    # The staggered-stop mix: 3/4 of cells at a healthy lr (converge and
    # early-stop), 1/4 at a tiny lr (improve forever, never trip the
    # patience) — the long tail that keeps the full population alive in
    # the reference's scheduler.
    n_slow = max(1, P // 4)
    lrs = np.concatenate([
        np.geomspace(0.08, 0.3, P - n_slow),
        np.full(n_slow, 1e-4)]).astype(np.float32)

    emb = args.emb or (16 if args.small else 128)
    model = build_model(args.model, len(dataset.src_vocab),
                        len(dataset.tgt_vocab),
                        dataset.src_vocab.pad_index,
                        dataset.tgt_vocab.pad_index,
                        model_args={"embedding_size": emb,
                                    "hidden_size": emb,
                                    "num_layers": 1 if args.small else 2})

    results = {}
    # Three arms (VERDICT r3 #6): no compaction, power-of-two buckets
    # (the round-3 1.99x), and exact mesh-multiple buckets
    # (compact_granularity=1 — zero padding slots, retrigger gated on
    # shedding >= 1/8 of the slots).
    for arm, compact, gran in (("flat", False, None),
                               ("compact", True, None),
                               ("compact_exact", True, 1)):
        cfg = TrainConfig(
            batch_size=50, max_epochs=args.max_epochs, verbose=1,
            optimizer_args={"momentum": 0.9},
            gradient_clipping={"gradient_clip_value": 0.5},
            early_stopping={"patience": 10, "threshold": 1e-4},
            lr_scheduler={"factor": 0.2, "patience": 5},
            compact=compact, compact_granularity=gran,
            keep_best_params=False,
            length_bucketing=True)
        tr = PopulationTrainer(model, dataset.tgt_vocab.pad_index,
                               len(dataset.tgt_vocab), cfg)
        task = TrainTask(train_rows=train_rows, valid_rows=valid_rows,
                         lr=lrs, dropout=np.full(P, 0.1, np.float32))
        data = (tokens, lengths, labels)
        # Two passes: the first pays compiles (main geometry + compaction
        # buckets); the second is the honest warm wall-clock.
        walls = []
        for rep in range(2):
            t0 = time.time()
            out = tr.fit(data, task)
            walls.append(time.time() - t0)
        wall = walls[-1]
        epochs = np.asarray(out["epochs_run"])
        results[arm] = wall
        rec = {
            "arm": arm, "wall_s": round(wall, 1),
            "cold_wall_s": round(walls[0], 1),
            "pop": P, "max_epochs": args.max_epochs, "emb": emb,
            "corpus_rows": int(N),
            "epochs_run": epochs.tolist(),
            "stopped": np.asarray(out["monitor"].stopped).tolist()}
        log(json.dumps(rec))
        flush_partial(partials, rec)

    import jax

    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "compaction_speedup", "unit": "x",
        "value": round(results["flat"] / results["compact"], 3),
        "value_exact": round(results["flat"] / results["compact_exact"], 3),
        "flat_s": round(results["flat"], 1),
        "compact_s": round(results["compact"], 1),
        "compact_exact_s": round(results["compact_exact"], 1),
        "pop": P, "max_epochs": args.max_epochs, "emb": emb,
        "corpus_rows": N, "platform": dev.platform,
        "device_kind": dev.device_kind}))


if __name__ == "__main__":
    main()
