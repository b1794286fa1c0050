"""Workload-scale cross-framework A/B (VERDICT r2 #2/#3): reference
math in plain torch vs this framework on the full-shape synthetic
corpus — the closest attainable stand-in for the blocked real
ASL-Phono parity north star.

Two modes:

  grid (default) — a small REAL grid (4 lr candidates × 5 folds = 20
    fits + refit) with IDENTICAL folds, inner monitor splits, and
    per-cell initial weights (copied from torch) on both sides.
    Compares per-cell fold scores, best-candidate selection, held-out
    test accuracy / weighted-F1 / NLL, and wall-clock. Torch runs the
    cells sequentially (the reference's per-task execution model);
    the engine trains all 20 cells as ONE population.

  lstm-convergence — settles BASELINE.md's LSTM row (VERDICT r2 #2):
    one fit at the reference's own hyperparameters (lr 0.1, patience
    30, ReduceLROnPlateau(0.2,5), <=200 epochs,
    config-enc-dec-lstm-attn.yaml:12-25) on the realistic corpus, same
    init both sides, dropout 0 (RNG-free comparison). Outcome is one
    of: both converge (record metrics), both fail (corpus artifact),
    or they diverge (a real parity bug).

Run:
  python scripts/run_torch_workload_ab.py [--mode grid|lstm-convergence]
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


FIELDS = ["orientation_dh", "orientation_ndh", "movement_dh",
          "movement_ndh", "handshape_dh", "handshape_ndh"]


def load_corpus(corpus_dir: str):
    from sign_language_nlp_tpu.data import AslDataset

    ds = AslDataset.build(dataset_args={
        "dataset_dir": corpus_dir, "fields": FIELDS,
        "samples_min_freq": 2, "composition_strategy": "as_words",
        "reuse_transient": True, "use_native": True,
    }, batch_first=True).stoi()
    return ds


def _metrics(log_probs, y_true, labels):
    from sign_language_nlp_tpu.search.scoring import ScoringWrapper

    out = {}
    for name in ("accuracy", "f1_weighted", "neg_log_loss"):
        out[name] = float(ScoringWrapper(name, labels=labels)(
            np.asarray(log_probs), np.asarray(y_true)))
    return out


def mode_grid(args):
    import torch

    from scripts.torch_reference import (TorchRNNAttn, copy_rnn_params,
                                         predict_log_probs, torch_fit)
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.search.kfold import (stratified_kfold,
                                                    train_valid_split)
    from sign_language_nlp_tpu.search.scoring import ScoringWrapper
    from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                       TrainConfig,
                                                       TrainTask)

    ds = load_corpus(args.corpus)
    tokens = np.asarray(ds.tokens)
    lengths = np.asarray(ds.lengths)
    labels_idx = np.asarray(ds.labels_idx)
    vs, vt = len(ds.src_vocab), len(ds.tgt_vocab)
    pad_s, pad_t = ds.src_vocab.pad_index, ds.tgt_vocab.pad_index
    labels = ds.labels()
    log(f"corpus: {len(labels_idx)} rows, S={tokens.shape[1]}, "
        f"src vocab {vs}, {len(set(labels_idx.tolist()))} classes")

    # Held-out test split (reference test_size 0.15 semantics, seeded):
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(len(labels_idx))
    n_test = int(0.15 * len(perm))
    test_rows, train_rows = perm[:n_test], perm[n_test:]
    y_train = labels_idx[train_rows]

    folds = stratified_kfold(y_train, 5)
    lrs = [0.3, 0.1, 0.03, 0.01]
    E = H = args.emb
    L = 1
    scorer = ScoringWrapper("neg_log_loss", labels=labels)

    # Per-cell torch inits (both sides fit from IDENTICAL weights):
    cells = [(ci, fi) for ci in range(len(lrs)) for fi in range(5)]
    inits_torch, inits_jax = [], []
    for ci, fi in cells:
        torch.manual_seed(1000 + ci * 5 + fi)
        tm = TorchRNNAttn(vs, vt, E, H, L, cell="gru", pad=pad_s,
                          bos=ds.tgt_vocab.lookup("<bos>"))
        inits_torch.append(tm)
        inits_jax.append(copy_rnn_params(tm))

    inner = [train_valid_split(y_train[ft], n_splits=5)
             for ft, _ in folds]

    # ---- torch side: sequential cells (the reference's model) -------
    # `--torch-cache` decouples the two sides so the hours-long
    # sequential torch baseline can run on CPU while the TPU is busy
    # (one JAX process at a time — CLAUDE.md): a first run with
    # `--torch-only` writes the torch numbers, a later run loads them
    # and executes only the engine side on the device. The per-cell
    # inits are reconstructed identically from the torch seeds, so the
    # comparison contract (identical folds + initial weights) holds
    # across the two processes.
    cache = Path(args.torch_cache) if args.torch_cache else None
    if cache is not None and cache.exists():
        c = json.loads(cache.read_text())
        t_scores = np.asarray(c["t_scores"])
        t_test = c["t_test"]
        torch_grid_wall = c["torch_grid_wall"]
        torch_refit_wall = c["torch_refit_wall"]
        t_mean = t_scores.reshape(len(lrs), 5).mean(axis=1)
        t_best = int(np.argmax(t_mean))
        log(f"torch side loaded from {cache} (best lr={lrs[t_best]}, "
            f"grid {torch_grid_wall:.0f}s)")
        return _engine_side(args, ds, tokens, lengths, labels_idx,
                            train_rows, test_rows, folds, inner, cells,
                            lrs, inits_jax, scorer, labels, y_train,
                            t_scores, t_best, t_test, torch_grid_wall,
                            torch_refit_wall)
    t0 = time.time()
    t_scores = np.zeros(len(cells))
    for k, (ci, fi) in enumerate(cells):
        ft, _ = folds[fi]
        itr, iva = inner[fi]
        tr_rows = train_rows[ft[itr]]
        va_rows = train_rows[ft[iva]]
        torch_fit(inits_torch[k], tokens, lengths, labels_idx,
                  tr_rows, va_rows, lr=lrs[ci],
                  batch_size=50, max_epochs=args.max_epochs,
                  plateau={"factor": 0.2, "patience": 5},
                  es_patience=30)
        te_rows = train_rows[folds[fi][1]]
        lp = predict_log_probs(inits_torch[k], tokens, lengths,
                               labels_idx, te_rows)
        t_scores[k] = scorer(lp, labels_idx[te_rows])
        log(f"torch cell {k + 1}/{len(cells)} (lr={lrs[ci]}, fold {fi}): "
            f"score {t_scores[k]:.4f}")
    t_mean = t_scores.reshape(len(lrs), 5).mean(axis=1)
    t_best = int(np.argmax(t_mean))
    torch_grid_wall = time.time() - t0

    # torch refit + test:
    t0 = time.time()
    torch.manual_seed(999)
    tm_refit = TorchRNNAttn(vs, vt, E, H, L, cell="gru", pad=pad_s,
                            bos=ds.tgt_vocab.lookup("<bos>"))
    refit_init = copy_rnn_params(tm_refit)
    itr, iva = train_valid_split(y_train, n_splits=5)
    torch_fit(tm_refit, tokens, lengths, labels_idx, train_rows[itr],
              train_rows[iva], lr=lrs[t_best], batch_size=50,
              max_epochs=args.max_epochs,
              plateau={"factor": 0.2, "patience": 5}, es_patience=30)
    lp = predict_log_probs(tm_refit, tokens, lengths, labels_idx,
                           test_rows)
    t_test = _metrics(lp, labels_idx[test_rows], labels)
    torch_refit_wall = time.time() - t0
    log(f"torch: best lr={lrs[t_best]} test={t_test} "
        f"grid {torch_grid_wall:.0f}s refit {torch_refit_wall:.0f}s")
    if cache is not None:
        cache.write_text(json.dumps({
            "t_scores": t_scores.tolist(), "t_test": t_test,
            "torch_grid_wall": round(torch_grid_wall, 1),
            "torch_refit_wall": round(torch_refit_wall, 1),
            "emb": args.emb, "max_epochs": args.max_epochs,
            "corpus": args.corpus, "seed": args.seed}))
        log(f"torch side cached to {cache}")
        if args.torch_only:
            print(json.dumps({"mode": "grid-torch-only",
                              "torch_best_lr": lrs[t_best],
                              "torch_test": t_test,
                              "torch_wall_s": round(
                                  torch_grid_wall + torch_refit_wall,
                                  1)}))
            return None

    return _engine_side(args, ds, tokens, lengths, labels_idx,
                        train_rows, test_rows, folds, inner, cells,
                        lrs, inits_jax, scorer, labels, y_train,
                        t_scores, t_best, t_test, torch_grid_wall,
                        torch_refit_wall)


def _engine_side(args, ds, tokens, lengths, labels_idx, train_rows,
                 test_rows, folds, inner, cells, lrs, inits_jax,
                 scorer, labels, y_train, t_scores, t_best, t_test,
                 torch_grid_wall, torch_refit_wall):
    """The framework half of mode_grid — one 20-cell population + a
    refit, scored exactly like the torch side. Split out so a cached
    torch baseline lets this half run alone on the TPU."""
    import torch

    from scripts.torch_reference import TorchRNNAttn, copy_rnn_params
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.search.kfold import train_valid_split
    from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                       TrainConfig,
                                                       TrainTask)

    vs, vt = len(ds.src_vocab), len(ds.tgt_vocab)
    pad_s, pad_t = ds.src_vocab.pad_index, ds.tgt_vocab.pad_index
    E = H = args.emb
    L = 1
    # The refit init is reconstructed from its seed (not carried over
    # from the torch section) so the cached-baseline path fits from
    # the SAME weights the torch refit used:
    torch.manual_seed(999)
    refit_init = copy_rnn_params(
        TorchRNNAttn(vs, vt, E, H, L, cell="gru", pad=pad_s,
                     bos=ds.tgt_vocab.lookup("<bos>")))

    # ---- engine side: ONE population of 20 cells --------------------
    import jax

    model = build_model("model.EncoderDecoderGRUAttn", vs, vt, pad_s,
                        pad_t, bos_idx=ds.tgt_vocab.lookup("<bos>"),
                        model_args={"embedding_size": E,
                                    "hidden_size": H,
                                    "num_layers": L, "dropout": 0.0})
    cfg = TrainConfig(batch_size=50, max_epochs=args.max_epochs, seed=0,
                      verbose=1, optimizer_args={"momentum": 0.9},
                      gradient_clipping={"gradient_clip_value": 0.5},
                      lr_scheduler={"factor": 0.2, "patience": 5},
                      early_stopping={"patience": 30, "threshold": 1e-4},
                      scoring=("accuracy",), train_deterministic=True)
    trainer = PopulationTrainer(model, pad_t, vt, cfg)
    task = TrainTask(
        train_rows=[train_rows[folds[fi][0]][inner[fi][0]]
                    for _, fi in cells],
        valid_rows=[train_rows[folds[fi][0]][inner[fi][1]]
                    for _, fi in cells],
        lr=np.asarray([lrs[ci] for ci, _ in cells], np.float32),
        dropout=np.zeros(len(cells), np.float32))
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *inits_jax)
    t0 = time.time()
    out = trainer.fit((tokens, lengths, labels_idx), task,
                      init_params=stacked)
    j_scores = np.zeros(len(cells))
    test_rows_cells = [train_rows[folds[fi][1]] for _, fi in cells]
    lp, w = trainer.predict_log_probs(out["params"],
                                      (tokens, lengths, labels_idx),
                                      test_rows_cells)
    lp, w = np.asarray(lp), np.asarray(w)
    for k in range(len(cells)):
        m = int(w[k].sum())
        j_scores[k] = scorer(lp[k][:m], labels_idx[test_rows_cells[k][:m]])
    j_mean = j_scores.reshape(len(lrs), 5).mean(axis=1)
    j_best = int(np.argmax(j_mean))
    engine_grid_wall = time.time() - t0

    # engine refit + test (same init as the torch refit):
    t0 = time.time()
    itr, iva = train_valid_split(y_train, n_splits=5)
    task_r = TrainTask(train_rows=[train_rows[itr]],
                       valid_rows=[train_rows[iva]],
                       lr=np.asarray([lrs[j_best]], np.float32),
                       dropout=np.zeros(1, np.float32))
    out_r = trainer.fit((tokens, lengths, labels_idx), task_r,
                        init_params=jax.tree.map(lambda a: a[None],
                                                 refit_init))
    lp_r, w_r = trainer.predict_log_probs(
        out_r["params"], (tokens, lengths, labels_idx), [test_rows])
    m = int(np.asarray(w_r)[0].sum())
    j_test = _metrics(np.asarray(lp_r)[0][:m], labels_idx[test_rows[:m]],
                      labels)
    engine_refit_wall = time.time() - t0

    summary = {
        "mode": "grid", "n_cells": len(cells), "lrs": lrs,
        "torch_best_lr": lrs[t_best], "engine_best_lr": lrs[j_best],
        "same_selection": bool(t_best == j_best),
        "max_cell_score_delta": float(np.abs(t_scores - j_scores).max()),
        "torch_test": t_test, "engine_test": j_test,
        "test_metric_delta": {k: round(abs(t_test[k] - j_test[k]), 4)
                              for k in t_test},
        "torch_wall_s": round(torch_grid_wall + torch_refit_wall, 1),
        "engine_wall_s": round(engine_grid_wall + engine_refit_wall, 1),
        "speedup": round((torch_grid_wall + torch_refit_wall)
                         / (engine_grid_wall + engine_refit_wall), 2),
    }
    print(json.dumps(summary))


def mode_lstm_convergence(args):
    import torch

    from scripts.torch_reference import (TorchRNNAttn, copy_rnn_params,
                                         torch_fit)
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.search.kfold import train_valid_split
    from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                       TrainConfig,
                                                       TrainTask)

    ds = load_corpus(args.corpus)
    tokens = np.asarray(ds.tokens)
    lengths = np.asarray(ds.lengths)
    labels_idx = np.asarray(ds.labels_idx)
    if args.max_rows and args.max_rows < len(labels_idx):
        # Torch-CPU tractability: a seeded subsample keeps the corpus
        # distribution while bounding the 200-epoch reference-settings
        # run (a packed biLSTM over S=120 costs ~30 s/epoch in CPU
        # torch at full size).
        sub = np.random.default_rng(args.seed).permutation(
            len(labels_idx))[: args.max_rows]
        tokens, lengths = tokens[sub], lengths[sub]
        labels_idx = labels_idx[sub]
        log(f"subsampled corpus to {len(labels_idx)} rows")
    vs, vt = len(ds.src_vocab), len(ds.tgt_vocab)
    pad_s, pad_t = ds.src_vocab.pad_index, ds.tgt_vocab.pad_index
    E = H = args.emb
    L = args.layers

    itr, iva = train_valid_split(labels_idx, n_splits=5)
    torch.manual_seed(7)
    tm = TorchRNNAttn(vs, vt, E, H, L, cell="lstm", pad=pad_s,
                      bos=ds.tgt_vocab.lookup("<bos>"))
    init = copy_rnn_params(tm)

    # Reference settings: lr 0.1, patience 30, plateau(0.2, 5), <=200
    # epochs (config-enc-dec-lstm-attn.yaml:12-25).
    t0 = time.time()
    t_train, t_valid, t_stop = torch_fit(
        tm, tokens, lengths, labels_idx, itr, iva, lr=0.1,
        batch_size=50, max_epochs=args.max_epochs,
        plateau={"factor": 0.2, "patience": 5}, es_patience=30)
    torch_wall = time.time() - t0
    from scripts.torch_reference import predict_log_probs as t_predict

    t_acc = float(np.mean(np.argmax(
        t_predict(tm, tokens, lengths, labels_idx, iva), axis=-1)
        == labels_idx[iva]))
    log(f"torch LSTM: {len(t_valid)} epochs, stopped={t_stop}, "
        f"final valid loss {t_valid[-1]:.4f}, valid acc {t_acc:.3f}, "
        f"{torch_wall:.0f}s")

    import jax

    model = build_model("model.EncoderDecoderLSTMAttn", vs, vt, pad_s,
                        pad_t, bos_idx=ds.tgt_vocab.lookup("<bos>"),
                        model_args={"embedding_size": E,
                                    "hidden_size": H,
                                    "num_layers": L, "dropout": 0.0})
    cfg = TrainConfig(batch_size=50, max_epochs=args.max_epochs, seed=0,
                      verbose=1, optimizer_args={"momentum": 0.9},
                      gradient_clipping={"gradient_clip_value": 0.5},
                      lr_scheduler={"factor": 0.2, "patience": 5},
                      early_stopping={"patience": 30, "threshold": 1e-4},
                      scoring=("accuracy",), train_deterministic=True)
    trainer = PopulationTrainer(model, pad_t, vt, cfg)
    task = TrainTask(train_rows=[itr], valid_rows=[iva],
                     lr=np.asarray([0.1], np.float32),
                     dropout=np.zeros(1, np.float32))
    t0 = time.time()
    out = trainer.fit((tokens, lengths, labels_idx), task,
                      init_params=jax.tree.map(lambda a: a[None], init))
    engine_wall = time.time() - t0
    j_valid = np.asarray(out["history"]["valid_loss"])[:, 0]
    lp, w = trainer.predict_log_probs(out["params"],
                                      (tokens, lengths, labels_idx),
                                      [iva])
    m = int(np.asarray(w)[0].sum())
    j_acc = float(np.mean(np.argmax(np.asarray(lp)[0][:m], axis=-1)
                          == labels_idx[iva[:m]]))
    epochs_run = int(np.asarray(out["epochs_run"])[0])

    summary = {
        "mode": "lstm-convergence", "lr": 0.1,
        "max_epochs": args.max_epochs,
        "torch": {"epochs": int(len(t_valid)), "stopped": bool(t_stop),
                  "final_valid_loss": round(float(t_valid[-1]), 4),
                  "valid_acc": round(t_acc, 4),
                  "wall_s": round(torch_wall, 1)},
        "engine": {"epochs": epochs_run,
                   "stopped": bool(np.asarray(
                       out["monitor"].stopped)[0]),
                   "final_valid_loss": round(float(
                       j_valid[epochs_run - 1]), 4),
                   "valid_acc": round(j_acc, 4),
                   "wall_s": round(engine_wall, 1)},
        "traj_delta_first10": round(float(np.abs(
            j_valid[:min(10, len(t_valid))]
            - t_valid[:min(10, len(j_valid))]).max()), 5),
    }
    print(json.dumps(summary))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="grid",
                    choices=["grid", "lstm-convergence"])
    ap.add_argument("--corpus", default="work/synth-corpus")
    ap.add_argument("--emb", type=int, default=64)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--max-epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--max-rows", type=int, default=0,
                    help="subsample the corpus (lstm-convergence mode)")
    ap.add_argument("--torch-cache", default=None,
                    help="JSON path for the torch-side numbers: "
                         "written after the torch baseline runs, "
                         "loaded (torch fits skipped) when it exists")
    ap.add_argument("--torch-only", action="store_true",
                    help="stop after writing --torch-cache (lets the "
                         "CPU baseline run while the TPU is busy)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform for the engine side "
                         "(e.g. cpu for smoke runs; the axon site "
                         "override ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    if args.mode == "grid":
        mode_grid(args)
    else:
        mode_lstm_convergence(args)


if __name__ == "__main__":
    main()
