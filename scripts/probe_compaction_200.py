"""Stage-3 dress rehearsal (CPU): the reference's TRUE training budget
(max_epochs 200 / patience 30 / plateau(0.2, 5) — reference
config/config-transformer.yaml:10,14-25) on the hard corpus, with EXACT
compaction (compact_granularity=1), run as one emb128-tier population
of the grid's real 6 lr x dropout candidates x (here) 1 fold.

Purpose: the unattended campaign stage 3 (work/r4-stamps/grid-200-emb128)
runs 540 fits in this regime for hours; this probe exercises the exact
engine path — 200-epoch early-stop tail, chained exact compaction,
epoch blocking — end to end on CPU first, and records epochs-to-stop
plus compaction events so the stage's wall-clock is predictable.

Run: SLT_FORCE_CPU=1 python scripts/probe_compaction_200.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sign_language_nlp_tpu.utils.jaxtools import (  # noqa: E402
    setup_compilation_cache)

setup_compilation_cache()

from sign_language_nlp_tpu.data.dataset import AslDataset  # noqa: E402
from sign_language_nlp_tpu.models.registry import build_model  # noqa: E402
from sign_language_nlp_tpu.search.kfold import train_valid_split  # noqa: E402
from sign_language_nlp_tpu.training.engine import (  # noqa: E402
    PopulationTrainer, TrainConfig, TrainTask)

CORPUS = os.environ.get("PROBE_CORPUS", "work/synth-corpus-hard")

ds = AslDataset.build({
    "dataset_dir": CORPUS,
    "fields": ["orientation_dh", "orientation_ndh", "movement_dh",
               "movement_ndh", "handshape_dh", "handshape_ndh"],
    "samples_min_freq": 2, "composition_strategy": "as_words",
    "reuse_transient": True, "use_native": True})
data = (np.asarray(ds.tokens), np.asarray(ds.lengths),
        np.asarray(ds.labels_idx))
print(f"corpus: {data[0].shape}, vocab {len(ds.src_vocab)}",
      file=sys.stderr)

# One emb128-tier shape group (mid geometry), the grid's 6 real
# lr x dropout candidates (config-transformer.yaml grid_args):
model = build_model(
    "model.Transformer", len(ds.src_vocab), len(ds.tgt_vocab),
    src_pad_idx=1, tgt_pad_idx=1,
    model_args={"embedding_size": 128, "hidden_size": 128,
                "num_layers": 2, "dropout": 0.1, "num_heads": 4})
cfg = TrainConfig(
    batch_size=50, max_epochs=200, seed=1, verbose=2,
    optimizer_args={"momentum": 0.9, "nesterov": False},
    gradient_clipping={"gradient_clip_value": 0.5},
    early_stopping={"patience": 30, "threshold": 1e-4,
                    "threshold_mode": "rel"},
    lr_scheduler={"policy": "ReduceLROnPlateau", "factor": 0.2,
                  "patience": 5},
    scoring=("accuracy",), keep_best_params=True,
    compact=True, compact_granularity=1)
trainer = PopulationTrainer(model, 1, len(ds.tgt_vocab), cfg)

lrs = np.array([0.1, 0.1, 0.01, 0.01, 0.001, 0.001], np.float32)
drops = np.array([0.5, 0.1, 0.5, 0.1, 0.5, 0.1], np.float32)
tr, va = train_valid_split(data[2], n_splits=5)
task = TrainTask(train_rows=[tr] * 6, valid_rows=[va] * 6,
                 lr=lrs, dropout=drops)

t0 = time.time()
out = trainer.fit(data, task)
wall = time.time() - t0
hist = out["history"]
vl = np.asarray(hist["valid_loss"])
va_acc = np.asarray(hist["valid_accuracy"])
# epochs-to-stop per cell: the last epoch whose loss row is not a
# frozen repeat (frozen cells hold their stored value after stopping)
stop_epoch = []
for k in range(6):
    col = vl[:, k]
    last = len(col)
    for e in range(len(col) - 1, 0, -1):
        if col[e] != col[e - 1]:
            last = e + 1
            break
    stop_epoch.append(int(last))
print({"wall_s": round(wall, 1),
       "epochs_run": int(vl.shape[0]),
       "lr": lrs.tolist(), "dropout": drops.tolist(),
       "stop_epoch": stop_epoch,
       "final_valid_loss": [round(float(x), 4) for x in vl[-1]],
       "final_valid_acc": [round(float(x), 4) for x in va_acc[-1]]})
