"""RNN learnability probe at the campaign's scaled grid budget: a
small population spanning the grid's real lrs (config-enc-dec-*.yaml
grid_args lr [0.1, 0.01, 0.001]) at 40 epochs / bf16 on the hard
corpus — the stage-4/5 pre-flight that tells us whether the 810-fit
grids will DISCRIMINATE candidates (lr 0.1 converges, the others
don't) rather than produce degenerate all-flat selections.

The LSTM run (2026-08-18, /tmp/probe_stage5.log + BASELINE.md row):
lr 0.1 -> 0.32 valid loss by epoch 40; lr 0.01 ~flat; lr 0.001
early-stops. This script reproduces that probe for either family.

Run: python scripts/probe_rnn_budget.py [--family gru] [--epochs 40]
     (CPU-forced; PROBE_CORPUS overrides work/synth-corpus-hard)
"""
import argparse
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

ap = argparse.ArgumentParser()
ap.add_argument("--family", default="gru", choices=("gru", "lstm"))
ap.add_argument("--epochs", type=int, default=40)
ap.add_argument("--patience", type=int, default=10)
args = ap.parse_args()

MODEL = {"gru": "model.EncoderDecoderGRUAttn",
         "lstm": "model.EncoderDecoderLSTMAttn"}[args.family]

ds = AslDataset.build({
    "dataset_dir": os.environ.get("PROBE_CORPUS", "work/synth-corpus-hard"),
    "fields": ["orientation_dh", "orientation_ndh", "movement_dh",
               "movement_ndh", "handshape_dh", "handshape_ndh"],
    "samples_min_freq": 2, "composition_strategy": "as_words",
    "reuse_transient": True, "use_native": True})
data = (np.asarray(ds.tokens), np.asarray(ds.lengths),
        np.asarray(ds.labels_idx))
print(f"corpus: {data[0].shape}, vocab {len(ds.src_vocab)}",
      file=sys.stderr)

model = build_model(
    MODEL, len(ds.src_vocab), len(ds.tgt_vocab), src_pad_idx=1,
    tgt_pad_idx=1,
    model_args={"embedding_size": 128, "hidden_size": 128,
                "num_layers": 2, "dropout": 0.1},
    precision_args={"compute_dtype": "bfloat16"})
cfg = TrainConfig(
    batch_size=50, max_epochs=args.epochs, seed=1, verbose=2,
    optimizer_args={"momentum": 0.9, "nesterov": False},
    gradient_clipping={"gradient_clip_value": 0.5},
    early_stopping={"patience": args.patience, "threshold": 1e-4,
                    "threshold_mode": "rel"},
    lr_scheduler={"policy": "ReduceLROnPlateau", "factor": 0.2,
                  "patience": 5},
    scoring=("accuracy",), keep_best_params=False, compact=False)
trainer = PopulationTrainer(model, 1, len(ds.tgt_vocab), cfg)

lrs = np.array([0.1, 0.01, 0.001], np.float32)
tr, va = train_valid_split(data[2], n_splits=5)
task = TrainTask(train_rows=[tr] * 3, valid_rows=[va] * 3,
                 lr=lrs, dropout=np.full(3, 0.1, np.float32))
t0 = time.time()
out = trainer.fit(data, task)
vl = np.asarray(out["history"]["valid_loss"])
va_acc = np.asarray(out["history"]["valid_accuracy"])
print({"family": args.family, "wall_s": round(time.time() - t0, 1),
       "epochs_run": [int(e) for e in np.asarray(out["epochs_run"])],
       "lr": lrs.tolist(),
       "final_valid_loss": [round(float(x), 4) for x in vl[-1]],
       "final_valid_acc": [round(float(x), 4) for x in va_acc[-1]]})
