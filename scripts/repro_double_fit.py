"""Minimal TPU repro: two consecutive PopulationTrainer.fit() calls
reusing one compiled epoch program (the grid driver's chunked pattern
with uniform pad_rows_to). Isolates the INTERNAL backend error seen at
the second chunk of scripts/run_full_shape_experiment.py.

Ablations via env:
  REPRO_PREDICT=0   skip predict_log_probs between fits
  REPRO_PROBE=0     skip the AOT memory probe before fit 1
  REPRO_EPOCHS=N    epochs per fit (default 3)
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sign_language_nlp_tpu.models.registry import build_model  # noqa: E402
from sign_language_nlp_tpu.training.engine import (  # noqa: E402
    PopulationTrainer, TrainConfig, TrainTask)

P = int(os.environ.get("REPRO_P", 4))
EPOCHS = int(os.environ.get("REPRO_EPOCHS", 3))
N = int(os.environ.get("REPRO_N", 64))
S = int(os.environ.get("REPRO_S", 16))
V_SRC = int(os.environ.get("REPRO_VSRC", 50))
V_TGT = int(os.environ.get("REPRO_VTGT", 12))
EMB = int(os.environ.get("REPRO_EMB", 32))
LAYERS = int(os.environ.get("REPRO_LAYERS", 1))
HEADS = int(os.environ.get("REPRO_HEADS", 2))
BATCH = int(os.environ.get("REPRO_BATCH", 8))

rng = np.random.default_rng(0)
tokens = rng.integers(2, V_SRC, size=(N, S)).astype(np.int32)
lengths = rng.integers(4, S + 1, size=(N,)).astype(np.int32)
labels = rng.integers(2, V_TGT, size=(N,)).astype(np.int32)
data = (tokens, lengths, labels)

model = build_model(
    "model.Transformer", src_vocab_size=V_SRC, tgt_vocab_size=V_TGT,
    src_pad_idx=1, tgt_pad_idx=1,
    model_args={"embedding_size": EMB, "hidden_size": EMB,
                "num_layers": LAYERS, "dropout": 0.1,
                "num_heads": HEADS})

cfg = TrainConfig(max_epochs=EPOCHS, batch_size=BATCH,
                  eval_batch_size=BATCH,
                  seed=1, verbose=2, keep_best_params=False,
                  compact=False)
trainer = PopulationTrainer(model, tgt_pad_idx=1, num_classes=V_TGT,
                            config=cfg)

N_TR = (N * 3) // 4
N_VA = N - N_TR


def make_task(seed_off):
    rows = np.arange(N)
    tr = [rows[:N_TR]] * P
    va = [rows[N_TR:]] * P
    return TrainTask(train_rows=tr, valid_rows=va,
                     lr=np.full(P, 0.05, np.float32),
                     dropout=np.full(P, 0.1, np.float32),
                     seed_ids=np.arange(P) + seed_off,
                     pad_rows_to=(N_TR, N_VA))


if os.environ.get("REPRO_PROBE", "1") == "1":
    m = trainer.epoch_memory_bytes(N, S, make_task(0))
    print(f"probe bytes: {m}", file=sys.stderr)

def live_mb():
    return sum(a.nbytes for a in jax.live_arrays()) / 1e6


out1 = trainer.fit(data, make_task(0))
print(f"fit 1 OK (live {live_mb():.0f} MB)", file=sys.stderr)

if os.environ.get("REPRO_SINGLE", "0") == "1":
    print("SINGLE FIT PASSED")
    sys.exit(0)

if os.environ.get("REPRO_PREDICT", "1") == "1":
    lp, w = trainer.predict_log_probs(out1["params"], data,
                                      [np.arange(16)] * P)
    print(f"predict OK {np.asarray(lp).shape} (live {live_mb():.0f} MB)",
          file=sys.stderr)
    del lp, w

if os.environ.get("REPRO_DELETE", "0") == "1":
    from sign_language_nlp_tpu.search.driver import _delete_device_tree

    _delete_device_tree(out1)
del out1
print(f"before fit 2: live {live_mb():.0f} MB "
      f"({len(jax.live_arrays())} arrays)", file=sys.stderr)

out2 = trainer.fit(data, make_task(100))
print(f"fit 2 OK (live {live_mb():.0f} MB)", file=sys.stderr)
print("DOUBLE FIT PASSED")
