"""LSTM learnability probe at the full-shape E2E geometry: a small
population spanning lr {0.5, 0.3, 0.1, 0.03}, stratified split, plus a
train-rows-in-eval-mode accuracy check.

Verdict (TPU v5e, realistic-vocab corpus, 20 epochs): the LSTM family
is healthy — valid acc 0.91 at lr 0.3 (0.50 at lr 0.1), and eval-mode
train accuracy matches the training-mode trajectory, so the
deterministic forward is fine. The zero-metrics LSTM E2E row traced to
hyperparameter sensitivity (the truncated 30-epoch/patience-10 run at
the reference grid's lr<=0.1 on the hard 80k-random-vocab corpus), not
a model defect. Faithful math: forward + init are torch-exact
(tests/test_models.py::test_birnn_matches_torch_packed); the reference
trains this family at max_epochs=200 / patience 30."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

setup_compilation_cache()

from sign_language_nlp_tpu.data.dataset import AslDataset  # noqa: E402
from sign_language_nlp_tpu.models.registry import build_model  # noqa: E402
from sign_language_nlp_tpu.training.engine import (  # noqa: E402
    PopulationTrainer, TrainConfig, TrainTask)

ds = AslDataset.build({
    "dataset_dir": __import__("os").environ.get("PROBE_CORPUS", "work/synth-corpus"),
    "fields": ["orientation_dh", "orientation_ndh", "movement_dh",
               "movement_ndh", "handshape_dh", "handshape_ndh"],
    "samples_min_freq": 2, "composition_strategy": "as_words",
    "reuse_transient": True, "use_native": True})
data = (np.asarray(ds.tokens), np.asarray(ds.lengths),
        np.asarray(ds.labels_idx))
print(f"corpus: {data[0].shape}, vocab {len(ds.src_vocab)}",
      file=sys.stderr)

model = build_model(
    "model.EncoderDecoderLSTMAttn", len(ds.src_vocab), len(ds.tgt_vocab),
    src_pad_idx=1, tgt_pad_idx=1,
    model_args={"embedding_size": 128, "hidden_size": 128,
                "num_layers": 2, "dropout": 0.1})
cfg = TrainConfig(batch_size=50, max_epochs=20, seed=1, verbose=2,
                  optimizer_args={"momentum": 0.9, "nesterov": False},
                  gradient_clipping={"gradient_clip_value": 0.5},
                  scoring=("accuracy",), keep_best_params=False,
                  compact=False)
trainer = PopulationTrainer(model, 1, len(ds.tgt_vocab), cfg)

lrs = np.array([0.5, 0.3, 0.1, 0.03], np.float32)
# STRATIFIED split — the corpus is label-sorted, so a prefix split
# holds out entire classes:
from sign_language_nlp_tpu.search.kfold import train_valid_split  # noqa: E402

tr, va = train_valid_split(data[2], n_splits=5)
task = TrainTask(train_rows=[tr] * 4, valid_rows=[va] * 4,
                 lr=lrs, dropout=np.full(4, 0.1, np.float32))
out = trainer.fit(data, task)
hist = out["history"]
for k in ("train_loss", "train_accuracy", "valid_loss",
          "valid_accuracy"):
    if k in hist:
        print(f"{k} (last 3 epochs):\n{np.asarray(hist[k])[-3:]}",
              file=sys.stderr)
acc = hist["valid_accuracy"][-1]

# Train-row accuracy in EVAL (deterministic) mode — separates "did not
# learn" from "eval-mode forward broken":
lp, w = trainer.predict_log_probs(out["params"], data, [tr[:400]] * 4)
lp = np.asarray(lp)
pred = lp.argmax(-1)
ytr = np.asarray(data[2])[tr[:400]]
eval_train_acc = [(pred[k] == ytr).mean() for k in range(4)]
print({"lrs": lrs.tolist(),
       "final_valid_acc": np.asarray(acc).tolist(),
       "train_acc_eval_mode": [float(a) for a in eval_train_acc]})
