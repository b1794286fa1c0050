"""Full-fit cross-framework A/B: the population engine vs the same
model math written in plain torch — ALL THREE FAMILIES (VERDICT r2
next-round #2: round 2 covered GRU only).

Component parity is bit-exact elsewhere (tests/test_models.py,
tests/test_training.py); this harness converts "components match" into
"FITS match": identical initial weights (copied from torch), identical
data/batch order, SGD+momentum, global-norm clip, ReduceLROnPlateau and
skorch-style early stopping on both sides — the per-epoch train/valid
loss trajectories must agree within float32 tolerance and the two fits
must show identical early-stop behavior.

The torch reference-math models and fit loop live in
scripts/torch_reference.py (shared with the workload-scale A/B,
scripts/run_torch_workload_ab.py). CE loss over log-prob outputs (the
faithful double-log-softmax, SURVEY.md §3.2) on both sides.
"""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.torch_reference import (TorchRNNAttn, TorchTransformer,  # noqa: E402
                                     copy_rnn_params,
                                     copy_transformer_params, torch_fit)
from sign_language_nlp_tpu.models.registry import build_model  # noqa: E402
from sign_language_nlp_tpu.training.engine import (PopulationTrainer,  # noqa: E402
                                                   TrainConfig, TrainTask)

VS, VT, E, H, L = 14, 8, 8, 8, 1
PAD, BOS = 1, 0
BATCH = 16
N_TRAIN, N_VALID = 32, 12
LR = 0.15
ES_PATIENCE = 2
PLATEAU = {"factor": 0.2, "patience": 1, "threshold": 1e-4}
MAX_EPOCHS = 15
CLIP = 0.5
NH, FF = 2, 16  # transformer heads / feed-forward width


def _data(seed=0):
    rng = np.random.default_rng(seed)
    n = N_TRAIN + N_VALID
    y = rng.integers(2, VT, n).astype(np.int32)
    tokens = np.full((n, 10), PAD, np.int32)
    lengths = rng.integers(3, 11, n).astype(np.int32)
    for i in range(n):
        # class signal + noise → learnable but not instantly saturated
        sig = 2 + (y[i] - 2) % (VS - 2)
        row = rng.integers(2, VS, lengths[i])
        row[:: 2] = sig
        tokens[i, :lengths[i]] = row
    return tokens, lengths, y


def _torch_fit(tm, tokens, lengths, y):
    rows = np.arange(N_TRAIN + N_VALID)
    t_train, t_valid, _ = torch_fit(
        tm, tokens, lengths, y, rows[:N_TRAIN], rows[N_TRAIN:],
        lr=LR, batch_size=BATCH, max_epochs=MAX_EPOCHS, clip=CLIP,
        plateau=PLATEAU, es_patience=ES_PATIENCE)
    return t_train, t_valid


def _engine_fit(model, init_params, tokens, lengths, y, lr=LR,
                max_epochs=MAX_EPOCHS):
    cfg = TrainConfig(batch_size=BATCH, max_epochs=max_epochs, seed=0,
                      verbose=0, optimizer_args={"momentum": 0.9},
                      gradient_clipping={"gradient_clip_value": CLIP},
                      lr_scheduler=PLATEAU,
                      early_stopping={"patience": ES_PATIENCE,
                                      "threshold": 1e-4},
                      scoring=("accuracy",), train_deterministic=True)
    trainer = PopulationTrainer(model, PAD, VT, cfg)
    rows = np.arange(N_TRAIN + N_VALID)
    task = TrainTask(train_rows=[rows[:N_TRAIN]],
                     valid_rows=[rows[N_TRAIN:]],
                     lr=np.asarray([lr], np.float32),
                     dropout=np.asarray([0.0], np.float32))
    stacked = jax.tree.map(lambda a: a[None], init_params)
    return trainer.fit((tokens, lengths, y), task, init_params=stacked)


def _compare(out, t_train, t_valid, rtol=2e-3, atol=2e-3,
             max_epochs=MAX_EPOCHS):
    j_train = np.asarray(out["history"]["train_loss"])[:, 0]
    j_valid = np.asarray(out["history"]["valid_loss"])[:, 0]
    stopped = np.asarray(out["history"]["stopped"])[:, 0]

    # Identical early-stop behavior: same stop epoch, or both sides ran
    # to max_epochs without tripping the patience (e.g. the
    # transformer's label-leak task improves monotonically):
    j_stop = int(np.argmax(stopped)) if stopped.any() else len(j_valid) - 1
    t_stop = len(t_valid) - 1
    torch_stopped = len(t_valid) < max_epochs
    assert stopped.any() == torch_stopped, (stopped.any(), torch_stopped)
    assert j_stop == t_stop, (j_stop, t_stop)

    # Loss trajectories agree within float32 drift through the
    # recurrence (both start from the SAME weights):
    k = t_stop + 1
    np.testing.assert_allclose(j_train[:k], t_train[:k], rtol=rtol,
                               atol=atol)
    np.testing.assert_allclose(j_valid[:k], t_valid[:k], rtol=rtol,
                               atol=atol)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_full_fit_matches_torch(cell):
    tokens, lengths, y = _data()
    torch.manual_seed(0)
    tm = TorchRNNAttn(VS, VT, E, H, L, cell=cell, pad=PAD, bos=BOS)
    init_params = copy_rnn_params(tm)

    t_train, t_valid = _torch_fit(tm, tokens, lengths, y)

    model = build_model(f"model.EncoderDecoder{cell.upper()}Attn",
                        VS, VT, PAD, PAD, bos_idx=BOS,
                        model_args={"embedding_size": E, "hidden_size": H,
                                    "num_layers": L, "dropout": 0.0})
    out = _engine_fit(model, init_params, tokens, lengths, y)
    _compare(out, t_train, t_valid)


def test_full_fit_matches_torch_transformer():
    tokens, lengths, y = _data()
    torch.manual_seed(0)
    tm = TorchTransformer(VS, VT, E, NH, L, FF, pad=PAD, bos=BOS)
    init_params = copy_transformer_params(tm)

    t_train, t_valid = _torch_fit(tm, tokens, lengths, y)

    model = build_model("model.Transformer", VS, VT, PAD, PAD,
                        bos_idx=BOS,
                        model_args={"embedding_size": E, "hidden_size": FF,
                                    "num_layers": L, "num_heads": NH,
                                    "dropout": 0.0})
    out = _engine_fit(model, init_params, tokens, lengths, y)
    _compare(out, t_train, t_valid)
