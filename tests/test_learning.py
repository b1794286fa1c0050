"""Learnability: the Transformer family must actually learn a separable
sign-classification task through the full engine (not just run)."""
import numpy as np
import pytest

from sign_language_nlp_tpu.models.registry import build_model
from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                   TrainConfig, TrainTask)
from tests.test_training import _toy_data


@pytest.mark.slow
def test_transformer_learns_toy_task():
    data, labels = _toy_data(n=96, seq=12, vocab=16, classes=4)
    # tgt_input='bos' so predictions can't lean on the label-leak quirk.
    model = build_model("model.Transformer", 16, 8, 1, 1,
                        model_args={"embedding_size": 16,
                                    "hidden_size": 32, "num_layers": 1,
                                    "num_heads": 4, "dropout": 0.0},
                        compat_args={"tgt_input": "bos"})
    cfg = TrainConfig(batch_size=16, max_epochs=25, seed=0, verbose=0,
                      optimizer_args={"momentum": 0.9},
                      scoring=("accuracy",))
    trainer = PopulationTrainer(model, 1, 8, cfg)
    rows = np.arange(len(labels))
    # Two cells with different learning rates; at least one must learn
    # the separable task (init sensitivity varies per cell).
    task = TrainTask(train_rows=[rows[:72]] * 2, valid_rows=[rows[72:]] * 2,
                     lr=np.array([0.2, 0.05], np.float32),
                     dropout=np.array([0.0, 0.0], np.float32))
    out = trainer.fit(data, task)
    acc = out["history"]["valid_accuracy"][-1].max()
    assert acc > 0.9, f"transformer failed to learn (best valid acc {acc})"


def test_bf16_transformer_trains_finite():
    data, labels = _toy_data(n=32, seq=8, vocab=12, classes=4)
    model = build_model("model.Transformer", 12, 8, 1, 1,
                        model_args={"embedding_size": 16,
                                    "hidden_size": 16, "num_layers": 1,
                                    "num_heads": 2, "dropout": 0.1},
                        precision_args={"compute_dtype": "bfloat16"})
    assert str(model.dtype) == "bfloat16"
    cfg = TrainConfig(batch_size=16, max_epochs=2, seed=0, verbose=0,
                      scoring=("accuracy",))
    trainer = PopulationTrainer(model, 1, 8, cfg)
    rows = np.arange(len(labels))
    task = TrainTask(train_rows=[rows[:24]], valid_rows=[rows[24:]],
                     lr=np.array([0.1], np.float32),
                     dropout=np.array([0.1], np.float32))
    out = trainer.fit(data, task)
    assert np.isfinite(out["history"]["valid_loss"]).all()


@pytest.mark.parametrize("name", ["model.EncoderDecoderLSTMAttn",
                                  "model.EncoderDecoderGRUAttn"])
def test_bf16_rnn_trains_finite(name):
    # Regression: under a bfloat16 policy the f32 cell params used to
    # promote the scan body to f32 while the carry initialized as bf16,
    # crashing lax.scan on the carry dtype mismatch (caught by the
    # round-4 CPU smoke of the RNN full-grid harness).
    data, labels = _toy_data(n=32, seq=8, vocab=12, classes=4)
    model = build_model(name, 12, 8, 1, 1,
                        model_args={"embedding_size": 8, "hidden_size": 8,
                                    "num_layers": 2, "dropout": 0.1},
                        precision_args={"compute_dtype": "bfloat16"})
    assert str(model.dtype) == "bfloat16"
    cfg = TrainConfig(batch_size=16, max_epochs=2, seed=0, verbose=0,
                      scoring=("accuracy",))
    trainer = PopulationTrainer(model, 1, 8, cfg)
    rows = np.arange(len(labels))
    task = TrainTask(train_rows=[rows[:24]], valid_rows=[rows[24:]],
                     lr=np.array([0.1], np.float32),
                     dropout=np.array([0.1], np.float32))
    out = trainer.fit(data, task)
    assert np.isfinite(out["history"]["valid_loss"]).all()


@pytest.mark.slow
def test_lstm_learns_toy_task():
    data, labels = _toy_data(n=64, seq=8, vocab=12, classes=4)
    model = build_model("model.EncoderDecoderLSTMAttn", 12, 8, 1, 1,
                        model_args={"embedding_size": 8, "hidden_size": 8,
                                    "num_layers": 1, "dropout": 0.0})
    cfg = TrainConfig(batch_size=16, max_epochs=15, seed=0, verbose=0,
                      optimizer_args={"momentum": 0.9},
                      scoring=("accuracy",))
    trainer = PopulationTrainer(model, 1, 8, cfg)
    rows = np.arange(len(labels))
    task = TrainTask(train_rows=[rows[:48]], valid_rows=[rows[48:]],
                     lr=np.array([0.5], np.float32),
                     dropout=np.array([0.0], np.float32))
    out = trainer.fit(data, task)
    assert out["history"]["valid_accuracy"][-1][0] > 0.9
