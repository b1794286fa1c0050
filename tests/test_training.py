"""Population-trainer behavior: learning on separable data, early
stopping, plateau LR decay, schedule-state unit semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from sign_language_nlp_tpu.models.registry import build_model
from sign_language_nlp_tpu.training import (EarlyStopConfig, PlateauConfig,
                                            init_monitor_state,
                                            update_monitor_state)
from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                   TrainConfig, TrainTask)


def _toy_data(n=64, seq=8, vocab=12, classes=4, seed=0):
    """Separable: class c's rows are filled with token 2+c."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, n).astype(np.int32)
    tokens = np.full((n, seq), 1, np.int32)
    lengths = rng.integers(3, seq + 1, n).astype(np.int32)
    for i in range(n):
        tokens[i, :lengths[i]] = 2 + y[i]
    labels = (y + 2).astype(np.int32)  # leave room for specials 0/1
    return (tokens, lengths, labels), labels


# ----------------------------------------------------------- unit: schedule
def test_plateau_reduces_lr_after_patience():
    st = init_monitor_state(jnp.array([1.0, 1.0]))
    plateau = PlateauConfig(factor=0.5, patience=1, enabled=True)
    es = EarlyStopConfig(enabled=False)
    # Epoch 1: loss 1.0 improves over inf.
    st, _ = update_monitor_state(st, jnp.array([1.0, 1.0]), plateau, es)
    # Cell 0 stalls; cell 1 keeps improving.
    for loss1 in (0.9, 0.8, 0.7):
        st, _ = update_monitor_state(st, jnp.array([1.0, loss1]), plateau,
                                     es)
    assert float(st.lr[0]) == pytest.approx(0.5)  # reduced once (bad>1)
    assert float(st.lr[1]) == pytest.approx(1.0)  # never reduced


def test_early_stop_counts_consecutive_misses():
    st = init_monitor_state(jnp.array([1.0]))
    plateau = PlateauConfig(enabled=False)
    es = EarlyStopConfig(patience=2, threshold=1e-4, enabled=True)
    st, _ = update_monitor_state(st, jnp.array([1.0]), plateau, es)
    assert not bool(st.stopped[0])
    st, _ = update_monitor_state(st, jnp.array([1.0]), plateau, es)  # miss 1
    assert not bool(st.stopped[0])
    st, _ = update_monitor_state(st, jnp.array([1.0]), plateau, es)  # miss 2
    assert bool(st.stopped[0])
    # Once stopped, nothing moves:
    st2, imp = update_monitor_state(st, jnp.array([0.0]), plateau, es)
    assert bool(st2.stopped[0]) and not bool(imp[0])
    assert int(st2.epoch[0]) == int(st.epoch[0])


def test_checkpoint_improved_flags():
    st = init_monitor_state(jnp.array([1.0]))
    plateau = PlateauConfig(enabled=False)
    es = EarlyStopConfig(enabled=False)
    st, imp = update_monitor_state(st, jnp.array([0.5]), plateau, es)
    assert bool(imp[0])
    st, imp = update_monitor_state(st, jnp.array([0.6]), plateau, es)
    assert not bool(imp[0])
    st, imp = update_monitor_state(st, jnp.array([0.4]), plateau, es)
    assert bool(imp[0])


# ------------------------------------------------------- engine integration
@pytest.fixture(scope="module")
def trained():
    data, labels = _toy_data()
    model = build_model("model.EncoderDecoderGRUAttn", 12, 8, 1, 1,
                        model_args={"embedding_size": 8, "hidden_size": 8,
                                    "num_layers": 1, "dropout": 0.0})
    cfg = TrainConfig(batch_size=16, max_epochs=8,
                      optimizer_args={"momentum": 0.9},
                      scoring=("accuracy",), seed=0, verbose=0,
                      early_stopping=None, lr_scheduler=None)
    trainer = PopulationTrainer(model, tgt_pad_idx=1, num_classes=8,
                                config=cfg)
    n = len(labels)
    rows = np.arange(n)
    task = TrainTask(train_rows=[rows[:48], rows[:48]],
                     valid_rows=[rows[48:], rows[48:]],
                     lr=np.array([0.5, 0.001], np.float32),
                     dropout=np.array([0.0, 0.0], np.float32))
    out = trainer.fit(data, task)
    return trainer, model, data, task, out


def test_population_learns(trained):
    _, _, _, _, out = trained
    hist = out["history"]
    # The high-lr cell must learn the separable mapping:
    assert hist["valid_accuracy"][-1][0] > 0.9
    # Loss decreased from first epoch for the learning cell:
    assert hist["valid_loss"][-1][0] < hist["valid_loss"][0][0]
    # History carries both per-cell values distinctly:
    assert hist["valid_loss"].shape[1] == 2


def test_per_cell_lr_vector_distinguishes_cells(trained):
    _, _, _, _, out = trained
    hist = out["history"]
    # lr=0.5 cell should beat lr=0.001 cell on this task within 8 epochs:
    assert hist["valid_accuracy"][-1][0] > hist["valid_accuracy"][-1][1]


def test_predict_matches_history_accuracy(trained):
    trainer, model, data, task, out = trained
    log_probs, w = trainer.predict_log_probs(out["params"], data,
                                             task.valid_rows)
    y = data[2]
    m = int(w[0].sum())
    pred = np.argmax(np.asarray(log_probs[0][:m]), axis=-1)
    acc = float((pred == y[task.valid_rows[0]][:m]).mean())
    np.testing.assert_allclose(acc, out["history"]["valid_accuracy"][-1][0],
                               atol=1e-6)


def test_early_stopping_ends_fit_early():
    data, labels = _toy_data(n=32)
    model = build_model("model.EncoderDecoderGRUAttn", 12, 8, 1, 1,
                        model_args={"embedding_size": 8, "hidden_size": 8,
                                    "num_layers": 1, "dropout": 0.0})
    cfg = TrainConfig(batch_size=16, max_epochs=30,
                      early_stopping={"patience": 2, "threshold": 1e-4,
                                      "threshold_mode": "rel"},
                      scoring=("accuracy",), seed=0, verbose=0)
    trainer = PopulationTrainer(model, 1, 8, cfg)
    rows = np.arange(len(labels))
    # lr=0 → no learning → valid loss flat → stop after patience misses.
    task = TrainTask(train_rows=[rows[:24]], valid_rows=[rows[24:]],
                     lr=np.array([0.0], np.float32),
                     dropout=np.array([0.0], np.float32))
    out = trainer.fit(data, task)
    assert int(out["epochs_run"][0]) < 30
    assert bool(out["monitor"].stopped[0])
