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


def test_plateau_matches_torch_scheduler():
    """Our per-cell ReduceLROnPlateau must track torch's exactly over an
    arbitrary loss sequence (factor/patience/threshold semantics)."""
    import torch

    losses = [1.0, 0.99, 0.995, 0.99, 0.99, 0.99, 0.99, 0.99, 0.99,
              0.5, 0.51, 0.52, 0.50, 0.50, 0.50, 0.50, 0.50, 0.49]
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.2, patience=3, threshold=1e-4,
        threshold_mode="rel")
    st = init_monitor_state(jnp.array([1.0]))
    plateau = PlateauConfig(factor=0.2, patience=3, threshold=1e-4,
                            threshold_mode="rel", enabled=True)
    es = EarlyStopConfig(enabled=False)
    torch_lrs, ours_lrs = [], []
    for loss in losses:
        sched.step(loss)
        torch_lrs.append(opt.param_groups[0]["lr"])
        st, _ = update_monitor_state(st, jnp.array([loss]), plateau, es)
        ours_lrs.append(float(st.lr[0]))
    np.testing.assert_allclose(ours_lrs, torch_lrs, rtol=1e-6)


def test_sgd_momentum_matches_torch():
    """The functional SGD must track torch.optim.SGD step-for-step
    (momentum buffer semantics, nesterov variant)."""
    import torch

    from sign_language_nlp_tpu.training.optimizers import resolve_optimizer

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

    for nesterov in (False, True):
        t_w = torch.nn.Parameter(torch.tensor(w0.copy()))
        t_opt = torch.optim.SGD([t_w], lr=0.1, momentum=0.9,
                                nesterov=nesterov)
        update, init = resolve_optimizer(
            "torch.optim.SGD", {"momentum": 0.9, "nesterov": nesterov})
        params = {"w": jnp.asarray(w0)}
        state = init(params)
        for g in grads:
            t_opt.zero_grad()
            t_w.grad = torch.tensor(g)
            t_opt.step()
            params, state = update(params, {"w": jnp.asarray(g)}, state,
                                   jnp.float32(0.1))
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   t_w.detach().numpy(), rtol=1e-5,
                                   atol=1e-6)


def test_grad_clip_matches_torch():
    import torch

    from sign_language_nlp_tpu.training.optimizers import clip_by_global_norm

    rng = np.random.default_rng(1)
    g1 = rng.normal(size=(5, 2)).astype(np.float32) * 3
    g2 = rng.normal(size=(7,)).astype(np.float32) * 3
    t1, t2 = torch.tensor(g1.copy()), torch.tensor(g2.copy())
    torch.nn.utils.clip_grad_norm_([torch.nn.Parameter(torch.zeros(1))], 1.0)
    p1 = torch.nn.Parameter(torch.zeros_like(t1)); p1.grad = t1
    p2 = torch.nn.Parameter(torch.zeros_like(t2)); p2.grad = t2
    torch.nn.utils.clip_grad_norm_([p1, p2], max_norm=0.5)
    ours = clip_by_global_norm({"a": jnp.asarray(g1), "b": jnp.asarray(g2)},
                               0.5)
    np.testing.assert_allclose(np.asarray(ours["a"]), p1.grad.numpy(),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["b"]), p2.grad.numpy(),
                               rtol=1e-4)


def test_adam_and_adamw_match_torch():
    """adam = coupled-L2 Adam; adamw = torch.optim.AdamW's DECOUPLED
    decay (p *= 1 - lr*wd outside the moment update) — a config asking
    for AdamW must get AdamW dynamics (advisor finding r1)."""
    import torch

    from sign_language_nlp_tpu.training.optimizers import resolve_optimizer

    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(6)]

    for name, t_cls in (("torch.optim.Adam", torch.optim.Adam),
                        ("torch.optim.AdamW", torch.optim.AdamW)):
        t_w = torch.nn.Parameter(torch.tensor(w0.copy()))
        t_opt = t_cls([t_w], lr=0.05, weight_decay=0.1)
        update, init = resolve_optimizer(name, {"weight_decay": 0.1})
        params = {"w": jnp.asarray(w0)}
        state = init(params)
        for g in grads:
            t_opt.zero_grad()
            t_w.grad = torch.tensor(g)
            t_opt.step()
            params, state = update(params, {"w": jnp.asarray(g)}, state,
                                   jnp.float32(0.05))
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   t_w.detach().numpy(), rtol=1e-4,
                                   atol=1e-5, err_msg=name)
    # The two must actually differ (decoupled vs coupled):
    upd_a, init_a = resolve_optimizer("torch.optim.Adam",
                                      {"weight_decay": 0.1})
    upd_w, _ = resolve_optimizer("torch.optim.AdamW", {"weight_decay": 0.1})
    p = {"w": jnp.asarray(w0)}
    pa, _ = upd_a(p, {"w": jnp.asarray(grads[0])}, init_a(p),
                  jnp.float32(0.05))
    pw, _ = upd_w(p, {"w": jnp.asarray(grads[0])}, init_a(p),
                  jnp.float32(0.05))
    assert not np.allclose(np.asarray(pa["w"]), np.asarray(pw["w"]))
