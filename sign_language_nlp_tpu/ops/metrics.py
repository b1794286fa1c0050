"""Classification metrics with sklearn-exact semantics, in pure JAX.

Replaces the reference's sklearn scorer plumbing (`ScoringWrapper`,
reference helper.py:529-554): the parity set is accuracy,
precision_weighted / recall_weighted / f1_weighted with
`zero_division=0` (helper.py:540), and neg_log_loss computed over the
*full* label set including `<unk>`/`<pad>` (helper.py:536 +
asl_dataset.py:210-213 `labels()` behavior).

All functions are jit/vmap-friendly: fixed-shape inputs, optional
`sample_weight` so padded evaluation rows can be masked out inside a
vmapped population (weight 0 ≡ row absent).

Verified against sklearn in tests/test_metrics.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _weights(y_true, sample_weight):
    if sample_weight is None:
        return jnp.ones(y_true.shape, dtype=jnp.float32)
    return sample_weight.astype(jnp.float32)


def accuracy(y_true: jax.Array, y_pred: jax.Array,
             sample_weight: jax.Array | None = None) -> jax.Array:
    w = _weights(y_true, sample_weight)
    hit = (y_true == y_pred).astype(jnp.float32)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)


def _class_counts(y_true, y_pred, num_classes: int, w):
    """Per-class (tp, predicted, actual) weighted counts via one-hot sums."""
    t = jax.nn.one_hot(y_true, num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(y_pred, num_classes, dtype=jnp.float32)
    wcol = w[:, None]
    tp = jnp.sum(t * p * wcol, axis=0)
    pred = jnp.sum(p * wcol, axis=0)
    actual = jnp.sum(t * wcol, axis=0)
    return tp, pred, actual


def _safe_div(num, den):
    """num/den with 0 where den==0 — sklearn's zero_division=0."""
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-38), 0.0)


def precision_weighted(y_true, y_pred, num_classes: int,
                       sample_weight=None) -> jax.Array:
    w = _weights(y_true, sample_weight)
    tp, pred, actual = _class_counts(y_true, y_pred, num_classes, w)
    per_class = _safe_div(tp, pred)
    return jnp.sum(per_class * actual) / jnp.maximum(jnp.sum(actual), 1e-38)


def recall_weighted(y_true, y_pred, num_classes: int,
                    sample_weight=None) -> jax.Array:
    w = _weights(y_true, sample_weight)
    tp, pred, actual = _class_counts(y_true, y_pred, num_classes, w)
    per_class = _safe_div(tp, actual)
    return jnp.sum(per_class * actual) / jnp.maximum(jnp.sum(actual), 1e-38)


def f1_weighted(y_true, y_pred, num_classes: int,
                sample_weight=None) -> jax.Array:
    w = _weights(y_true, sample_weight)
    tp, pred, actual = _class_counts(y_true, y_pred, num_classes, w)
    prec = _safe_div(tp, pred)
    rec = _safe_div(tp, actual)
    f1 = _safe_div(2.0 * prec * rec, prec + rec)
    return jnp.sum(f1 * actual) / jnp.maximum(jnp.sum(actual), 1e-38)


def log_loss(y_true: jax.Array, probs: jax.Array,
             sample_weight=None, eps: float | None = None) -> jax.Array:
    """sklearn.metrics.log_loss over probabilities whose columns span the
    full label set (the reference passes `labels=dataset.labels()` so the
    model's V-way softmax columns line up 1:1, helper.py:536)."""
    w = _weights(y_true, sample_weight)
    if eps is None:
        eps = float(jnp.finfo(probs.dtype).eps)
    p = jnp.clip(probs, eps, 1.0 - eps)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    picked = jnp.take_along_axis(p, y_true[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    return -jnp.sum(jnp.log(picked) * w) / jnp.maximum(jnp.sum(w), 1e-38)


def neg_log_loss(y_true, probs, sample_weight=None) -> jax.Array:
    return -log_loss(y_true, probs, sample_weight=sample_weight)


# --- scorer registry ------------------------------------------------------
# name → (fn, needs_probs, greater_is_better); mirrors sklearn get_scorer
# names used in the reference configs (config-transformer.yaml:9).

METRICS = {
    "accuracy": (accuracy, False, True),
    "precision_weighted": (precision_weighted, False, True),
    "recall_weighted": (recall_weighted, False, True),
    "f1_weighted": (f1_weighted, False, True),
    "neg_log_loss": (neg_log_loss, True, True),
}


def resolve_metric(name: str):
    if name not in METRICS:
        raise ValueError(f"Unknown scoring metric: '{name}' "
                         f"(known: {sorted(METRICS)})")
    return METRICS[name]


def greater_is_better(name: str) -> bool:
    return resolve_metric(name)[2]


# --- streaming sufficient statistics -------------------------------------
# The epoch loop accumulates these per batch (inside lax.scan) instead of
# materializing every prediction; all five parity metrics finalize from
# them. Shapes are per-cell: three [V] count vectors + scalars.


def init_metric_stats(num_classes: int) -> dict:
    z = jnp.zeros((num_classes,), jnp.float32)
    s = jnp.zeros((), jnp.float32)
    return {"tp": z, "pred": z, "actual": z,
            "nll_sum": s, "correct": s, "weight": s, "loss_sum": s}


def update_metric_stats(stats: dict, y_true, log_probs,
                        sample_weight, loss_sum=None) -> dict:
    """Accumulate one batch. `log_probs` [B,V] is the model output;
    predicted class = argmax; probabilities = softmax(log_probs) (the
    skorch predict_nonlinearity='auto' + CrossEntropyLoss convention the
    reference inherits — a softmax over log-softmax outputs)."""
    num_classes = log_probs.shape[-1]
    w = sample_weight.astype(jnp.float32)
    y_pred = jnp.argmax(log_probs, axis=-1)
    t = jax.nn.one_hot(y_true, num_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(y_pred, num_classes, dtype=jnp.float32)
    wcol = w[:, None]

    probs = jax.nn.softmax(log_probs, axis=-1)
    eps = float(jnp.finfo(jnp.float32).eps)
    pc = jnp.clip(probs, eps, 1.0 - eps)
    pc = pc / jnp.sum(pc, axis=-1, keepdims=True)
    picked = jnp.take_along_axis(pc, y_true[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]

    new = {
        "tp": stats["tp"] + jnp.sum(t * p * wcol, axis=0),
        "pred": stats["pred"] + jnp.sum(p * wcol, axis=0),
        "actual": stats["actual"] + jnp.sum(t * wcol, axis=0),
        "nll_sum": stats["nll_sum"] - jnp.sum(jnp.log(picked) * w),
        "correct": stats["correct"]
        + jnp.sum((y_true == y_pred).astype(jnp.float32) * w),
        "weight": stats["weight"] + jnp.sum(w),
        "loss_sum": stats["loss_sum"] + (0.0 if loss_sum is None
                                         else loss_sum),
    }
    return new


def finalize_metric_stats(stats: dict, names) -> dict:
    """Sufficient stats → {metric name: scalar} for the parity set."""
    tp, pred, actual = stats["tp"], stats["pred"], stats["actual"]
    total = jnp.maximum(stats["weight"], 1e-38)
    support = jnp.maximum(jnp.sum(actual), 1e-38)
    prec = _safe_div(tp, pred)
    rec = _safe_div(tp, actual)
    f1 = _safe_div(2.0 * prec * rec, prec + rec)
    all_values = {
        "accuracy": stats["correct"] / total,
        "precision_weighted": jnp.sum(prec * actual) / support,
        "recall_weighted": jnp.sum(rec * actual) / support,
        "f1_weighted": jnp.sum(f1 * actual) / support,
        "neg_log_loss": -stats["nll_sum"] / total,
        "loss": stats["loss_sum"] / total,
    }
    return {n: all_values[n] for n in names}


def compute_metric(name: str, *, y_true, y_pred=None, probs=None,
                   num_classes=None, sample_weight=None):
    fn, needs_probs, _ = resolve_metric(name)
    if needs_probs:
        return fn(y_true, probs, sample_weight=sample_weight)
    if name == "accuracy":
        return fn(y_true, y_pred, sample_weight=sample_weight)
    return fn(y_true, y_pred, num_classes=num_classes,
              sample_weight=sample_weight)
