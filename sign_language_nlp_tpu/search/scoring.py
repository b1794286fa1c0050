"""Scoring wrappers — the sklearn-scorer adaptation layer.

Parity with the reference's `ScoringWrapper` (helper.py:529-554):
injects `labels` (the FULL target vocab incl. specials) for
neg_log_loss, `zero_division=0` for P/R/F1, exposes `.score` and
`.greater_is_better`, and is callable on predictions. Here a scorer
consumes the model's log-prob outputs directly (argmax for class
metrics, softmax for probability metrics) instead of re-driving an
estimator.
"""
from __future__ import annotations

import numpy as np

from ..ops import metrics as M


class ScoringWrapper:
    def __init__(self, score_func: str, labels=None):
        M.resolve_metric(score_func)  # validate name
        self._score_func = score_func
        self.labels = labels

    def __call__(self, log_probs: np.ndarray, y_true: np.ndarray,
                 sample_weight: np.ndarray | None = None) -> float:
        """log_probs: [N, V] model outputs; y_true: [N]."""
        import jax.numpy as jnp

        log_probs = jnp.asarray(log_probs)
        y_true = jnp.asarray(y_true).astype(jnp.int32)
        num_classes = log_probs.shape[-1]
        if self.labels is not None:
            assert num_classes == len(self.labels), (
                "label set must span the model's output classes")
        fn, needs_probs, _ = M.resolve_metric(self._score_func)
        if needs_probs:
            # skorch predict_proba == softmax over the (log-prob) output.
            probs = jnp.exp(jnp.asarray(log_probs)
                            - jnp.max(log_probs, -1, keepdims=True))
            probs = probs / jnp.sum(probs, -1, keepdims=True)
            return float(fn(y_true, probs, sample_weight=sample_weight))
        y_pred = jnp.argmax(log_probs, axis=-1)
        if self._score_func == "accuracy":
            return float(fn(y_true, y_pred, sample_weight=sample_weight))
        return float(fn(y_true, y_pred, num_classes=num_classes,
                        sample_weight=sample_weight))

    def __repr__(self) -> str:
        return f"{type(self).__name__}('{self._score_func}')"

    @property
    def greater_is_better(self) -> bool:
        return M.greater_is_better(self._score_func)

    @property
    def score(self) -> str:
        return self._score_func


def build_scoring(scoring, labels=None, allow_multiple: bool = True):
    if not isinstance(scoring, list):
        scoring = [scoring]
    wrappers = [ScoringWrapper(s, labels) for s in scoring]
    if not allow_multiple:
        return wrappers[0]
    return wrappers
