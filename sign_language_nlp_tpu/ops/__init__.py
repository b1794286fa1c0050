"""Compute ops: functional dropout, multi-head attention (XLA + Pallas
paths), losses, and sklearn-exact metrics in pure JAX."""
from .dropout import dropout
from .attention import multi_head_attention
from .losses import cross_entropy_loss, nll_loss, resolve_criterion
from .metrics import (accuracy, f1_weighted, log_loss, precision_weighted,
                      recall_weighted, resolve_metric, METRICS,
                      greater_is_better)

__all__ = [
    "dropout",
    "multi_head_attention",
    "cross_entropy_loss",
    "nll_loss",
    "resolve_criterion",
    "accuracy",
    "precision_weighted",
    "recall_weighted",
    "f1_weighted",
    "log_loss",
    "resolve_metric",
    "greater_is_better",
    "METRICS",
]
