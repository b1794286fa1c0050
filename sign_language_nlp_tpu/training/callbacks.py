"""Callback-surface facade.

The reference assembles a named skorch callback list — checkpoint,
early stopping, gradient clipping, an LR-logging epoch score, an LR
scheduler, and per-metric train/valid epoch scorers (reference
helper.py:197-273) — whose *names* then scope grid overrides like
`callbacks__early_stopping__patience` (helper.py:286-290).

In this engine those behaviors are compiled into the epoch program
(training/schedule.py + engine.py), not runtime objects; this module
preserves the declarative surface: `build_callbacks` returns the same
(callbacks, callbacks_names) pair, where each callback is a (name,
config) descriptor the engine and the grid namespace understand.
"""
from __future__ import annotations

from typing import Optional


def build_callbacks(mode=None, workdir: str | None = None, scoring=None,
                    dataset=None, early_stopping: Optional[dict] = None,
                    gradient_clipping: Optional[dict] = None,
                    lr_scheduler: Optional[dict] = None, **kwargs):
    """Mirror of reference helper.build_callbacks (helper.py:197-273):
    same names, same conditional inclusion, declarative payloads."""
    monitor = "valid"
    callbacks: list = []

    callbacks.append(("checkpoint", {
        "monitor": f"{monitor}_loss_best", "dirname": workdir}))

    if early_stopping:
        callbacks.append(("early_stopping", {
            **early_stopping, "monitor": f"{monitor}_loss",
            "lower_is_better": True}))

    if gradient_clipping:
        callbacks.append(("gradient_clipping", dict(gradient_clipping)))

    # Per-epoch LR logging (the engine's history always records "lr").
    callbacks.append(("lr_scoring", {"name": "lr", "on_train": False}))

    if lr_scheduler:
        callbacks.append(("lr_scheduler", {
            **lr_scheduler, "monitor": f"{monitor}_loss",
            "step_every": "epoch"}))

    if scoring is not None:
        if not isinstance(scoring, list):
            scoring = [scoring]
        from ..ops.metrics import greater_is_better

        for name in scoring:
            callbacks.append((f"score_valid_{name}", {
                "name": f"valid_{name}", "on_train": False,
                "lower_is_better": not greater_is_better(name)}))
            callbacks.append((f"score_train_{name}", {
                "name": f"train_{name}", "on_train": True,
                "lower_is_better": not greater_is_better(name)}))

    callbacks_names = [c[0] for c in callbacks]
    return callbacks, callbacks_names


def apply_callback_overrides(train_config_kwargs: dict,
                             callbacks_args: dict) -> dict:
    """Fold `callbacks__<name>__<key>` grid overrides back into engine
    config (e.g. early_stopping patience) — the runtime counterpart of
    the reference's skorch set_params plumbing."""
    out = dict(train_config_kwargs)
    for key, value in (callbacks_args or {}).items():
        parts = key.split("__")
        if len(parts) != 2:
            continue
        name, field = parts
        target = {"early_stopping": "early_stopping",
                  "gradient_clipping": "gradient_clipping",
                  "lr_scheduler": "lr_scheduler"}.get(name)
        if target:
            cfg = dict(out.get(target) or {})
            cfg[field] = value
            out[target] = cfg
    return out
