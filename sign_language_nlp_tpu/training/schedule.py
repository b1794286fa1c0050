"""Per-cell monitor state: ReduceLROnPlateau + EarlyStopping + best
checkpoint, as pure array updates.

Replaces the reference's skorch callback stack (reference
helper.py:197-273):
  * `LRScheduler(ReduceLROnPlateau, factor, patience)` stepping on
    valid_loss each epoch (helper.py:241-245) — torch semantics:
    rel-threshold improvement test `metric < best*(1-threshold)`,
    `num_bad > patience` triggers `lr *= factor`, counter resets.
  * `EarlyStopping(patience, threshold, threshold_mode)` on valid_loss
    (helper.py:219-224) — skorch semantics: a miss is an epoch without
    improvement over the *dynamic* threshold; `misses == patience`
    stops the fit.
  * `Checkpoint(monitor='valid_loss_best')` (helper.py:211-212) —
    tracked here as a per-cell improved flag; the engine snapshots
    params where improved.

Everything is elementwise over the population axis, so stopped cells
freeze while live ones continue — lockstep vmap semantics
(SURVEY.md §7 hard part 3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PlateauConfig(NamedTuple):
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    threshold_mode: str = "rel"  # 'rel' | 'abs'
    min_lr: float = 0.0
    enabled: bool = True


class EarlyStopConfig(NamedTuple):
    patience: int = 5
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    enabled: bool = True


class MonitorState(NamedTuple):
    lr: jnp.ndarray            # [P] current learning rate
    plateau_best: jnp.ndarray  # [P] best metric seen by the scheduler
    plateau_bad: jnp.ndarray   # [P] epochs since scheduler improvement
    es_best: jnp.ndarray       # [P] best metric seen by early stopping
    es_misses: jnp.ndarray     # [P] consecutive non-improvements
    ckpt_best: jnp.ndarray     # [P] best metric seen by the checkpoint
    stopped: jnp.ndarray       # [P] bool — cell has early-stopped
    epoch: jnp.ndarray         # [P] epochs actually run (freezes on stop)


def init_monitor_state(lr0: jnp.ndarray) -> MonitorState:
    p = jnp.shape(lr0)

    # Each field gets its OWN buffer — the training engine donates the
    # whole state to the jitted epoch program, and XLA rejects donating
    # one buffer twice.
    def inf():
        return jnp.full(p, jnp.inf, jnp.float32)

    def zeros_i():
        return jnp.zeros(p, jnp.int32)

    return MonitorState(lr=jnp.array(lr0, jnp.float32, copy=True),
                        plateau_best=inf(), plateau_bad=zeros_i(),
                        es_best=inf(), es_misses=zeros_i(),
                        ckpt_best=inf(),
                        stopped=jnp.zeros(p, bool), epoch=zeros_i())


def _improved(metric, best, threshold, mode: str):
    if mode == "rel":
        return metric < best * (1.0 - threshold)
    return metric < best - threshold


def update_monitor_state(state: MonitorState, valid_loss: jnp.ndarray,
                         plateau: PlateauConfig,
                         early_stop: EarlyStopConfig):
    """One end-of-epoch update. Returns (new_state, ckpt_improved [P] bool).

    All updates are gated on `~stopped`: a stopped cell's state (and its
    checkpoint) never changes again, exactly as if its fit had ended.
    """
    live = ~state.stopped

    # --- checkpoint (valid_loss_best, no threshold — skorch Checkpoint) ---
    ckpt_improved = live & (valid_loss < state.ckpt_best)
    ckpt_best = jnp.where(ckpt_improved, valid_loss, state.ckpt_best)

    # --- ReduceLROnPlateau ---
    lr = state.lr
    plateau_best, plateau_bad = state.plateau_best, state.plateau_bad
    if plateau.enabled:
        imp = _improved(valid_loss, plateau_best, plateau.threshold,
                        plateau.threshold_mode)
        plateau_best = jnp.where(live & imp, valid_loss, plateau_best)
        plateau_bad = jnp.where(live,
                                jnp.where(imp, 0, plateau_bad + 1),
                                plateau_bad)
        reduce = live & (plateau_bad > plateau.patience)
        lr = jnp.where(reduce,
                       jnp.maximum(lr * plateau.factor, plateau.min_lr), lr)
        plateau_bad = jnp.where(reduce, 0, plateau_bad)

    # --- EarlyStopping ---
    es_best, es_misses, stopped = (state.es_best, state.es_misses,
                                   state.stopped)
    if early_stop.enabled:
        imp = _improved(valid_loss, es_best, early_stop.threshold,
                        early_stop.threshold_mode)
        es_best = jnp.where(live & imp, valid_loss, es_best)
        es_misses = jnp.where(live, jnp.where(imp, 0, es_misses + 1),
                              es_misses)
        stopped = stopped | (live & (es_misses >= early_stop.patience))

    epoch = jnp.where(live, state.epoch + 1, state.epoch)
    new_state = MonitorState(lr=lr, plateau_best=plateau_best,
                             plateau_bad=plateau_bad, es_best=es_best,
                             es_misses=es_misses, ckpt_best=ckpt_best,
                             stopped=stopped, epoch=epoch)
    return new_state, ckpt_improved
