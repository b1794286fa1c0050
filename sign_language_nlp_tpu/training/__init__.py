"""Training engine — the skorch replacement (reference L4, SURVEY.md §1).

The engine trains a *population* of independent fits as one jitted,
vmapped, mesh-sharded program: the population axis carries the grid's
(candidate × fold) cells (SURVEY.md §7 design stance). A single fit is
just a population of one.

Pieces:
  optimizers.py — functional SGD(+momentum/nesterov)/Adam with
                  *per-cell* learning rates (torch.optim parity)
  schedule.py   — ReduceLROnPlateau + EarlyStopping + best-checkpoint
                  tracking as per-cell lax-friendly state
  engine.py     — the population trainer: batched epoch scan, masked
                  updates for stopped cells, per-epoch metric history
"""
from .engine import (PopulationTrainer, TrainTask, predict_log_probs)
from .optimizers import init_opt_state, resolve_optimizer
from .schedule import (EarlyStopConfig, PlateauConfig, init_monitor_state,
                       update_monitor_state)

__all__ = [
    "PopulationTrainer",
    "TrainTask",
    "predict_log_probs",
    "resolve_optimizer",
    "init_opt_state",
    "PlateauConfig",
    "EarlyStopConfig",
    "init_monitor_state",
    "update_monitor_state",
]
