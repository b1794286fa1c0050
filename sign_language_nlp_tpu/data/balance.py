"""Smoothed class balancing: under-sample majorities, over-sample
minorities toward round(mean + ln(count)).

NumPy re-implementation of the reference's imbalanced-learn pipeline
(reference helper.py:344-388): with u = mean of the original class
counts,

  under target(v) = min(v, round(u + ln(v)))   [helper.py:356-364, sign=-1]
  over  target(v) = max(v', round(u + ln(v'))) [same, sign=+1, v' = under]

then sample without replacement down to the under target and with
replacement up to the over target. Python's round() (banker's rounding)
is used, matching the reference. The imblearn index-selection RNG stream
is not reproduced; selection here is a seeded NumPy choice.
"""
from __future__ import annotations

import math

import numpy as np

from .dataset import AslDataset


def _smooth(v: int, u: float, sign: int) -> int:
    tmp = round(u + math.log(v))
    return v if (v * sign) > (tmp * sign) else tmp


def compute_sampling(counts: dict, u: float, mode: str = "under") -> dict:
    signs = {"under": -1, "over": +1}
    assert mode in signs, "Invalid mode"
    sign = signs[mode]
    return {k: _smooth(v, u, sign) for k, v in counts.items()}


def balance_dataset(dataset: AslDataset, seed: int) -> AslDataset:
    y = dataset.labels_idx
    classes, counts = np.unique(y, return_counts=True)
    original = {int(c): int(n) for c, n in zip(classes, counts)}
    u = float(np.mean(list(original.values())))

    under = compute_sampling(original, u, "under")
    over = compute_sampling(under, u, "over")

    rng = np.random.default_rng(seed)
    keep: list[np.ndarray] = []
    for cls in classes:
        cls = int(cls)
        idx = np.nonzero(y == cls)[0]
        # Under-sample without replacement:
        if under[cls] < len(idx):
            idx = rng.choice(idx, size=under[cls], replace=False)
        # Over-sample (duplicate) with replacement up to the over target:
        if over[cls] > len(idx):
            extra = rng.choice(idx, size=over[cls] - len(idx), replace=True)
            idx = np.concatenate([idx, extra])
        keep.append(idx)

    indices = np.concatenate(keep)
    return dataset.select(indices)
