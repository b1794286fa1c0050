"""Parameter-grid construction and enumeration.

Mirrors the reference's grid plumbing for artifact parity:
  * the flattened `prefix__key` param-grid namespace built from
    `grid_args` — `module__*` from model_args, `optimizer__*`,
    `criterion__*`, `callbacks__*`, bare keys like `lr`
    (reference helper.py:108-180);
  * `save_param_grid` writes the full cross-product CSV enumerated over
    the grid dict's insertion order (reference helper.py:415-426);
  * candidates for the search itself enumerate sklearn-ParameterGrid
    style — sorted keys, last key varying fastest — so result rows and
    `rank_test_score` line up with a GridSearchCV run.
"""
from __future__ import annotations

import itertools
from typing import Iterator

from ..config.namespace import prefix_args
from ..utils import log


class ParamGrid:
    """An ordered mapping name → list of values."""

    def __init__(self, grid: dict):
        self.grid = {k: (v if isinstance(v, list) else [v])
                     for k, v in grid.items()}

    def __len__(self) -> int:
        n = 1
        for v in self.grid.values():
            n *= len(v)
        return n

    def candidates(self) -> Iterator[dict]:
        """sklearn ParameterGrid iteration order: sorted keys, product
        with the last key's values varying fastest."""
        items = sorted(self.grid.items())
        if not items:
            yield {}
            return
        keys, values = zip(*items)
        for combo in itertools.product(*values):
            yield dict(zip(keys, combo))

    def cross_product_rows(self) -> tuple:
        """(columns, rows) over *insertion* order — the reference's
        grid-params CSV layout (helper.py:420-424)."""
        cols = list(self.grid.keys())
        rows = list(itertools.product(*self.grid.values()))
        return cols, rows


def build_param_grid(grid_args: dict, callbacks_names=(),
                     **kwargs) -> ParamGrid:
    """grid_args (nested: lr / model_args / optimizer_args /
    criterion_args / callback overrides) → flattened ParamGrid
    (reference build_grid_params param_grid assembly,
    helper.py:108-170)."""
    grid_args = dict(grid_args or {})
    model_args = grid_args.pop("model_args", {})
    optimizer_args = grid_args.pop("optimizer_args", {})
    criterion_args = grid_args.pop("criterion_args", {})
    training_args = grid_args.pop("training_args", {})

    callback_keys = set(callbacks_names) | {"print_log"}
    callbacks_args = {k: grid_args.pop(k)
                      for k in list(grid_args) if k in callback_keys}

    out: dict = {}
    out.update(prefix_args("module", ensure_list=True, **model_args))
    out.update(prefix_args("optimizer", ensure_list=True, **optimizer_args))
    out.update(prefix_args("criterion", ensure_list=True, **criterion_args))
    out.update(prefix_args("callbacks", ensure_list=True, **callbacks_args))
    out.update(prefix_args(None, ensure_list=True, **training_args))
    out.update(prefix_args(None, ensure_list=True, **grid_args))
    return ParamGrid(out)


def save_param_grid(grid: ParamGrid, phase: str, workdir: str,
                    **kwargs) -> None:
    """Write `<workdir>/<phase>_grid_params.csv` — the enumerated
    cross-product with a leading index column (reference
    helper.py:415-426 via pandas to_csv)."""
    import pandas as pd

    from ..utils import create_if_missing

    log("Saving grid params...")
    create_if_missing(workdir)
    cols, rows = grid.cross_product_rows()
    df = pd.DataFrame(rows, columns=cols)
    df.to_csv(f"{workdir}/{phase}_grid_params.csv")


def candidate_to_nested(candidate: dict) -> dict:
    """Flattened candidate → {"lr": ..., "model_args": {...},
    "optimizer_args": {...}, "criterion_args": {...}} for the engine."""
    nested: dict = {"model_args": {}, "optimizer_args": {},
                    "criterion_args": {}, "callbacks_args": {}}
    for key, value in candidate.items():
        if key.startswith("module__"):
            nested["model_args"][key[len("module__"):]] = value
        elif key.startswith("optimizer__"):
            nested["optimizer_args"][key[len("optimizer__"):]] = value
        elif key.startswith("criterion__"):
            nested["criterion_args"][key[len("criterion__"):]] = value
        elif key.startswith("callbacks__"):
            nested["callbacks_args"][key[len("callbacks__"):]] = value
        else:
            nested[key] = value
    return nested


def enumerate_candidates(grid: ParamGrid) -> list:
    return list(grid.candidates())
