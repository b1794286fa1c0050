"""Hyperparameter search: grid enumeration, stratified K-fold CV, and
the sharded population search driver.

Replaces the reference's L3 stack — sklearn `GridSearchCV` over a skorch
estimator with joblib→Dask task farming (reference main.py:62-95,
helper.py:108-180,490-526) — with a driver that stacks (candidate ×
fold) cells along a vmapped population axis and trains them as sharded
batches on the mesh (SURVEY.md §7 phase 5).
"""
from .kfold import stratified_kfold, train_valid_split
from .grid import (ParamGrid, build_param_grid, enumerate_candidates,
                   save_param_grid)
from .scoring import ScoringWrapper, build_scoring
from .driver import GridSearchDriver, SearchResult

__all__ = [
    "stratified_kfold",
    "train_valid_split",
    "ParamGrid",
    "build_param_grid",
    "enumerate_candidates",
    "save_param_grid",
    "ScoringWrapper",
    "build_scoring",
    "GridSearchDriver",
    "SearchResult",
]
