"""The framework's argument schema.

Mirrors the reference's 25-argument surface one-for-one (reference
args.py:3-53) so existing config YAMLs drive this framework unchanged,
plus TPU-native additions (mesh shape, dtype policy) that default off.

`dask_args` is accepted for config compatibility but maps onto the
TPU execution backend (`parallel/`): there is no Dask here — the grid's
(candidate × fold) axis is executed as a sharded population on the mesh.
"""
from .arguments import Argument

ARGUMENTS = [
    Argument('-m', '--model', help='Model class (dotted path or short name)'),
    Argument('-o', '--optimizer', help='Optimizer (dotted path or name)'),
    Argument('-f', '--criterion', help='Criterion (dotted path or name)'),
    Argument('-cv', '--cv', type=int, help='Number of CV folds'),
    Argument('-sc', '--scoring', type=list, help='Scoring metric(s)'),
    Argument('-vb', '--verbose', type=int, default=1, help='Verbosity level'),
    Argument('-j', '--n_jobs', type=int, default=1, help='Number of jobs'),
    Argument('-n', '--mode', options=["grid", "train"], help='Mode'),
    Argument('-w', '--workdir', help='Working directory (templated)'),
    Argument('-d', '--debug', type=bool, default=False, help='Debug flag'),
    Argument('-nv', '--cuda', type=bool, default=False,
             help='Accepted for config parity; device choice is automatic '
                  '(TPU when present, else CPU)'),
    Argument('-k', '--seed', type=int, required=True, help='Seed'),
    Argument('-lr', '--lr', type=float, help='Learning rate'),
    Argument('-ep', '--max_epochs', type=int, required=True,
             help='Max epochs'),
    Argument('-bs', '--batch_size', type=int, required=True,
             help='Batch size'),
    Argument('-ts', '--test_size', type=float, required=True,
             help='Test size'),
    Argument('-es', '--early_stopping', type=dict,
             help='Options for early stopping'),
    Argument('-gcl', '--gradient_clipping', type=dict,
             help='Options for gradient clipping'),
    Argument('-lrs', '--lr_scheduler', type=dict,
             help='Options for learning rate scheduler'),
    Argument('-ds', '--dataset_args', type=dict,
             help='Options for the dataset'),
    Argument('-ma', '--model_args', type=dict, help='Options for the model'),
    Argument('-oa', '--optimizer_args', type=dict,
             help='Options for the optimizer'),
    Argument('-ca', '--criterion_args', type=dict,
             help='Options for the criterion'),
    Argument('-gr', '--grid_args', type=dict,
             help='Options for the grid search'),
    Argument('-dask', '--dask_args', type=dict, default={},
             help='Accepted for config parity; execution is TPU-mesh '
                  'population sharding, not Dask'),
    # --- TPU-native additions (absent in reference) ---
    Argument('-mesh', '--mesh_args', type=dict, default={},
             help='Device mesh options: {"axis": "grid", "devices": N}'),
    Argument('-prec', '--precision_args', type=dict, default={},
             help='Dtype policy: {"compute_dtype": "bfloat16", ...}'),
    Argument('-compat', '--compat_args', type=dict, default={},
             help='Reference-quirk compatibility flags (see models/)'),
    Argument('-train', '--train_args', type=dict, default={},
             help='Engine knobs: {"length_bucketing": bool, "remat": '
                  'bool, "compact": bool, "compact_granularity": int, '
                  '"shuffle": bool, "shuffle_device": bool, '
                  '"bucket_percentile": float, '
                  '"bucket_percentiles": [float, ...] | "auto"}'),
]
