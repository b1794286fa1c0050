"""Benchmark: population-batched grid training vs sequential single-fit
training on the same device.

The reference executes its hyperparameter grid as a queue of independent
single-device fits (one skorch fit per Dask task, reference main.py:77,
helper.py:490-526). This framework's thesis is that on TPU those fits
should be *stacked along a vmapped population axis* and trained as one
program (SURVEY.md §7). This benchmark measures exactly that inversion
on one chip:

  * workload: an ASL-Phono-shaped synthetic corpus (vocab/classes/
    sequence-length/batch-size of the reference configs) and the
    reference's Transformer grid-point geometry;
  * baseline: P sequential one-cell fits (what a per-task executor
    does on this same chip);
  * measured: one P-cell population fit.

Prints ONE JSON line:
  {"metric": "population_speedup", "value": <x>, "unit": "x",
   "vs_baseline": <x>}   — value == speedup over the sequential
                           baseline measured in the same run.

Environment knobs: BENCH_POP (population size, default 16),
BENCH_EPOCHS (timed epochs, default 2), BENCH_SMALL=1 (tiny shapes for
CPU smoke runs).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_workload(small: bool):
    rng = np.random.default_rng(0)
    if small:
        n, seq, vs, vt = 128, 16, 64, 10
        margs = {"embedding_size": 32, "hidden_size": 32,
                 "num_layers": 1, "num_heads": 2, "dropout": 0.1}
    else:
        # ASL-Phono-shaped: ~2-3k samples, few hundred frames max,
        # src vocab ~1-2k composed tokens, ~200 sign classes; model =
        # a mid grid point of config-transformer.yaml:46-53.
        n, seq, vs, vt = 2048, 64, 1024, 200
        margs = {"embedding_size": 256, "hidden_size": 256,
                 "num_layers": 2, "num_heads": 8, "dropout": 0.1}
    tokens = rng.integers(2, vs, (n, seq)).astype(np.int32)
    lengths = rng.integers(seq // 4, seq + 1, n).astype(np.int32)
    for i in range(n):
        tokens[i, lengths[i]:] = 1
    labels = rng.integers(2, vt, n).astype(np.int32)
    return (tokens, lengths, labels), vs, vt, margs


def main() -> None:
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    import jax

    # Hardware RNG for dropout bits: measured ~10% step-time saving over
    # threefry on this workload (scripts/bench_attribution.py).
    if os.environ.get("BENCH_RNG", "rbg") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                       TrainConfig,
                                                       TrainTask)

    small = os.environ.get("BENCH_SMALL") == "1"
    P = int(os.environ.get("BENCH_POP", 4 if small else 64))
    epochs = int(os.environ.get("BENCH_EPOCHS", 2))
    log(f"device: {jax.devices()[0]}, population={P}, epochs={epochs}, "
        f"small={small}")

    data, vs, vt, margs = make_workload(small)
    n = len(data[2])
    rows = np.arange(n)
    tr, va = rows[: int(n * 0.8)], rows[int(n * 0.8):]

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = build_model("model.Transformer", vs, vt, 1, 1,
                        model_args=margs,
                        precision_args={"compute_dtype": dtype})
    cfg = TrainConfig(batch_size=50, max_epochs=epochs, seed=0, verbose=0,
                      optimizer_args={"momentum": 0.9},
                      gradient_clipping={"gradient_clip_value": 0.5},
                      scoring=("accuracy",), keep_best_params=False,
                      remat=os.environ.get("BENCH_REMAT") == "1")
    trainer = PopulationTrainer(model, 1, vt, cfg)

    rng = np.random.default_rng(1)
    lrs = rng.uniform(0.001, 0.1, P).astype(np.float32)
    drops = rng.choice([0.1, 0.5], P).astype(np.float32)

    def fit(p_slice, max_epochs):
        cfg_local = trainer.config
        trainer.config = TrainConfig(**{**cfg_local.__dict__,
                                        "max_epochs": max_epochs})
        task = TrainTask(train_rows=[tr] * len(p_slice),
                         valid_rows=[va] * len(p_slice),
                         lr=lrs[list(p_slice)], dropout=drops[list(p_slice)])
        out = trainer.fit(data, task)
        trainer.config = cfg_local
        jax.block_until_ready(out["params"])
        return out

    # --- warm up compiles (population and single-cell programs) ---
    log("warmup (compiling)...")
    fit(range(P), 1)
    fit(range(1), 1)

    # --- measured: median-of-5 population fits (BENCH_r03 carried a
    # 19.2% rep spread from one tunnel-hiccup outlier among 3 reps;
    # 5 reps make the median and the reported spread robust to one) ---
    reps = int(os.environ.get("BENCH_REPS", 5))
    t_pops = []
    for r in range(reps):
        t0 = time.time()
        fit(range(P), epochs)
        t_pops.append(time.time() - t0)
        log(f"population fit ({P} cells x {epochs} epochs) "
            f"rep {r + 1}/{reps}: {t_pops[-1]:.2f}s")
    t_pop = float(np.median(t_pops))
    spread = (max(t_pops) - min(t_pops)) / t_pop

    # --- baseline: sequential single fits (reference execution model) ---
    n_seq = min(P, int(os.environ.get("BENCH_NSEQ", 8)))
    t_cells = []
    for k in range(n_seq):
        t0 = time.time()
        fit(range(k, k + 1), epochs)
        t_cells.append(time.time() - t0)
    t_seq_each = float(np.median(t_cells))
    t_seq_total = t_seq_each * P
    log(f"sequential fit: median {t_seq_each:.2f}s/cell over {n_seq} "
        f"cells (spread {min(t_cells):.2f}-{max(t_cells):.2f}s) -> "
        f"{t_seq_total:.2f}s for {P}")

    speedup = t_seq_total / t_pop
    epochs_per_hr = P * epochs / t_pop * 3600.0
    log(f"population fit median {t_pop:.2f}s (rep spread {spread:.1%}); "
        f"epochs/hr (population): {epochs_per_hr:.0f}")
    print(json.dumps({
        "metric": "population_speedup",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup, 3),
        "epochs_per_hr": round(epochs_per_hr),
        "pop_fit_s_median": round(t_pop, 3),
        "pop_fit_rep_spread": round(spread, 4),
        "seq_cell_s_median": round(t_seq_each, 3),
        "n_seq_measured": n_seq,
    }))


if __name__ == "__main__":
    main()
