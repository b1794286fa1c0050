"""Attribution experiments for the population trainer's step time.

Runs the bench workload's 64-cell population under controlled variants
and prints per-variant epoch timings, to decide where optimization
effort goes (dropout RNG vs attention HBM traffic vs matmuls).

Variants:
  base      — f32, dropout on (threefry RNG)     [the recorded bench]
  nodrop    — f32, dropout structurally removed
  rbg       — f32, dropout on, 'rbg' hardware RNG
  bf16      — bf16 compute, dropout on

Each variant is its own compile (slow over the axon tunnel — run in
background). Results print as one JSON line per variant on stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    variants = (sys.argv[1:] or ["base", "nodrop", "rbg"])
    from sign_language_nlp_tpu.utils.jaxtools import setup_compilation_cache

    setup_compilation_cache()
    import jax

    from bench import make_workload
    from sign_language_nlp_tpu.models.registry import build_model
    from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                       TrainConfig,
                                                       TrainTask)

    data, vs, vt, margs = make_workload(False)
    n = len(data[2])
    rows = np.arange(n)
    tr, va = rows[: int(n * 0.8)], rows[int(n * 0.8):]
    P, epochs = 64, 2
    rng = np.random.default_rng(1)

    for variant in variants:
        if variant.startswith("big"):
            # The reference grid's largest point: emb 1024 → head dim
            # 128 (lane/MXU-aligned) — where the fused kernel should win.
            margs_v = dict(margs, embedding_size=1024, hidden_size=512,
                           num_layers=2, num_heads=8)
            P_v = 16
        else:
            margs_v, P_v = margs, P
        lrs = rng.uniform(0.001, 0.1, P_v).astype(np.float32)
        drops = rng.choice([0.1, 0.5], P_v).astype(np.float32)
        if variant == "rbg":
            jax.config.update("jax_default_prng_impl", "rbg")
        else:
            jax.config.update("jax_default_prng_impl", "threefry2x32")
        dtype = "bfloat16" if variant == "bf16" else "float32"
        # "base"/"big" run the shipped default (attn_backend=auto);
        # force a path with "...pallas" / "...xlaattn" variants.
        if "pallas" in variant:
            compat = {"attn_backend": "pallas"}
        elif "xlaattn" in variant:
            compat = {"attn_backend": "xla"}
        else:
            compat = {}
        model = build_model("model.Transformer", vs, vt, 1, 1,
                            model_args=margs_v, compat_args=compat,
                            precision_args={"compute_dtype": dtype})
        cfg = TrainConfig(batch_size=50, max_epochs=1, seed=0, verbose=0,
                          optimizer_args={"momentum": 0.9},
                          gradient_clipping={"gradient_clip_value": 0.5},
                          scoring=("accuracy",), keep_best_params=False,
                          train_deterministic=(variant == "nodrop"))
        trainer = PopulationTrainer(model, 1, vt, cfg)
        task = TrainTask(train_rows=[tr] * P_v, valid_rows=[va] * P_v,
                         lr=lrs, dropout=drops)
        t0 = time.time()
        trainer.fit(data, task)  # compile + 1 epoch
        compile_and_first = time.time() - t0
        t0 = time.time()
        out = trainer.fit(data, task)  # warm: 1 epoch
        jax.block_until_ready(out["params"])
        warm = time.time() - t0
        print(json.dumps({"variant": variant,
                          "warm_epoch_s": round(warm, 3),
                          "first_s": round(compile_and_first, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
