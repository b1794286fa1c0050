"""End-to-end pipeline test: one debug-sized config through
`run()` → grid search → test → full artifact set (the reference's
output-fidelity contract, SURVEY.md §5)."""
import json
import os

import numpy as np
import pytest

from sign_language_nlp_tpu.pipeline import run
from tests.conftest import FIELDS


@pytest.fixture(scope="module")
def pipeline_result(asl_corpus_dir, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("work"))
    args = {
        "seed": 1,
        "debug": False,
        "cuda": False,
        "verbose": 0,
        "n_jobs": 1,
        "cv": 2,
        "lr": None,
        "scoring": ["neg_log_loss", "accuracy", "precision_weighted",
                    "recall_weighted", "f1_weighted"],
        "max_epochs": 3,
        "batch_size": 16,
        "test_size": 0.15,
        "early_stopping": {"patience": 30, "threshold": 1e-4,
                           "threshold_mode": "rel"},
        "gradient_clipping": {"gradient_clip_value": 0.5},
        "lr_scheduler": {"policy": "ReduceLROnPlateau", "factor": 0.2,
                         "patience": 5},
        "model": "model.EncoderDecoderGRUAttn",
        "model_args": {"embedding_size": 8, "hidden_size": 8,
                       "num_layers": 1, "dropout": 0.1},
        "criterion": "torch.nn.CrossEntropyLoss",
        "optimizer": "torch.optim.SGD",
        "optimizer_args": {"nesterov": False, "momentum": 0.9},
        "grid_args": {"lr": [0.3, 0.01]},
        "dataset_args": {
            "dataset_dir": asl_corpus_dir,
            "fields": FIELDS,
            "samples_min_freq": 2,
            "composition_strategy": "as_words",
            "reuse_transient": False,
            "balance_dataset": True,
        },
        "workdir": workdir,
        "mesh_args": {},
        "compat_args": {},
    }
    result = run(args)
    return workdir, result


def test_artifact_set(pipeline_result):
    workdir, _ = pipeline_result
    for name in ["grid_search_grid_params.csv", "grid_search_results.csv",
                 "grid_search_output.json", "grid_search_manifest.json",
                 "test_output.json", "test_profile_table.txt",
                 "test_profile.json"]:
        assert os.path.exists(os.path.join(workdir, name)), name


def test_grid_output_contents(pipeline_result):
    workdir, result = pipeline_result
    with open(os.path.join(workdir, "grid_search_output.json")) as f:
        out = json.load(f)
    assert set(out) == {"best_score", "best_params", "best_index",
                        "scoring"}
    assert out["best_params"]["lr"] in (0.3, 0.01)
    assert out["scoring"] == "ScoringWrapper('neg_log_loss')"


def test_cv_results_columns(pipeline_result):
    import pandas as pd

    workdir, _ = pipeline_result
    df = pd.read_csv(os.path.join(workdir, "grid_search_results.csv"))
    for col in ["mean_fit_time", "std_fit_time", "mean_score_time",
                "std_score_time", "param_lr", "params",
                "split0_test_score", "split1_test_score",
                "mean_test_score", "std_test_score", "rank_test_score"]:
        assert col in df.columns, col
    assert len(df) == 2  # two candidates
    assert set(df["rank_test_score"]) == {1, 2}


def test_test_output_metrics(pipeline_result):
    workdir, _ = pipeline_result
    with open(os.path.join(workdir, "test_output.json")) as f:
        out = json.load(f)
    assert set(out) == {"test_accuracy", "test_neg_log_loss",
                        "test_precision_weighted", "test_recall_weighted",
                        "test_f1_weighted"}
    assert 0.0 <= out["test_accuracy"] <= 1.0
    assert out["test_neg_log_loss"] <= 0.0


def test_profile_json(pipeline_result):
    workdir, _ = pipeline_result
    with open(os.path.join(workdir, "test_profile.json")) as f:
        prof = json.load(f)
    assert prof["wall_time_s"] > 0
    assert "flops" in prof and "bytes_accessed" in prof


def test_manifest_resume(pipeline_result, asl_corpus_dir):
    # A second search with the same workdir must skip all completed
    # cells (manifest-based resume; SURVEY.md §5 failure detection).
    workdir, result = pipeline_result
    with open(os.path.join(workdir, "grid_search_manifest.json")) as f:
        manifest = json.load(f)
    assert manifest.pop("__globals__")["compute_dtype"]  # reserved rec
    assert len(manifest) == 4  # 2 candidates x 2 folds
    for rec in manifest.values():
        assert "score" in rec and "epochs" in rec


def test_predict_corpus_from_checkpoint(pipeline_result, asl_corpus_dir):
    # The serving path: restore the refit checkpoint (with its saved
    # vocabularies) and label the corpus without the training dataset.
    from sign_language_nlp_tpu.predict import load_predictor, predict_corpus

    workdir, _ = pipeline_result
    model, params, src_vocab, tgt_vocab, desc = load_predictor(workdir)
    assert desc["model"] == "model.EncoderDecoderGRUAttn"
    assert len(src_vocab) == desc["src_vocab_size"]

    preds = predict_corpus(workdir, asl_corpus_dir, fields=FIELDS)
    assert len(preds) == 45  # all files (min_freq=1 at inference)
    vocab = set(tgt_vocab.itos)
    assert all(v in vocab for v in preds.values())
    assert all(k.endswith(".json") for k in preds)


def test_per_op_profile_table(tmp_path):
    """The profile artifacts carry a MEASURED per-op breakdown (top ops
    by self time) parsed from the captured jax trace — the reference's
    torch.profiler table analogue (helper.py:442-487)."""
    import jax
    import numpy as np

    from sign_language_nlp_tpu.profiling import create_profiler, save_profile
    from sign_language_nlp_tpu.profiling.profiler import (format_op_table,
                                                          per_op_table)

    @jax.jit
    def f(a, b):
        return jax.nn.softmax(a @ b, axis=-1)

    a = np.random.default_rng(0).normal(size=(64, 64)).astype(np.float32)
    with create_profiler(workdir=str(tmp_path)) as record:
        jax.block_until_ready(f(a, a))

    rows = per_op_table(record.trace_dir)
    assert len(rows) >= 1
    assert all(r["self_time_ns"] >= 0 and r["calls"] >= 1 for r in rows)
    # Sorted by self time desc:
    times = [r["self_time_ns"] for r in rows]
    assert times == sorted(times, reverse=True)

    save_profile(record, phase="test", workdir=str(tmp_path))
    table = (tmp_path / "test_profile_table.txt").read_text()
    assert "self time" in table and "calls" in table
    import json

    details = json.loads((tmp_path / "test_profile.json").read_text())
    assert details["per_op"] and "self_time_ns" in details["per_op"][0]
    assert format_op_table(rows)  # renders without error


def test_per_instruction_costs_from_hlo():
    """Per-op table v2 (VERDICT r2 #8): FLOPs/bytes for the dominant
    rows come from the executed program's optimized HLO — dot FLOPs
    exactly 2·|out|·K, fusions summing their called computation — and
    rows carry a src marker distinguishing analysis-backed numbers
    from regex estimates."""
    import jax
    import numpy as np

    from sign_language_nlp_tpu.profiling.profiler import (
        format_op_table, per_instruction_costs, per_op_table)

    @jax.jit
    def f(a, b):
        return jax.nn.softmax(a @ b, axis=-1)

    a = np.random.default_rng(0).normal(size=(32, 48)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(48, 16)).astype(np.float32)
    hlo = jax.jit(f).lower(a, b).compile().as_text()
    costs = per_instruction_costs(hlo)
    assert costs
    # The dot contributes 2*32*16*48 flops; wherever it landed (bare
    # dot or inside a fusion), that exact count must be present.
    want = 2.0 * 32 * 16 * 48
    flops = [c["flops"] for c in costs.values() if c["flops"]]
    assert any(fl >= want for fl in flops), costs
    # Output bytes of the f32[32,16] result:
    assert any(c["out_bytes"] == 32 * 16 * 4 for c in costs.values())

    assert all(set(c) == {"flops", "out_bytes"} for c in costs.values())
    # format_op_table renders the src column:
    table = format_op_table([{"name": "fusion.1", "self_time_ns": 100.0,
                              "calls": 2, "out_bytes": 128,
                              "flops": want, "cost_src": "xla"}])
    assert any("xla" in line for line in table)
    assert any("src" in line for line in table)
    assert per_op_table  # imported, exercised e2e in profile test


def test_apply_precision_globals_prng_impl():
    """precision_args.prng_impl flips the process PRNG (and a fit still
    runs under it); default/None leaves the config untouched."""
    import jax

    from sign_language_nlp_tpu.pipeline import apply_precision_globals

    prior = jax.config.jax_default_prng_impl
    try:
        apply_precision_globals(None)
        assert jax.config.jax_default_prng_impl == prior
        apply_precision_globals({"prng_impl": "rbg"})
        assert jax.config.jax_default_prng_impl == "rbg"
        # Dropout bits still flow: a jitted bernoulli under rbg works.
        key = jax.random.key(0)
        bits = jax.jit(lambda k: jax.random.bernoulli(
            k, 0.5, (8, 8)))(key)
        assert bits.shape == (8, 8)
    finally:
        jax.config.update("jax_default_prng_impl", prior)
