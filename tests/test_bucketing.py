"""Length bucketing: short rows train in a truncated program.

The static-shape replacement for the reference's packed-sequence /
`include_lengths` economy (reference dataset_builder.py:103,
model/base/encoder_decoder.py pack_padded_sequence): rows at or under
the short-bucket cut run in a [*, S_short] view of the corpus. These
tests pin (a) the planner, (b) bit-exactness against the unbucketed
program when the batch sequence is unchanged, (c) statistical
equivalence on ragged membership, and (d) the grid-driver integration
with per-bucket pad floors.
"""
import numpy as np
import pytest

from sign_language_nlp_tpu.models.registry import build_model
from sign_language_nlp_tpu.training.engine import (PopulationTrainer,
                                                   TrainConfig, TrainTask,
                                                   plan_bucket_seq)


# ------------------------------------------------------------- planner
def test_plan_bucket_seq_rounds_up_to_8():
    lengths = np.array([3, 5, 9, 10, 40, 45, 50, 60])
    s = plan_bucket_seq(lengths, seq_len=64, percentile=50.0)
    assert s is not None and s % 8 == 0 and s < 64
    assert s >= np.percentile(lengths, 50)


def test_plan_bucket_seq_rejects_no_win():
    # Uniformly long corpus: the cut lands near S_max → no bucket.
    assert plan_bucket_seq(np.full(50, 60), seq_len=64) is None
    # Tiny sequences never bucket.
    assert plan_bucket_seq(np.array([3, 4, 12]), seq_len=16) is None


# ----------------------------------------------------- shared corpus
def _bimodal_data(n=96, seq=32, vocab=20, classes=4, seed=0,
                  sorted_by_len=False):
    """Separable corpus with a bimodal length distribution: half the
    rows fit the short bucket (len<=8), half are long."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, n).astype(np.int32)
    lengths = np.where(np.arange(n) % 2 == 0,
                       rng.integers(3, 9, n),
                       rng.integers(24, seq + 1, n)).astype(np.int32)
    if sorted_by_len:
        order = np.argsort(lengths, kind="stable")
        y, lengths = y[order], lengths[order]
    tokens = np.full((n, seq), 1, np.int32)
    for i in range(n):
        tokens[i, :lengths[i]] = 2 + y[i] + classes * rng.integers(
            0, (vocab - 2) // classes - 1, 1)
        tokens[i, lengths[i]:] = 1
    labels = (y + 2).astype(np.int32)
    return tokens, lengths, labels


def _fit(model, data, task, classes, bucketing, dropout_cfg=True,
         max_epochs=5, **over):
    cfg = TrainConfig(batch_size=8, max_epochs=max_epochs,
                      length_bucketing=bucketing, verbose=0,
                      optimizer_args={"momentum": 0.9}, **over)
    trainer = PopulationTrainer(model, 1, classes + 2, cfg)
    return trainer.fit(data, task)


# ------------------------------------------------- bit-exact alignment
def test_bucketed_bitexact_when_batch_sequence_unchanged():
    """When every cell's row list is short-rows-first with the short
    count a multiple of the batch size, bucketing reproduces the exact
    same batch sequence, and the run must be bit-close to the unbucketed
    program (mask_memory=True so truncation is mathematically exact; the
    faithful mask_memory=False quirk attends pad keys and differs by
    design). Dropout must be OFF for exactness: the per-batch RNG fold
    matches (global batch counter), but mask bits within a [B,S,E]
    tensor depend on the tensor's shape."""
    tokens, lengths, labels = _bimodal_data(sorted_by_len=True)
    n = len(labels)
    short = np.flatnonzero(lengths <= plan_bucket_seq(lengths, 32))
    long_ = np.setdiff1d(np.arange(n), short)
    # train rows: 24 short (3 batches of 8) then 24 long; valid: 8+8
    train_rows = np.concatenate([short[:24], long_[:24]])
    valid_rows = np.concatenate([short[24:32], long_[24:32]])

    model = build_model("transformer", 20, 6, 1, 1,
                        model_args={"embedding_size": 16,
                                    "hidden_size": 32, "num_layers": 1,
                                    "num_heads": 2},
                        compat_args={"mask_memory": True})
    task = TrainTask(train_rows=[train_rows], valid_rows=[valid_rows],
                     lr=np.array([0.1], np.float32),
                     dropout=np.array([0.0], np.float32))
    data = (tokens, lengths, labels)
    # eval_batch_size=8 keeps the valid scans batch-for-batch aligned.
    out_bkt = _fit(model, data, task, 4, bucketing=True,
                   eval_batch_size=8)
    out_ref = _fit(model, data, task, 4, bucketing=False,
                   eval_batch_size=8)
    for k in ("train_loss", "valid_loss", "valid_accuracy"):
        np.testing.assert_allclose(out_ref["history"][k],
                                   out_bkt["history"][k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)


# -------------------------------------------------- ragged equivalence
def test_bucketed_ragged_learns_equivalently():
    """Arbitrary row order: bucketing regroups batches (different SGD
    trajectory), but the fit must still learn the separable corpus to
    a comparable loss."""
    tokens, lengths, labels = _bimodal_data(seed=3)
    n = len(labels)
    rows = np.arange(n)
    model = build_model("gru", 20, 6, 1, 1,
                        model_args={"embedding_size": 16,
                                    "hidden_size": 24, "num_layers": 1})
    task = TrainTask(train_rows=[rows[:72]], valid_rows=[rows[72:]],
                     lr=np.array([0.05], np.float32),
                     dropout=np.array([0.0], np.float32))
    data = (tokens, lengths, labels)
    out_ref = _fit(model, data, task, 4, bucketing=False, max_epochs=8)
    out_bkt = _fit(model, data, task, 4, bucketing=True, max_epochs=8)
    ref_final = float(out_ref["history"]["valid_loss"][-1, 0])
    bkt_final = float(out_bkt["history"]["valid_loss"][-1, 0])
    ref_first = float(out_ref["history"]["valid_loss"][0, 0])
    assert bkt_final < 0.6 * ref_first, (ref_first, bkt_final)
    assert ref_final < 0.6 * ref_first, (ref_first, ref_final)


def test_bucketing_with_shuffle_and_compaction():
    """Shuffle permutes within buckets; compaction re-slots the bucket
    index matrices consistently."""
    tokens, lengths, labels = _bimodal_data(seed=5)
    rows = np.arange(len(labels))
    model = build_model("gru", 20, 6, 1, 1,
                        model_args={"embedding_size": 12,
                                    "hidden_size": 16, "num_layers": 1})
    task = TrainTask(train_rows=[rows[:64], rows[8:72], rows[16:80]],
                     valid_rows=[rows[64:], rows[72:], rows[80:]],
                     lr=np.array([0.2, 0.01, 0.3], np.float32),
                     dropout=np.zeros(3, np.float32))
    out = _fit(model, (tokens, lengths, labels), task, 4, bucketing=True,
               max_epochs=6, shuffle=True, compact=True,
               compact_min_remaining=0,
               early_stopping={"patience": 1, "threshold": 0.5})
    assert out["history"]["valid_loss"].shape[1] == 3
    assert np.isfinite(out["history"]["valid_loss"]).all()


# --------------------------------------------------- pad-floor geometry
def test_geometry_nested_pad_floors():
    model = build_model("gru", 20, 6, 1, 1,
                        model_args={"embedding_size": 8,
                                    "hidden_size": 8, "num_layers": 1})
    cfg = TrainConfig(batch_size=8, length_bucketing=True, verbose=0)
    tr = PopulationTrainer(model, 1, 6, cfg)
    rows_b = [[np.arange(4)], [np.arange(10)]]
    vrows_b = [[np.arange(2)], [np.arange(3)]]
    geom = tr._geometry(rows_b, vrows_b, (8, 32),
                        pad_rows_to=((24, 8), (40, 8)))
    assert geom.buckets[0][:2] == (8, 3)     # 24 rows / batch 8
    assert geom.buckets[1][:2] == (32, 5)    # 40 rows / batch 8
    # Flat floors with two buckets must be rejected loudly:
    with pytest.raises(ValueError):
        tr._geometry(rows_b, vrows_b, (8, 32), pad_rows_to=(24, 8))


def test_grid_driver_with_bucketing():
    """End-to-end search with length bucketing on: per-bucket pad
    floors keep chunked populations on one program; scores are sane."""
    from sign_language_nlp_tpu.search.driver import GridSearchDriver
    from sign_language_nlp_tpu.search.grid import ParamGrid
    from sign_language_nlp_tpu.search.scoring import ScoringWrapper

    tokens, lengths, labels = _bimodal_data(n=80, seed=7)
    cfg = TrainConfig(batch_size=8, max_epochs=3, verbose=0,
                      length_bucketing=True)
    driver = GridSearchDriver(
        model_name="gru", src_vocab_size=20, tgt_vocab_size=6,
        src_pad_idx=1, tgt_pad_idx=1,
        base_model_args={"embedding_size": 12, "hidden_size": 16,
                         "num_layers": 1},
        train_config=cfg, cv=2, max_population=2, verbose=0)
    grid = ParamGrid({"lr": [0.05, 0.1], "module__dropout": [0.0]})
    scorer = ScoringWrapper("accuracy", labels=list(range(6)))
    res = driver.search((tokens, lengths, labels), labels, grid, scorer)
    assert res.n_candidates == 2 and res.n_folds == 2
    scores = np.asarray(res.cv_results["mean_test_score"])
    assert np.isfinite(scores).all()


# ------------------------------------------------------- N buckets (r3)
def test_plan_bucket_seqs_multi_cut():
    from sign_language_nlp_tpu.training.engine import plan_bucket_seqs

    # Trimodal lengths → two cuts survive:
    lengths = np.concatenate([np.full(40, 10), np.full(40, 60),
                              np.full(40, 110)])
    cuts = plan_bucket_seqs(lengths, seq_len=120,
                            percentiles=(25.0, 60.0))
    assert len(cuts) == 2
    assert cuts[0] < cuts[1] < 120
    assert all(c % 8 == 0 for c in cuts)
    # Degenerate percentiles collapse to fewer cuts, not duplicates:
    cuts2 = plan_bucket_seqs(lengths, seq_len=120,
                             percentiles=(20.0, 25.0))
    assert len(cuts2) == len(set(cuts2))
    # Cuts that save <1/8 of the next bucket up are dropped:
    assert plan_bucket_seqs(np.full(50, 115), 120, (50.0,)) == ()


def test_three_bucket_fit_learns_equivalently():
    """A trimodal corpus trained with 3 static buckets reaches the same
    solution as the unbucketed program (same rows, regrouped batches)."""
    from tests.test_bucketing import _bimodal_data

    rng = np.random.default_rng(3)
    n, seq, classes = 90, 48, 4
    y = rng.integers(0, classes, n).astype(np.int32)
    lengths = np.concatenate([
        rng.integers(3, 9, n // 3), rng.integers(20, 25, n // 3),
        rng.integers(40, seq + 1, n - 2 * (n // 3))]).astype(np.int32)
    tokens = np.full((n, seq), 1, np.int32)
    for i in range(n):
        tokens[i, :lengths[i]] = 2 + y[i]
    labels = (y + 2).astype(np.int32)
    data = (tokens, lengths, labels)
    rows = np.arange(n)

    def fit(percentiles):
        model = build_model("model.EncoderDecoderGRUAttn", 20, 8, 1, 1,
                            model_args={"embedding_size": 8,
                                        "hidden_size": 8,
                                        "num_layers": 1, "dropout": 0.0})
        cfg = TrainConfig(batch_size=16, max_epochs=6, seed=0, verbose=0,
                          scoring=("accuracy",),
                          train_deterministic=True,
                          length_bucketing=percentiles is not None,
                          bucket_percentiles=percentiles)
        trainer = PopulationTrainer(model, 1, 8, cfg)
        task = TrainTask(train_rows=[rows[: n - 20]],
                         valid_rows=[rows[n - 20:]],
                         lr=np.array([0.3], np.float32),
                         dropout=np.zeros(1, np.float32))
        out = trainer.fit(data, task)
        geom = next(iter(trainer._epoch_fn_cache))
        geom = geom[0] if isinstance(geom, tuple) else geom
        return out, geom

    out_flat, _ = fit(None)
    out_3b, geom = fit((33.0, 66.0))
    assert len(geom.buckets) == 3, geom
    a = np.asarray(out_flat["history"]["valid_accuracy"])[-1, 0]
    b = np.asarray(out_3b["history"]["valid_accuracy"])[-1, 0]
    assert b >= a - 0.1 and b > 0.5, (a, b)
    # Valid loss lands in the same neighborhood (regrouped batches →
    # not bit-exact, but the same optimum):
    la = float(np.asarray(out_flat["history"]["valid_loss"])[-1, 0])
    lb = float(np.asarray(out_3b["history"]["valid_loss"])[-1, 0])
    assert abs(la - lb) < 0.35, (la, lb)

# ------------------------------------------------- auto planner (r4)
def test_plan_bucket_seqs_auto_trimodal():
    from sign_language_nlp_tpu.training.engine import plan_bucket_seqs_auto

    # Three tight modes → two cuts, landed at the modes' round-ups:
    lengths = np.concatenate([np.full(40, 10), np.full(40, 60),
                              np.full(40, 110)])
    cuts = plan_bucket_seqs_auto(lengths, seq_len=120)
    assert cuts == (16, 64), cuts


def test_plan_bucket_seqs_auto_bimodal_beats_median():
    from sign_language_nlp_tpu.training.engine import (plan_bucket_seq,
                                                       plan_bucket_seqs_auto)

    # Skewed bimodal: 80% short, 20% long. The median cut lands inside
    # the short mode; the auto cut lands at the short mode's top edge,
    # saving strictly more padded tokens.
    rng = np.random.default_rng(0)
    lengths = np.concatenate([rng.integers(8, 25, 400),
                              rng.integers(100, 121, 100)])
    auto = plan_bucket_seqs_auto(lengths, seq_len=128)
    assert len(auto) >= 1

    def padded_tokens(cuts):
        bounds = list(cuts) + [128]
        tot, lo = 0, 0
        for hi in bounds:
            tot += int(((lengths > lo) & (lengths <= hi)).sum()) * hi
            lo = hi
        return tot

    median = plan_bucket_seq(lengths, 128, 50.0)
    assert padded_tokens(auto) <= padded_tokens((median,))


def test_plan_bucket_seqs_auto_unimodal_no_cut():
    from sign_language_nlp_tpu.training.engine import plan_bucket_seqs_auto

    # Uniformly long corpus: no cut can pay ≥10% → ().
    assert plan_bucket_seqs_auto(np.full(100, 115), 120) == ()
    # Tiny seq_len guard:
    assert plan_bucket_seqs_auto(np.array([3, 4]), 16) == ()


def test_plan_bucket_seqs_auto_gain_gating():
    from sign_language_nlp_tpu.training.engine import plan_bucket_seqs_auto

    # A mild second mode that saves <10% must NOT earn a second cut:
    lengths = np.concatenate([np.full(95, 112), np.full(5, 24)])
    cuts = plan_bucket_seqs_auto(lengths, seq_len=120)
    assert len(cuts) <= 1


def test_plan_bucket_seqs_auto_gain_is_marginal_per_bucket():
    from sign_language_nlp_tpu.training.engine import plan_bucket_seqs_auto

    # The gate is MARGINAL: each extra bucket must pay >=10% over the
    # plan with one fewer bucket. Here every 2-bucket plan saves <10%
    # (cut@88: 472/512 = 7.8%; cut@104: 464/512 = 9.4%) while the
    # 3-bucket plan (88, 104) saves 12.5% TOTAL — riding the combined
    # gain of two individually-unjustified geometries. A total-gain
    # gate would accept (88, 104); the marginal rule must reject both.
    lengths = np.concatenate(
        [np.full(100, 88), np.full(100, 104), np.full(200, 128)])
    assert plan_bucket_seqs_auto(lengths, seq_len=128) == ()


def test_auto_bucket_fit_learns_equivalently():
    """bucket_percentiles='auto' end-to-end: the planner picks the
    trimodal cuts itself and the fit reaches the unbucketed solution."""
    rng = np.random.default_rng(3)
    n, seq, classes = 90, 48, 4
    y = rng.integers(0, classes, n).astype(np.int32)
    lengths = np.concatenate([
        rng.integers(3, 9, n // 3), rng.integers(20, 25, n // 3),
        rng.integers(40, seq + 1, n - 2 * (n // 3))]).astype(np.int32)
    tokens = np.full((n, seq), 1, np.int32)
    for i in range(n):
        tokens[i, :lengths[i]] = 2 + y[i]
    labels = (y + 2).astype(np.int32)
    data = (tokens, lengths, labels)
    rows = np.arange(n)

    def fit(percentiles, bucketing):
        model = build_model("model.EncoderDecoderGRUAttn", 20, 8, 1, 1,
                            model_args={"embedding_size": 8,
                                        "hidden_size": 8,
                                        "num_layers": 1, "dropout": 0.0})
        cfg = TrainConfig(batch_size=16, max_epochs=6, seed=0, verbose=0,
                          scoring=("accuracy",),
                          train_deterministic=True,
                          length_bucketing=bucketing,
                          bucket_percentiles=percentiles)
        trainer = PopulationTrainer(model, 1, 8, cfg)
        task = TrainTask(train_rows=[rows[: n - 20]],
                         valid_rows=[rows[n - 20:]],
                         lr=np.array([0.3], np.float32),
                         dropout=np.zeros(1, np.float32))
        out = trainer.fit(data, task)
        geom = next(iter(trainer._epoch_fn_cache))
        geom = geom[0] if isinstance(geom, tuple) else geom
        return out, geom

    out_flat, _ = fit(None, False)
    out_auto, geom = fit("auto", True)
    assert len(geom.buckets) >= 2, geom
    a = np.asarray(out_flat["history"]["valid_accuracy"])[-1, 0]
    b = np.asarray(out_auto["history"]["valid_accuracy"])[-1, 0]
    assert b >= a - 0.1 and b > 0.5, (a, b)
