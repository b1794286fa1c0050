"""Callback facade + model-utils surface tests."""
import numpy as np

from sign_language_nlp_tpu.training.callbacks import (
    apply_callback_overrides, build_callbacks)


def test_build_callbacks_names_match_reference_layout():
    cbs, names = build_callbacks(
        workdir="/tmp/x",
        scoring=["neg_log_loss", "accuracy"],
        early_stopping={"patience": 30},
        gradient_clipping={"gradient_clip_value": 0.5},
        lr_scheduler={"factor": 0.2, "patience": 5})
    assert names == [
        "checkpoint", "early_stopping", "gradient_clipping", "lr_scoring",
        "lr_scheduler",
        "score_valid_neg_log_loss", "score_train_neg_log_loss",
        "score_valid_accuracy", "score_train_accuracy"]
    d = dict(cbs)
    assert d["checkpoint"]["monitor"] == "valid_loss_best"
    assert d["early_stopping"]["monitor"] == "valid_loss"
    assert d["lr_scheduler"]["step_every"] == "epoch"
    assert d["score_valid_neg_log_loss"]["lower_is_better"] is False


def test_optional_callbacks_omitted():
    _, names = build_callbacks(workdir="/tmp/x", scoring=["accuracy"])
    assert "early_stopping" not in names
    assert "gradient_clipping" not in names
    assert "lr_scheduler" not in names


def test_apply_callback_overrides():
    base = {"early_stopping": {"patience": 30, "threshold": 1e-4},
            "lr_scheduler": {"factor": 0.2}}
    out = apply_callback_overrides(base, {
        "early_stopping__patience": 5, "lr_scheduler__factor": 0.5,
        "unknown__thing": 1})
    assert out["early_stopping"] == {"patience": 5, "threshold": 1e-4}
    assert out["lr_scheduler"] == {"factor": 0.5}


def test_model_utils_surface(built_dataset):
    from sign_language_nlp_tpu.models.utils import (generate_mask,
                                                    generate_padding_mask,
                                                    get_bos_idx,
                                                    get_pad_idx,
                                                    resolve_lengths)

    assert get_pad_idx(built_dataset.src_vocab) == 1
    # <bos> is not in the vocab → resolves to <unk>=0 (reference quirk).
    assert get_bos_idx(built_dataset.tgt_vocab) == 0

    m = np.asarray(generate_mask(4))
    assert m.shape == (4, 4)
    assert not m[2, 1] and m[1, 2]  # can attend past, not future

    tokens = built_dataset.tokens[:4]
    pm = np.asarray(generate_padding_mask(tokens, built_dataset.src_vocab))
    lengths = np.asarray(resolve_lengths(tokens, built_dataset.src_vocab))
    np.testing.assert_array_equal(lengths, built_dataset.lengths[:4])
    assert pm.shape == tokens.shape
    for i in range(4):
        assert pm[i, lengths[i]:].all()
        assert not pm[i, :lengths[i]].any()
