"""SignClassifier estimator facade: fit/predict/proba/save/load."""
import numpy as np
import pytest

from sign_language_nlp_tpu.classifier import SignClassifier


@pytest.fixture(scope="module")
def clf(built_dataset):
    c = SignClassifier(model="model.EncoderDecoderGRUAttn",
                       dataset=built_dataset,
                       model_args={"embedding_size": 8, "hidden_size": 8,
                                   "num_layers": 1, "dropout": 0.0},
                       lr=0.3, max_epochs=4, batch_size=16, verbose=0)
    return c.fit()


def test_predict_shapes(clf, built_dataset):
    pred = clf.predict()
    assert pred.shape == (len(built_dataset),)
    proba = clf.predict_proba()
    assert proba.shape == (len(built_dataset), len(built_dataset.tgt_vocab))
    np.testing.assert_allclose(proba.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(pred, np.argmax(proba, -1))


def test_history_recorded(clf):
    assert "valid_loss" in clf.history_
    assert clf.history_["valid_loss"].shape[0] == 4  # epochs


def test_score(clf):
    s = clf.score()
    assert 0.0 <= s <= 1.0


def test_save_load_roundtrip(clf, built_dataset, tmp_path):
    clf.save(str(tmp_path))
    restored = SignClassifier.load(str(tmp_path), dataset=built_dataset,
                                   max_epochs=1, verbose=0)
    np.testing.assert_allclose(restored.decision_function(),
                               clf.decision_function(), rtol=1e-5)


def test_predict_signs_decodes(clf, built_dataset):
    signs = clf.predict_signs()
    assert len(signs) == len(built_dataset)
    vocab = set(built_dataset.tgt_vocab.itos)
    assert all(s in vocab for s in signs)


def test_save_load_preserves_compat_args(built_dataset, tmp_path):
    """Quirk flags must survive persistence: a model trained with
    non-default compat_args (tgt_input=bos, causal_encoder off) must be
    rebuilt with the SAME flags at load, or serving silently diverges
    (advisor finding r1: descriptor omitted compat/precision args)."""
    c = SignClassifier(model="model.Transformer", dataset=built_dataset,
                       model_args={"embedding_size": 8, "hidden_size": 16,
                                   "num_layers": 1, "num_heads": 2,
                                   "dropout": 0.0},
                       compat_args={"tgt_input": "bos",
                                    "causal_encoder": False},
                       lr=0.1, max_epochs=2, batch_size=16, verbose=0)
    c.fit()
    c.save(str(tmp_path))

    import json

    desc = json.loads((tmp_path / "params.json").read_text())
    assert desc["compat_args"] == {"tgt_input": "bos",
                                   "causal_encoder": False}

    restored = SignClassifier.load(str(tmp_path), dataset=built_dataset,
                                   max_epochs=1, verbose=0)
    assert restored.compat_args == c.compat_args
    np.testing.assert_allclose(restored.decision_function(),
                               c.decision_function(), rtol=1e-5,
                               atol=1e-6)
