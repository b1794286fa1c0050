"""sklearn-exactness of the pure-JAX metrics (the reference's scoring
parity set, helper.py:529-554 + config-transformer.yaml:9)."""
import numpy as np
import pytest

from sign_language_nlp_tpu.ops.metrics import (accuracy, f1_weighted,
                                               log_loss, precision_weighted,
                                               recall_weighted)

sklearn = pytest.importorskip("sklearn")
from sklearn import metrics as skm  # noqa: E402

N_CLASSES = 7


@pytest.fixture(scope="module", params=[0, 1, 2])
def case(request):
    rng = np.random.default_rng(request.param)
    n = 60
    # Leave some classes unused (zero support / zero predictions) to
    # exercise zero_division=0 behavior.
    y_true = rng.integers(2, N_CLASSES, n).astype(np.int32)
    y_pred = rng.integers(0, N_CLASSES, n).astype(np.int32)
    probs = rng.dirichlet(np.ones(N_CLASSES), size=n).astype(np.float64)
    return y_true, y_pred, probs


def test_accuracy(case):
    y_true, y_pred, _ = case
    np.testing.assert_allclose(
        float(accuracy(y_true, y_pred)),
        skm.accuracy_score(y_true, y_pred), rtol=1e-6)


@pytest.mark.parametrize("ours,sk_name", [
    (precision_weighted, "precision_score"),
    (recall_weighted, "recall_score"),
    (f1_weighted, "f1_score"),
])
def test_weighted_prf(case, ours, sk_name):
    y_true, y_pred, _ = case
    sk_fn = getattr(skm, sk_name)
    expected = sk_fn(y_true, y_pred, average="weighted", zero_division=0,
                     labels=np.arange(N_CLASSES))
    got = float(ours(y_true, y_pred, num_classes=N_CLASSES))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_log_loss(case):
    y_true, _, probs = case
    expected = skm.log_loss(y_true, probs, labels=np.arange(N_CLASSES))
    got = float(log_loss(y_true, probs))
    # jnp computes in float32; sklearn in float64.
    np.testing.assert_allclose(got, expected, rtol=2e-5)


def test_sample_weight_masks_rows(case):
    # weight 0 ≡ row absent — the padded-row mechanism for vmapped eval.
    y_true, y_pred, probs = case
    w = np.ones(len(y_true), np.float32)
    w[10:] = 0.0
    np.testing.assert_allclose(
        float(accuracy(y_true, y_pred, sample_weight=w)),
        skm.accuracy_score(y_true[:10], y_pred[:10]), rtol=1e-6)
    np.testing.assert_allclose(
        float(f1_weighted(y_true, y_pred, num_classes=N_CLASSES,
                          sample_weight=w)),
        skm.f1_score(y_true[:10], y_pred[:10], average="weighted",
                     zero_division=0, labels=np.arange(N_CLASSES)),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(log_loss(y_true, probs, sample_weight=w)),
        skm.log_loss(y_true[:10], probs[:10], labels=np.arange(N_CLASSES)),
        rtol=2e-5)


def test_double_log_softmax_quirk():
    # CrossEntropyLoss over log-probs == log_softmax applied twice
    # (SURVEY.md §3.2); check our criterion reproduces torch exactly.
    import torch

    from sign_language_nlp_tpu.ops.losses import cross_entropy_loss

    rng = np.random.default_rng(0)
    log_probs = np.log(rng.dirichlet(np.ones(5), size=8)).astype(np.float32)
    y = rng.integers(0, 5, 8)
    expected = torch.nn.CrossEntropyLoss()(torch.tensor(log_probs),
                                           torch.tensor(y)).item()
    got = float(cross_entropy_loss(log_probs, y.astype(np.int32)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_ignore_index():
    import torch

    from sign_language_nlp_tpu.ops.losses import cross_entropy_loss

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    y = np.array([0, 1, 2, 3, 1, 1])
    expected = torch.nn.CrossEntropyLoss(ignore_index=1)(
        torch.tensor(logits), torch.tensor(y)).item()
    got = float(cross_entropy_loss(logits, y.astype(np.int32),
                                   ignore_index=1))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_metrics_edge_cases():
    # Single sample, constant predictions, and a class never predicted.
    y1 = np.array([3], np.int32)
    p1 = np.array([2], np.int32)
    assert float(accuracy(y1, p1)) == 0.0
    assert float(f1_weighted(y1, p1, num_classes=N_CLASSES)) == \
        skm.f1_score(y1, p1, average="weighted", zero_division=0,
                     labels=np.arange(N_CLASSES))
    y = np.zeros(10, np.int32) + 2
    p = np.zeros(10, np.int32) + 2
    assert float(accuracy(y, p)) == 1.0
    np.testing.assert_allclose(
        float(precision_weighted(y, p, num_classes=N_CLASSES)),
        skm.precision_score(y, p, average="weighted", zero_division=0,
                            labels=np.arange(N_CLASSES)), rtol=1e-6)
