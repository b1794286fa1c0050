"""Dataset build / numericalization / split / balance behavior."""
import numpy as np
import pytest

from sign_language_nlp_tpu.data import AslDataset, balance_dataset
from sign_language_nlp_tpu.data.balance import compute_sampling


def test_min_freq_filter(built_dataset):
    # 'rare' has only 1 sample (< samples_min_freq=2) → its group dropped.
    assert "rare" not in built_dataset.tgt_vocab
    # 9+8+7+6+5+4+3+2 = 44 samples survive.
    assert len(built_dataset) == 44


def test_static_shapes(built_dataset):
    n, s = built_dataset.tokens.shape
    assert n == 44
    assert s % 8 == 0  # padded to a multiple of 8 for XLA tiling
    assert built_dataset.tokens.dtype == np.int32
    assert (built_dataset.lengths <= s).all()
    # Padding is <pad> beyond each row's length:
    pad = built_dataset.src_vocab.pad_index
    for i in range(n):
        ln = built_dataset.lengths[i]
        assert (built_dataset.tokens[i, ln:] == pad).all()


def test_labels_include_specials(built_dataset):
    # Reference quirk preserved: labels() returns ALL vocab entries
    # including <unk>/<pad> (asl_dataset.py:210-213).
    labels = built_dataset.labels("i")
    assert labels == list(range(len(built_dataset.tgt_vocab)))
    names = built_dataset.labels("s")
    assert names[0] == "<unk>" and names[1] == "<pad>"


def test_split_seeded_and_disjoint(built_dataset):
    test, train = built_dataset.split(lengths=0.15, seed=1)
    assert len(test) == round(0.15 * 44)
    assert len(test) + len(train) == 44
    # Same seed → same split:
    test2, train2 = built_dataset.split(lengths=0.15, seed=1)
    assert np.array_equal(test.labels_idx, test2.labels_idx)
    assert np.array_equal(test.tokens, test2.tokens)
    # Different seed → (almost surely) different:
    test3, _ = built_dataset.split(lengths=0.15, seed=2)
    assert not np.array_equal(test.tokens, test3.tokens)


def test_split_indices_only(built_dataset):
    idx_test, idx_train = built_dataset.split(lengths=0.15, seed=1,
                                              indices_only=True)
    assert len(set(idx_test) & set(idx_train)) == 0
    assert len(idx_test) + len(idx_train) == 44


def test_truncated(built_dataset):
    t = built_dataset.truncated(10)
    assert len(t) == 10
    assert np.array_equal(t.tokens, built_dataset.tokens[:10])


def test_compute_sampling_math():
    # under target = min(v, round(u + ln v)); over = max(v, round(u + ln v))
    # (reference helper.py:355-364).
    import math
    counts = {0: 100, 1: 10, 2: 1}
    u = 37.0
    under = compute_sampling(counts, u, "under")
    assert under[0] == round(37 + math.log(100))  # 42 — undersampled
    assert under[1] == 10  # already below target
    assert under[2] == 1
    over = compute_sampling(under, u, "over")
    assert over[1] == round(37 + math.log(10))  # oversampled up
    assert over[0] == max(under[0], round(37 + math.log(under[0])))


def test_balance_dataset(built_dataset):
    bal = balance_dataset(built_dataset, seed=1)
    counts = bal.class_counts()
    orig = built_dataset.class_counts()
    # Majority classes shrink (or stay), minorities grow (or stay):
    u = np.mean(list(orig.values()))
    for cls, n in counts.items():
        v = orig[cls]
        import math
        under_t = min(v, round(u + math.log(v)))
        over_t = max(under_t, round(u + math.log(under_t)))
        assert n == over_t
    # Deterministic under the same seed:
    bal2 = balance_dataset(built_dataset, seed=1)
    assert np.array_equal(bal.labels_idx, bal2.labels_idx)


def test_reuse_transient_cache(asl_corpus_dir, monkeypatch, tmp_path):
    # With reuse_transient, the working file is content-hash-keyed and a
    # second build reuses it (reference dataset_builder.py:29-50).
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    args = {
        "dataset_dir": asl_corpus_dir,
        "fields": ["orientation_dh", "movement_dh"],
        "samples_min_freq": 2,
        "composition_strategy": "as_words",
        "reuse_transient": True,
    }
    ds1 = AslDataset.build(dataset_args=args)
    cached = list(tmp_path.glob("*.dataset.tmp"))
    assert len(cached) == 1
    mtime = cached[0].stat().st_mtime_ns
    ds2 = AslDataset.build(dataset_args=args)
    assert cached[0].stat().st_mtime_ns == mtime  # not rewritten
    assert np.array_equal(ds1.tokens, ds2.tokens)


def test_unknown_strategy_raises(asl_corpus_dir):
    with pytest.raises(ValueError, match="Unknown composition strategy"):
        AslDataset.build(dataset_args={
            "dataset_dir": asl_corpus_dir,
            "fields": ["orientation_dh"],
            "samples_min_freq": 2,
            "composition_strategy": "nope",
        })
