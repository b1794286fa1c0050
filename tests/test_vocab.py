"""Vocab semantics: specials order, frequency/alpha sort, unk fallback —
matching torchtext-0.6 Vocab behavior the reference depends on
(dataset_builder.py:100-135)."""
from collections import Counter

from sign_language_nlp_tpu.data import Vocab
from sign_language_nlp_tpu.data.tokens import BOS_WORD, PAD_WORD, UNK_WORD


def test_specials_first():
    v = Vocab(Counter({"a": 3}))
    assert v.itos[0] == UNK_WORD
    assert v.itos[1] == PAD_WORD
    assert v.lookup(UNK_WORD) == 0
    assert v.pad_index == 1


def test_freq_desc_then_alpha():
    v = Vocab(Counter({"zz": 5, "aa": 5, "mid": 7, "low": 1}))
    assert v.itos[2:] == ["mid", "aa", "zz", "low"]


def test_unk_fallback_and_bos_quirk():
    # The reference prepends BOS_WORD to targets, but the TGT vocab has
    # no <bos>; torchtext's defaultdict stoi maps it to <unk>=0
    # (reference encoder_decoder_attn_bkp.py:408-413, model/util/util.py:8-9).
    v = Vocab(Counter({"house": 2}))
    assert v.lookup("never-seen") == 0
    assert v.lookup(BOS_WORD) == 0


def test_min_freq():
    v = Vocab(Counter({"a": 3, "b": 1}), min_freq=2)
    assert "b" not in v
    assert v.numericalize(["a", "b"]) == [2, 0]


def test_torchtext_parity_if_available():
    try:
        from torchtext.vocab import Vocab as TTVocab  # type: ignore
    except Exception:
        return  # torchtext not installed — covered by golden tests above
    counter = Counter({"zz": 5, "aa": 5, "mid": 7, "low": 1})
    tt = TTVocab(counter, specials=[UNK_WORD, PAD_WORD])
    ours = Vocab(counter)
    assert list(tt.itos) == ours.itos
