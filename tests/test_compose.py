"""Golden tests for the composition strategies, using the documented
examples from the reference (dataset_builder.py:155-223 docstrings)."""
from sign_language_nlp_tpu.data import (compose_all_values, compose_as_words,
                                        compose_as_words_norm,
                                        compose_as_sep_feat)

FIELDS = ["orientation_dh", "orientation_ndh", "movement_dh",
          "movement_ndh", "handshape_dh", "handshape_ndh"]

ROW = {
    "orientation_dh": {"value": "left_back"},
    "orientation_ndh": None,
    "movement_dh": {"value": "left_down_front"},
    "movement_ndh": None,
    "handshape_dh": {"value": "L"},
    "handshape_ndh": None,
}


def test_all_values_golden():
    # Reference docstring example (dataset_builder.py:157-160):
    # each value left-aligned to width 20, joined by '-'.
    out = compose_all_values([ROW], FIELDS)
    assert out == [
        "left_back           -                    -left_down_front     "
        "-                    -L                   -                    "
    ]


def test_as_words_golden():
    # Reference docstring example 'lb--ldf--L-' (dataset_builder.py:171-174).
    assert compose_as_words([ROW], FIELDS) == ["lb--ldf--L-"]


def test_as_words_norm_golden():
    # Reference docstring example 'l_b-___-ldf-___-L-'
    # (dataset_builder.py:186-189): orientation/movement → 3-slot code.
    assert compose_as_words_norm([ROW], FIELDS) == ["l_b-___-ldf-___-L-"]


def test_as_sep_feat_golden():
    # Reference docstring example (dataset_builder.py:212-215).
    assert compose_as_sep_feat([ROW], FIELDS) == \
        ["['lb', '', 'ldf', '', 'L', '']"]


def test_empty_frames():
    assert compose_as_words([], FIELDS) == []


def test_multi_row_order_preserved():
    row2 = dict(ROW, orientation_dh={"value": "right_up"})
    out = compose_as_words([ROW, row2], FIELDS)
    assert out[0].startswith("lb-") and out[1].startswith("ru-")
