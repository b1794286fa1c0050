"""Data layer: ASL-Phono corpus building, composition strategies, vocab,
and static-shape array datasets.

Replaces the reference's `dataset/` package (torchtext Field/TabularDataset
based; reference dataset/asl_dataset.py, dataset/builder/dataset_builder.py)
with a NumPy pipeline that emits fixed-shape int32 arrays ready for XLA.
"""
from .tokens import BOS_WORD, EOS_WORD, PAD_WORD, UNK_WORD
from .compose import (
    COMPOSITION_STRATEGIES,
    compose_all_values,
    compose_as_sep_feat,
    compose_as_words,
    compose_as_words_norm,
)
from .vocab import Vocab
from .builder import DatasetBuilder
from .dataset import AslDataset
from .balance import balance_dataset, compute_sampling

__all__ = [
    "PAD_WORD", "UNK_WORD", "BOS_WORD", "EOS_WORD",
    "COMPOSITION_STRATEGIES",
    "compose_all_values", "compose_as_words", "compose_as_words_norm",
    "compose_as_sep_feat",
    "Vocab", "DatasetBuilder", "AslDataset",
    "balance_dataset", "compute_sampling",
]
