"""Model utility helpers (reference model/util/util.py:5-69).

The models themselves consume additive biases from ops/attention.py;
these helpers expose the reference's util surface for external callers
and tests: pad/bos lookup, square-subsequent (causal) masks, padding
masks, and non-pad length resolution.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..data.tokens import BOS_WORD, PAD_WORD


def get_pad_idx(vocab) -> int:
    """Index of `<pad>` (reference util.py:5-6)."""
    return vocab.lookup(PAD_WORD)


def get_bos_idx(vocab) -> int:
    """Index of `<bos>` — resolves to `<unk>` when the vocab lacks it,
    the reference's documented quirk (util.py:8-9 + torchtext
    defaultdict stoi)."""
    return vocab.lookup(BOS_WORD)


def generate_mask(size: int) -> jnp.ndarray:
    """Boolean square-subsequent mask [S, S]: True = NOT allowed to
    attend (masked), matching the reference's bool conversion of the
    torch float mask (util.py:11-42)."""
    idx = jnp.arange(size)
    return idx[None, :] > idx[:, None]


def generate_padding_mask(tokens: jnp.ndarray, vocab) -> jnp.ndarray:
    """Boolean mask [B, S]: True at padding positions
    (reference util.py:45-61, without the seq-first transpose)."""
    return tokens == get_pad_idx(vocab)


def resolve_lengths(tokens: jnp.ndarray, vocab,
                    axis: int = -1) -> jnp.ndarray:
    """Count of non-pad entries along `axis` (reference util.py:64-69)."""
    pad = get_pad_idx(vocab)
    return tokens.shape[axis] - jnp.sum(tokens == pad, axis=axis)
