"""Loss functions with reference-compatible semantics.

The reference configures `torch.nn.CrossEntropyLoss(ignore_index=pad)`
over model outputs that are *already* log-softmaxed
(model/transformer.py:89, encoder_decoder_attn_bkp.py:76) — a double
log-softmax (SURVEY.md §3.2 note). Torch CE = log_softmax + NLL, so the
faithful computation is `nll(log_softmax(model_output), y)`. Both the
faithful criterion ("cross_entropy", the default mapping for
`torch.nn.CrossEntropyLoss`) and the plain NLL over the model's
log-probs ("nll") are provided; configs select by the same dotted names
the reference uses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nll_loss(log_probs: jax.Array, targets: jax.Array,
             ignore_index: int = -100,
             sample_weight: jax.Array | None = None) -> jax.Array:
    """Mean negative log-likelihood of `targets` under `log_probs`
    [.., V], skipping entries equal to `ignore_index` (torch NLLLoss
    mean-reduction semantics)."""
    picked = jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    valid = (targets != ignore_index)
    w = valid.astype(log_probs.dtype)
    if sample_weight is not None:
        w = w * sample_weight
    total = jnp.sum(w)
    return -jnp.sum(picked * w) / jnp.maximum(total, 1.0)


def cross_entropy_loss(logits: jax.Array, targets: jax.Array,
                       ignore_index: int = -100,
                       sample_weight: jax.Array | None = None) -> jax.Array:
    """torch.nn.CrossEntropyLoss: log_softmax then NLL. When `logits`
    are themselves log-probs this reproduces the reference's
    double-log-softmax quirk exactly."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return nll_loss(log_probs, targets, ignore_index=ignore_index,
                    sample_weight=sample_weight)


_CRITERIA = {
    "torch.nn.CrossEntropyLoss": cross_entropy_loss,
    "CrossEntropyLoss": cross_entropy_loss,
    "cross_entropy": cross_entropy_loss,
    "torch.nn.NLLLoss": nll_loss,
    "NLLLoss": nll_loss,
    "nll": nll_loss,
}


def resolve_criterion(name: str):
    if name not in _CRITERIA:
        raise ValueError(f"Unknown criterion: '{name}' "
                         f"(known: {sorted(_CRITERIA)})")
    return _CRITERIA[name]
