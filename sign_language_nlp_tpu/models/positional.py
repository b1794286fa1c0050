"""Sinusoidal positional encoding (reference
model/component/positional_encoding.py:7-49), as a pure table function:

    PE[pos, 2i]   = sin(pos / 10000^(2i/d))
    PE[pos, 2i+1] = cos(pos / 10000^(2i/d))

Computed once per trace at the needed static length and fused into the
embedding add by XLA (no 5000-row buffer needed; the reference's
max_len=5000 ceiling does not apply here).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sinusoidal_positional_encoding(seq_len: int, d_model: int,
                                   dtype=jnp.float32) -> jnp.ndarray:
    """[seq_len, d_model] table. Matches the torch layout: even columns
    sin, odd columns cos, frequency exp(-(2i)·ln(10000)/d)."""
    position = np.arange(seq_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-np.log(10000.0) / d_model))
    pe = np.zeros((seq_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: d_model // 2])
    return jnp.asarray(pe, dtype=dtype)
