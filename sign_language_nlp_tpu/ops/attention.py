"""Scaled-dot-product multi-head attention.

The single attention primitive both model families route through
(reference sites: `nn.Transformer`'s MHA at model/transformer.py:40-45
and Bahdanau attention at model/base/encoder_decoder_attn_bkp.py:288-327
— the latter has its own fused op in `ops/bahdanau` semantics inside
models/encoder_decoder.py).

Two execution paths:
  * `xla` — einsum formulation; XLA fuses bias+softmax+matmul well and
    maps the two contractions onto the MXU.
  * `pallas` — fused flash-style kernel (ops/pallas_attention.py) for
    TPU, used when shapes meet its tiling constraints.

Sequence lengths in this workload are tens-to-hundreds of tokens
(SURVEY.md §5 long-context note), so attention is small; the win is in
batching many (population × batch) instances, not in sequence tiling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite mask value: keeps fully-masked rows NaN-free


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         bias: jax.Array | None = None,
                         *,
                         num_heads: int,
                         dropout_rate=0.0,
                         dropout_rng: jax.Array | None = None,
                         deterministic: bool = True,
                         backend: str = "xla") -> jax.Array:
    """Attention over already-projected q/k/v.

    q: [B, Sq, E], k/v: [B, Sk, E], bias: broadcastable to [B, H, Sq, Sk]
    (additive, -inf style). Returns [B, Sq, E].
    """
    B, Sq, E = q.shape
    Sk = k.shape[1]
    assert E % num_heads == 0, "embed dim must divide num_heads"
    head_dim = E // num_heads

    if backend == "auto":
        # Measured policy (DESIGN.md §6b, round 2): the fused train
        # kernel beats XLA's batched attention when head_dim < 128
        # (XLA's contractions are MXU-starved there; the kernel also
        # skips the head split/merge copies). At D=128 XLA is already
        # MXU-aligned and wins — and the eval path is always XLA's.
        # E must be lane-aligned (multiple of 128): at E=64 the HBM
        # layout pads the last dim 64→128, ~2x inflating q/k/v/o and
        # VJP residuals that neither the kernel's VMEM budget nor the
        # driver's sizing model accounts for (ADVICE r2).
        backend = ("pallas"
                   if (not deterministic and dropout_rng is not None
                       and head_dim < 128 and E % 128 == 0
                       and jax.default_backend() == "tpu")
                   else "xla")

    if backend == "pallas":
        if deterministic or dropout_rng is None:
            from .pallas_attention import multi_head_attention_pallas

            return multi_head_attention_pallas(q, k, v, bias,
                                               num_heads=num_heads)
        if jax.default_backend() == "tpu":
            # Training path: fused kernels with in-kernel weight dropout
            # (the TPU PRNG is unavailable in interpreter mode, so
            # non-TPU backends fall through to the XLA path below).
            return _mha_pallas_train(q, k, v, bias, num_heads=num_heads,
                                     dropout_rate=dropout_rate,
                                     dropout_rng=dropout_rng)

    qh = q.reshape(B, Sq, num_heads, head_dim)
    kh = k.reshape(B, Sk, num_heads, head_dim)
    vh = v.reshape(B, Sk, num_heads, head_dim)

    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=q.dtype))
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rng is not None and not deterministic:
        from .dropout import dropout as _dropout

        weights = _dropout(weights, dropout_rate, dropout_rng,
                           deterministic=False)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, E).astype(q.dtype)


def _mha_pallas_train(q, k, v, bias, *, num_heads, dropout_rate,
                      dropout_rng):
    """[B,S,E] model-layout inputs → fused training attention. Heads
    split inside the kernel; per-batch-row dropout seeds derive from
    the layer's dropout rng."""
    from .pallas_attention_train import fused_attention_train

    B, Sq, E = q.shape
    Sk = k.shape[1]
    # bias stays HEAD-SHARED [B, Sq, Sk] (the framework's masks are
    # per-row) — no per-head broadcast ever hits HBM.
    if bias is None:
        bias_hs = jnp.zeros((B, Sq, Sk), jnp.float32)
    else:
        b4 = jnp.broadcast_to(bias, (B, 1) + bias.shape[-2:])
        bias_hs = jnp.broadcast_to(b4[:, 0], (B, Sq, Sk))
    seeds = jax.random.randint(dropout_rng, (B,), 0,
                               jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    rate = jnp.reshape(jnp.asarray(dropout_rate, jnp.float32), (1,))
    return fused_attention_train(q, k, v, bias_hs.astype(jnp.float32),
                                 seeds, rate, True, num_heads)


def causal_bias(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """[1, 1, S, S] additive causal bias (upper triangle masked)."""
    idx = jnp.arange(seq_len)
    mask = idx[None, :] > idx[:, None]  # True above diagonal → masked
    return jnp.where(mask, NEG_INF, 0.0).astype(dtype)[None, None, :, :]


def padding_bias(valid: jax.Array, dtype=jnp.float32) -> jax.Array:
    """valid: [B, Sk] boolean (True = real token) → [B, 1, 1, Sk] bias."""
    return jnp.where(valid, 0.0, NEG_INF).astype(dtype)[:, None, None, :]
