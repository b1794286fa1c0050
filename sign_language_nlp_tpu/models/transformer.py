"""Encoder-decoder Transformer sign classifier.

TPU-first re-design of the reference's `Transformer`
(reference model/transformer.py:9-109 around torch `nn.Transformer`):
batch-first throughout (no seq-first transposes), additive attention
biases instead of boolean masks, static shapes, log-softmax head.

Architecture parity with torch `nn.Transformer` defaults the reference
relies on (model/transformer.py:40-45): post-LayerNorm residual blocks,
ReLU feed-forward, per-stack final LayerNorm (eps 1e-5, the torch
default — flax's 1e-6 drifts the full-fit torch A/B), embedding ×
sqrt(d) + sinusoidal PE + dropout on both streams, and a
`num_layers`-deep encoder and decoder of `num_heads` heads with
`hidden_size` feed-forward width.

Faithful reference quirks (flags; SURVEY.md §7 hard part 5):
  * `causal_encoder=True` — the reference applies a *causal* mask to the
    encoder self-attention as well (model/transformer.py:68,
    model/util/util.py:11-42).
  * `mask_memory=False` — the reference never passes a memory mask, so
    decoder cross-attention sees padded encoder positions
    (model/transformer.py:82-87).
  * `tgt_input="label"` — the decoder input sequence is the bare label
    `y` (length-1), i.e. classification dressed as seq2seq
    (model/transformer.py:65); "bos" feeds a constant token instead so
    predictions do not depend on `y`.

The classifier head returns log-probs [B, V_tgt]
(model/transformer.py:88-90,101-104).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import causal_bias, multi_head_attention, padding_bias
from ..ops.dropout import dropout
from .init import embedding_init, torch_dense
from .positional import sinusoidal_positional_encoding


class MultiHeadAttentionBlock(nn.Module):
    """Projections + scaled-dot-product attention (torch MHA layout:
    fused qkv is mathematically three biased Dense projections + output
    projection)."""

    d_model: int
    num_heads: int
    backend: str = "xla"  # "pallas" = fused VMEM kernel (inference path)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, bias, rate, deterministic):
        d, dt = self.d_model, self.dtype
        q = torch_dense(d, d, xavier=True, name="q_proj", dtype=dt)(q_in)
        k = torch_dense(d, d, xavier=True, name="k_proj", dtype=dt)(kv_in)
        v = torch_dense(d, d, xavier=True, name="v_proj", dtype=dt)(kv_in)
        drop_rng = (None if deterministic
                    else self.make_rng("dropout"))
        out = multi_head_attention(q, k, v, bias,
                                   num_heads=self.num_heads,
                                   dropout_rate=rate,
                                   dropout_rng=drop_rng,
                                   deterministic=deterministic,
                                   backend=self.backend)
        return torch_dense(d, d, xavier=True, name="out_proj",
                           dtype=dt)(out)


class FeedForward(nn.Module):
    d_model: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rate, deterministic):
        h = torch_dense(self.hidden_size, self.d_model, xavier=True,
                        name="linear1", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = dropout(h, rate,
                    None if deterministic else self.make_rng("dropout"),
                    deterministic)
        return torch_dense(self.d_model, self.hidden_size, xavier=True,
                           name="linear2", dtype=self.dtype)(h)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    hidden_size: int
    backend: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, rate, deterministic):
        def drop(v):
            return dropout(v, rate,
                           None if deterministic else self.make_rng("dropout"),
                           deterministic)

        attn = MultiHeadAttentionBlock(self.d_model, self.num_heads,
                                       self.backend, self.dtype,
                                       name="self_attn")(
            x, x, bias, rate, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(attn))
        ff = FeedForward(self.d_model, self.hidden_size, self.dtype,
                         name="ff")(x, rate, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(ff))


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    hidden_size: int
    backend: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_bias, cross_bias, rate,
                 deterministic):
        def drop(v):
            return dropout(v, rate,
                           None if deterministic else self.make_rng("dropout"),
                           deterministic)

        attn = MultiHeadAttentionBlock(self.d_model, self.num_heads,
                                       self.backend, self.dtype,
                                       name="self_attn")(
            x, x, self_bias, rate, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(attn))
        cross = MultiHeadAttentionBlock(self.d_model, self.num_heads,
                                        self.backend, self.dtype,
                                        name="cross_attn")(
            x, memory, cross_bias, rate, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(cross))
        ff = FeedForward(self.d_model, self.hidden_size, self.dtype,
                         name="ff")(x, rate, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + drop(ff))


class _EncoderLayerScan(nn.Module):
    """EncoderLayer adapted to nn.scan's (carry, *broadcast) protocol."""

    d_model: int
    num_heads: int
    hidden_size: int
    backend: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, rate, deterministic):
        out = EncoderLayer(self.d_model, self.num_heads, self.hidden_size,
                           self.backend, self.dtype, name="layer")(
            x, bias, rate, deterministic)
        # nn.scan requires a stable carry dtype; LayerNorm outputs f32
        # even under a bf16 policy, so cast back to the carry's dtype.
        return out.astype(x.dtype), None


class _DecoderLayerScan(nn.Module):
    """DecoderLayer adapted to nn.scan's (carry, *broadcast) protocol."""

    d_model: int
    num_heads: int
    hidden_size: int
    backend: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_bias, cross_bias, rate,
                 deterministic):
        out = DecoderLayer(self.d_model, self.num_heads, self.hidden_size,
                           self.backend, self.dtype, name="layer")(
            x, memory, self_bias, cross_bias, rate, deterministic)
        return out.astype(x.dtype), None


class Transformer(nn.Module):
    src_vocab_size: int
    tgt_vocab_size: int
    embedding_size: int = 512
    num_heads: int = 8
    num_layers: int = 2
    hidden_size: int = 512
    dropout: float = 0.1  # default rate when the call passes None
    src_pad_idx: int = 1
    tgt_pad_idx: int = 1
    bos_idx: int = 0  # <bos> resolves to <unk> (vocab quirk)
    causal_encoder: bool = True
    mask_memory: bool = False
    tgt_input: str = "label"
    # "auto" (default): train-with-dropout attention routes through the
    # fused Pallas kernel on TPU when head_dim < 128 (measured ~6% epoch
    # win at the grid's dominant geometries, DESIGN.md §6b); everything
    # else — eval, D>=128, non-TPU — stays on XLA's batched fusion.
    # "xla" / "pallas" force a path.
    attn_backend: str = "auto"
    # scan_layers stacks per-layer params [L, ...] and lax.scans over
    # them: the compiled HLO no longer grows with num_layers, which cuts
    # compile time ~Lx — load-bearing when the grid sweeps num_layers
    # and every shape group pays a fresh TPU compile.
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, lengths: jax.Array,
                 y: Optional[jax.Array] = None,
                 dropout_rate=None, deterministic: bool = True) -> jax.Array:
        rate = self.dropout if dropout_rate is None else dropout_rate
        B, S = tokens.shape
        d = self.embedding_size

        def drop(v):
            return dropout(v, rate,
                           None if deterministic else self.make_rng("dropout"),
                           deterministic)

        # --- decoder input (length-1 target sequence) ---
        if self.tgt_input == "label":
            assert y is not None, "`y` is a required parameter"
            tgt_tokens = y.astype(jnp.int32)[:, None]
        else:
            tgt_tokens = jnp.full((B, 1), self.bos_idx, dtype=jnp.int32)

        # --- embeddings × sqrt(d) + positional encoding + dropout ---
        scale = jnp.sqrt(jnp.asarray(d, dtype=self.dtype))
        src_embed = nn.Embed(self.src_vocab_size, d, dtype=self.dtype,
                             embedding_init=embedding_init(),
                             name="src_embedding")(tokens) * scale
        src_embed = drop(src_embed
                         + sinusoidal_positional_encoding(S, d, self.dtype))
        tgt_embed = nn.Embed(self.tgt_vocab_size, d, dtype=self.dtype,
                             embedding_init=embedding_init(),
                             name="tgt_embedding")(tgt_tokens) * scale
        tgt_embed = drop(tgt_embed
                         + sinusoidal_positional_encoding(1, d, self.dtype))

        # --- attention biases ---
        src_valid = tokens != self.src_pad_idx
        src_bias = padding_bias(src_valid, self.dtype)
        if self.causal_encoder:
            src_bias = src_bias + causal_bias(S, self.dtype)
        tgt_valid = tgt_tokens != self.tgt_pad_idx
        tgt_bias = padding_bias(tgt_valid, self.dtype)  # 1×1 causal ≡ 0
        cross_bias = (padding_bias(src_valid, self.dtype)
                      if self.mask_memory else None)

        # --- encoder stack + final norm ---
        h = src_embed
        if self.scan_layers:
            ScanEncoder = nn.scan(
                _EncoderLayerScan, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.num_layers)
            h, _ = ScanEncoder(d, self.num_heads, self.hidden_size,
                               self.attn_backend, self.dtype,
                               name="encoder_layers")(
                h, src_bias, rate, deterministic)
        else:
            for i in range(self.num_layers):
                h = EncoderLayer(d, self.num_heads, self.hidden_size,
                                 self.attn_backend, self.dtype,
                                 name=f"encoder_layer_{i}")(
                    h, src_bias, rate, deterministic)
        memory = nn.LayerNorm(epsilon=1e-5, name="encoder_norm")(h)

        # --- decoder stack + final norm ---
        g = tgt_embed
        if self.scan_layers:
            ScanDecoder = nn.scan(
                _DecoderLayerScan, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 5,
                length=self.num_layers)
            g, _ = ScanDecoder(d, self.num_heads, self.hidden_size,
                               self.attn_backend, self.dtype,
                               name="decoder_layers")(
                g, memory, tgt_bias, cross_bias, rate, deterministic)
        else:
            for i in range(self.num_layers):
                g = DecoderLayer(d, self.num_heads, self.hidden_size,
                                 self.attn_backend, self.dtype,
                                 name=f"decoder_layer_{i}")(
                    g, memory, tgt_bias, cross_bias, rate, deterministic)
        g = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(g)

        # --- classification head: linear → log_softmax → [B, V] ---
        logits = torch_dense(self.tgt_vocab_size, d, name="head")(
            g[:, 0, :].astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)
