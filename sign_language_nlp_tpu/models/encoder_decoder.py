"""Recurrent encoder-decoder with Bahdanau attention — the LSTM/GRU
sign-classifier family.

TPU-native re-design of the reference's annotated-encoder-decoder base
(reference model/base/encoder_decoder_attn_bkp.py:14-413; leaf classes
model/encoder_decoder_{lstm,gru}_attn.py): a bidirectional multi-layer
recurrent encoder, Bahdanau MLP attention, and a decoder unrolled for
exactly ONE step (MAX_OUTPUT_LEN=1, encoder_decoder_attn_bkp.py:332) —
so the decoder here is simply one attention read + one stacked-cell
step, no unroll loop at all.

TPU mapping decisions:
  * torch's pack_padded_sequence (encoder_decoder_attn_bkp.py:110-123)
    becomes a mask-aware `lax.scan`: hidden state updates are frozen at
    padded steps, so final states match packed semantics exactly.
  * The input-to-hidden projections for ALL timesteps are hoisted out of
    the scan into one large [B,S,I]x[I,G*H] matmul (MXU-friendly); only
    the [B,H]x[H,G*H] recurrence stays sequential.
  * Gate layouts follow torch (LSTM: i,f,g,o; GRU: r,z,n with the
    r-gated new-gate hidden term), and all recurrent weights init as
    U(-1/sqrt(H), 1/sqrt(H)) for comparable dynamics.

Faithful reference quirks (flags):
  * the decoder input token is `<bos>`, which the target vocab lacks, so
    it resolves to `<unk>` (encoder_decoder_attn_bkp.py:408-413 +
    model/util/util.py:8-9) — `bos_idx` defaults to the unk index;
  * the decoder's initial state is tanh(bridge(enc_final)) and an LSTM
    reuses it for the cell state too (encoder_decoder_attn_bkp.py:276-280);
  * `output[:, -1]` of the single unrolled step is the classification
    (encoder_decoder_attn_bkp.py:400-402).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF
from ..ops.dropout import dropout
from .init import embedding_init, rnn_uniform, torch_dense

_GATES = {"lstm": 4, "gru": 3}


def _lstm_combine(zx, h, c):
    """zx: precomputed x-projection + both biases, [B, 4H]."""
    i, f, g, o = jnp.split(zx, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _gru_combine(zx, zh, h):
    """zx = x@Wih + bih, zh = h@Whh + bhh; torch gate order r,z,n with
    the candidate's hidden term gated by r *after* bias."""
    rx, zx_, nx = jnp.split(zx, 3, axis=-1)
    rh, zh_, nh = jnp.split(zh, 3, axis=-1)
    r = jax.nn.sigmoid(rx + rh)
    z = jax.nn.sigmoid(zx_ + zh_)
    n = jnp.tanh(nx + r * nh)
    return (1.0 - z) * n + z * h


class RecurrentLayer(nn.Module):
    """One directional recurrent layer over a full sequence, mask-aware."""

    input_size: int
    hidden_size: int
    cell_type: str  # 'lstm' | 'gru'
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, valid: jax.Array):
        """x: [B,S,I], valid: [B,S] bool → (outputs [B,S,H], final state).

        Semantics match a packed torch RNN: state only advances on valid
        steps; the forward final state is the state after each row's last
        real token, the reverse final state after its first."""
        H, G = self.hidden_size, _GATES[self.cell_type]
        init = rnn_uniform(H)
        w_ih = self.param("w_ih", init, (self.input_size, G * H))
        b_ih = self.param("b_ih", init, (G * H,))
        w_hh = self.param("w_hh", init, (H, G * H))
        b_hh = self.param("b_hh", init, (G * H,))

        B, S, _ = x.shape
        # Compute dtype follows the activations (params stay float32 —
        # same policy as torch_dense); without the casts the f32 params
        # promote the cell math to f32 and the scan carry dtype diverges
        # from its bf16 init under a bfloat16 compute policy.
        cdt = x.dtype
        w_ih, b_ih = w_ih.astype(cdt), b_ih.astype(cdt)
        w_hh, b_hh = w_hh.astype(cdt), b_hh.astype(cdt)
        # Hoist all input projections into one MXU matmul:
        acc_t = jnp.promote_types(cdt, jnp.float32)
        zx_all = jnp.einsum("bsi,ig->bsg", x, w_ih,
                            preferred_element_type=acc_t
                            ).astype(cdt) + b_ih

        zx_t = jnp.moveaxis(zx_all, 1, 0)  # [S,B,G*H]
        valid_t = jnp.moveaxis(valid, 1, 0)  # [S,B]
        if self.reverse:
            zx_t, valid_t = zx_t[::-1], valid_t[::-1]

        h0 = jnp.zeros((B, H), dtype=x.dtype)
        if self.cell_type == "lstm":
            carry0 = (h0, h0)

            def step(carry, inp):
                zx, v = inp
                h, c = carry
                zh = jnp.dot(h, w_hh,
                             preferred_element_type=acc_t).astype(cdt) + b_hh
                h_new, c_new = _lstm_combine(zx + zh, h, c)
                m = v[:, None]
                carry = (jnp.where(m, h_new, h), jnp.where(m, c_new, c))
                return carry, carry[0]
        else:
            carry0 = h0

            def step(carry, inp):
                zx, v = inp
                zh = jnp.dot(carry, w_hh,
                             preferred_element_type=acc_t).astype(cdt) + b_hh
                h_new = _gru_combine(zx, zh, carry)
                carry = jnp.where(v[:, None], h_new, carry)
                return carry, carry

        final, outputs = jax.lax.scan(step, carry0, (zx_t, valid_t))
        if self.reverse:
            outputs = outputs[::-1]
        outputs = jnp.moveaxis(outputs, 0, 1)  # [B,S,H]
        # Zero padded positions (the reference fills them with the pad
        # index value, encoder_decoder_attn_bkp.py:120-123, but they are
        # masked out of attention either way).
        outputs = outputs * valid[:, :, None].astype(outputs.dtype)
        return outputs, final


class BiRNNEncoder(nn.Module):
    """Bidirectional multi-layer encoder (reference Encoder,
    encoder_decoder_attn_bkp.py:79-159): per-layer fwd/bwd concat
    outputs feed the next layer (with inter-layer dropout), and the
    final per-layer hidden states concat to [L, B, 2H]."""

    input_size: int
    hidden_size: int
    num_layers: int
    cell_type: str

    @nn.compact
    def __call__(self, x, valid, rate, deterministic):
        outputs = x
        finals = []
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else 2 * self.hidden_size
            out_f, fin_f = RecurrentLayer(in_size, self.hidden_size,
                                          self.cell_type, reverse=False,
                                          name=f"l{layer}_fwd")(outputs,
                                                                valid)
            out_b, fin_b = RecurrentLayer(in_size, self.hidden_size,
                                          self.cell_type, reverse=True,
                                          name=f"l{layer}_bwd")(outputs,
                                                                valid)
            outputs = jnp.concatenate([out_f, out_b], axis=-1)
            if layer < self.num_layers - 1:
                outputs = dropout(
                    outputs, rate,
                    None if deterministic else self.make_rng("dropout"),
                    deterministic)
            h_f = fin_f[0] if self.cell_type == "lstm" else fin_f
            h_b = fin_b[0] if self.cell_type == "lstm" else fin_b
            finals.append(jnp.concatenate([h_f, h_b], axis=-1))  # [B,2H]
        hidden_concat = jnp.stack(finals, axis=0)  # [L,B,2H]
        return outputs, hidden_concat


class BahdanauAttention(nn.Module):
    """MLP attention (reference BahdanauAttention,
    encoder_decoder_attn_bkp.py:288-327): energy(tanh(Wq·q + Wk·k)),
    pad positions masked before softmax, context = weighted values."""

    hidden_size: int

    @nn.compact
    def __call__(self, query, proj_key, value, valid):
        # query [B,1,H]; proj_key [B,S,H]; value [B,S,2H]; valid [B,S]
        H, cdt = self.hidden_size, query.dtype
        q = torch_dense(H, H, use_bias=False, name="query_layer",
                        dtype=cdt)(query)
        scores = torch_dense(1, H, use_bias=False, name="energy_layer",
                             dtype=cdt)(jnp.tanh(q + proj_key))  # [B,S,1]
        scores = scores[..., 0][:, None, :]  # [B,1,S]
        scores = jnp.where(valid[:, None, :], scores, NEG_INF)
        alphas = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum(
            "bqs,bsv->bqv", alphas, value,
            preferred_element_type=jnp.promote_types(value.dtype,
                                                     jnp.float32)
        ).astype(value.dtype)  # [B,1,2H]
        return context, alphas


class OneStepDecoder(nn.Module):
    """The decoder's single unrolled step (reference Decoder.forward with
    max_len=1, encoder_decoder_attn_bkp.py:224-266): one Bahdanau read,
    one step through the stacked cells, pre-output projection."""

    emb_size: int
    hidden_size: int
    num_layers: int
    cell_type: str

    @nn.compact
    def __call__(self, prev_embed, encoder_outputs, init_hidden,
                 valid, rate, deterministic):
        H, G = self.hidden_size, _GATES[self.cell_type]
        attention = BahdanauAttention(H, name="attention")

        # Pre-computed attention keys (reference precomputes proj_key
        # once per forward for efficiency, encoder_decoder_attn_bkp.py:243-246).
        cdt = encoder_outputs.dtype
        proj_key = torch_dense(H, 2 * H, use_bias=False, dtype=cdt,
                               name="attention_key_layer")(encoder_outputs)

        # Query = top-layer initial hidden (encoder_decoder_attn_bkp.py:282-285).
        query = init_hidden[-1][:, None, :]  # [B,1,H]
        context, _ = attention(query, proj_key, encoder_outputs, valid)

        # One step through the stacked unidirectional cells:
        x = jnp.concatenate([prev_embed, context], axis=-1)[:, 0, :]
        init = rnn_uniform(H)
        h_top = None
        for layer in range(self.num_layers):
            in_size = (self.emb_size + 2 * H) if layer == 0 else H
            w_ih = self.param(f"l{layer}_w_ih", init, (in_size, G * H))
            b_ih = self.param(f"l{layer}_b_ih", init, (G * H,))
            w_hh = self.param(f"l{layer}_w_hh", init, (H, G * H))
            b_hh = self.param(f"l{layer}_b_hh", init, (G * H,))
            h0 = init_hidden[layer].astype(cdt)
            zx = x @ w_ih.astype(cdt) + b_ih.astype(cdt)
            zh = h0 @ w_hh.astype(cdt) + b_hh.astype(cdt)
            if self.cell_type == "lstm":
                # LSTM cell state starts as a copy of the hidden bridge
                # (encoder_decoder_attn_bkp.py:278-280 quirk).
                h_new, _ = _lstm_combine(zx + zh, h0, h0)
            else:
                h_new = _gru_combine(zx, zh, h0)
            x = h_new
            if layer < self.num_layers - 1:
                x = dropout(x, rate,
                            None if deterministic
                            else self.make_rng("dropout"), deterministic)
            h_top = h_new
        output = h_top[:, None, :]  # [B,1,H]

        pre = jnp.concatenate([prev_embed, output, context], axis=-1)
        pre = dropout(pre, rate,
                      None if deterministic else self.make_rng("dropout"),
                      deterministic)
        pre_output = torch_dense(H, H + 2 * H + self.emb_size,
                                 use_bias=False, dtype=cdt,
                                 name="pre_output_layer")(pre)
        return pre_output  # [B,1,H]


class EncoderDecoderAttnBase(nn.Module):
    """Shared recurrent base (reference EncoderDecoderAttnBaseBkp,
    encoder_decoder_attn_bkp.py:330-413)."""

    src_vocab_size: int
    tgt_vocab_size: int
    rnn_type: str  # 'lstm' | 'gru'
    embedding_size: int = 256
    hidden_size: int = 512
    num_layers: int = 1
    dropout: float = 0.1
    src_pad_idx: int = 1
    tgt_pad_idx: int = 1
    bos_idx: int = 0  # <bos> → <unk> vocab quirk
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, lengths: jax.Array,
                 y: Optional[jax.Array] = None,
                 dropout_rate=None, deterministic: bool = True) -> jax.Array:
        assert self.rnn_type in _GATES, "Invalid `rnn_type`."
        rate = self.dropout if dropout_rate is None else dropout_rate
        B, S = tokens.shape
        E, H, L = self.embedding_size, self.hidden_size, self.num_layers

        valid = tokens != self.src_pad_idx  # (data != pad) mask,
        # encoder_decoder_attn_bkp.py:404-406

        # Source embedding with padding_idx semantics (pad row zeroed):
        src_embed = nn.Embed(self.src_vocab_size, E, dtype=self.dtype,
                             embedding_init=embedding_init(),
                             name="src_embed")(tokens)
        src_embed = src_embed * valid[:, :, None].astype(self.dtype)

        encoder_outputs, enc_hidden = BiRNNEncoder(
            E, H, L, self.rnn_type, name="encoder")(
            src_embed, valid, rate, deterministic)

        # Bridge: decoder init hidden = tanh(Linear(enc_hidden)) per layer
        # (encoder_decoder_attn_bkp.py:268-280).
        bridge = torch_dense(H, 2 * H, use_bias=True, name="bridge",
                             dtype=self.dtype)
        init_hidden = jnp.tanh(bridge(enc_hidden))  # [L,B,H]

        # Decoder input: embed(<bos>) — which the tgt vocab resolves to
        # <unk> (the reference's prepend_bos quirk). With MAX_OUTPUT_LEN=1
        # only this first token is ever consumed, so the label `y` never
        # enters the forward pass (encoder_decoder_attn_bkp.py:253-254,332).
        bos = jnp.full((B, 1), self.bos_idx, dtype=jnp.int32)
        tgt_embed_table = nn.Embed(self.tgt_vocab_size, E, dtype=self.dtype,
                                   embedding_init=embedding_init(),
                                   name="tgt_embed")
        prev_embed = tgt_embed_table(bos)
        prev_embed = prev_embed * jnp.asarray(
            self.bos_idx != self.tgt_pad_idx, dtype=self.dtype)

        pre_output = OneStepDecoder(E, H, L, self.rnn_type, name="decoder")(
            prev_embed, encoder_outputs, init_hidden, valid,
            rate, deterministic)

        # Generator: bias-free linear + log_softmax
        # (encoder_decoder_attn_bkp.py:69-76); take the last (only) step
        # (encoder_decoder_attn_bkp.py:400-402).
        logits = torch_dense(self.tgt_vocab_size, H, use_bias=False,
                             dtype=self.dtype, name="generator")(pre_output)
        return jax.nn.log_softmax(logits, axis=-1)[:, -1]


class EncoderDecoderLSTMAttn(EncoderDecoderAttnBase):
    """LSTM leaf (reference model/encoder_decoder_lstm_attn.py:4-6)."""

    rnn_type: str = "lstm"


class EncoderDecoderGRUAttn(EncoderDecoderAttnBase):
    """GRU leaf (reference model/encoder_decoder_gru_attn.py:4-6)."""

    rnn_type: str = "gru"
