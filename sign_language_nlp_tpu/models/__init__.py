"""Model zoo: the three sign-classifier families of the reference,
re-designed as Flax modules with static shapes and mask-aware compute.

  Transformer              — reference model/transformer.py:9-109
  EncoderDecoderLSTMAttn   — reference model/encoder_decoder_lstm_attn.py
  EncoderDecoderGRUAttn    — reference model/encoder_decoder_gru_attn.py
  (shared recurrent base   — reference model/base/encoder_decoder_attn_bkp.py)

All models share the uniform signature the training engine feeds
(reference collate contract, helper.py:293-304):

    apply(params, tokens [B,S] int32, lengths [B] int32, y [B] int32,
          dropout_rate, rngs, deterministic) -> log-probs [B, V_tgt]

Reference quirks are preserved by default and switchable via
`compat` flags (SURVEY.md §7 hard part 5):
  causal_encoder   — causal mask on the *encoder* self-attention
                     (transformer.py:68 via util.generate_mask)
  mask_memory      — whether decoder cross-attention masks padded
                     encoder positions (reference does NOT:
                     transformer.py:82-87 passes no memory mask)
  tgt_input        — "label": decoder input is the true label
                     (transformer.py:65); "bos": a BOS token instead
  bos_is_unk       — RNN decoder's BOS prepend resolves to <unk>
                     (encoder_decoder_attn_bkp.py:408-413)
"""
from .transformer import Transformer
from .encoder_decoder import (EncoderDecoderAttnBase, EncoderDecoderGRUAttn,
                              EncoderDecoderLSTMAttn)
from .registry import resolve_model, MODEL_REGISTRY
from .positional import sinusoidal_positional_encoding

__all__ = [
    "Transformer",
    "EncoderDecoderAttnBase",
    "EncoderDecoderLSTMAttn",
    "EncoderDecoderGRUAttn",
    "resolve_model",
    "MODEL_REGISTRY",
    "sinusoidal_positional_encoding",
]
