"""Model registry: config name → model class + constructor.

The reference selects models by dotted path via `pydoc.locate`
(reference helper.py:93, config `model: model.Transformer`). This
registry accepts the reference's dotted names verbatim (so the original
YAMLs work unchanged) plus this package's own names.
"""
from __future__ import annotations

from .encoder_decoder import (EncoderDecoderAttnBase, EncoderDecoderGRUAttn,
                              EncoderDecoderLSTMAttn)
from .transformer import Transformer

MODEL_REGISTRY = {
    # Reference dotted names (config compatibility):
    "model.Transformer": Transformer,
    "model.EncoderDecoderLSTMAttn": EncoderDecoderLSTMAttn,
    "model.EncoderDecoderGRUAttn": EncoderDecoderGRUAttn,
    # Native names:
    "Transformer": Transformer,
    "transformer": Transformer,
    "EncoderDecoderLSTMAttn": EncoderDecoderLSTMAttn,
    "lstm": EncoderDecoderLSTMAttn,
    "EncoderDecoderGRUAttn": EncoderDecoderGRUAttn,
    "gru": EncoderDecoderGRUAttn,
}

# Keys of `model_args` each family understands; unknown keys are dropped
# (the reference forwards **model_args and the modules ignore extras via
# **kwargs, transformer.py:10-20).
_COMMON_KEYS = {"embedding_size", "hidden_size", "num_layers", "dropout"}
_FAMILY_KEYS = {
    Transformer: _COMMON_KEYS | {"num_heads"},
    EncoderDecoderAttnBase: _COMMON_KEYS,
    EncoderDecoderLSTMAttn: _COMMON_KEYS,
    EncoderDecoderGRUAttn: _COMMON_KEYS,
}


def model_family(name: str) -> str:
    """Sizing family of a registered model name: "transformer" |
    "lstm" | "gru" (consumed by search.driver.estimate_cell_bytes —
    each family has its own param/activation algebra)."""
    cls = resolve_model(name)
    if cls is EncoderDecoderLSTMAttn:
        return "lstm"
    if cls is EncoderDecoderGRUAttn:
        return "gru"
    return "transformer"


def resolve_model(name: str):
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model: '{name}' "
                         f"(known: {sorted(set(MODEL_REGISTRY))})")
    return MODEL_REGISTRY[name]


def build_model(name: str, src_vocab_size: int, tgt_vocab_size: int,
                src_pad_idx: int, tgt_pad_idx: int, bos_idx: int = 0,
                model_args: dict | None = None,
                compat_args: dict | None = None,
                precision_args: dict | None = None):
    """Instantiate a model from config values (the counterpart of the
    reference's lazy `module__*` construction, helper.py:53-59,93).

    precision_args: {"compute_dtype": "bfloat16"|"float32"} — params
    always stay float32; compute_dtype selects the matmul path.
    """
    import jax.numpy as jnp

    cls = resolve_model(name)
    model_args = dict(model_args or {})
    allowed = _FAMILY_KEYS.get(cls, _COMMON_KEYS)
    kwargs = {k: v for k, v in model_args.items()
              if k in allowed and v is not None}
    compat = {k: v for k, v in (compat_args or {}).items()
              if k in ("causal_encoder", "mask_memory", "tgt_input",
                       "attn_backend", "scan_layers")}
    if cls is not Transformer:
        compat = {}
    dtype_name = (precision_args or {}).get("compute_dtype")
    if dtype_name:
        kwargs["dtype"] = jnp.dtype(dtype_name)
    return cls(src_vocab_size=src_vocab_size,
               tgt_vocab_size=tgt_vocab_size,
               src_pad_idx=src_pad_idx,
               tgt_pad_idx=tgt_pad_idx,
               bos_idx=bos_idx,
               **kwargs, **compat)
