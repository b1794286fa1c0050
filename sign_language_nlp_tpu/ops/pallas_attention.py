"""Fused attention as a Pallas TPU kernel.

Design notes (per the Pallas TPU guide): ASL sequences are short
(tens-to-hundreds of frames; SURVEY.md §5 long-context note), so one
(batch*head) program instance fits its whole [S, D] q/k/v tiles and the
[S, S] score matrix in VMEM — no K/V streaming loop needed. The win
over XLA at this scale is fusing scores → bias-add → softmax → weighted
sum into one VMEM-resident pass (one HBM round-trip for q/k/v, one
write for out) instead of materializing the score tensor in HBM.

The backward pass reuses autodiff of the reference einsum formulation
(ops/attention.py) via jax.custom_vjp: forward numerics come from the
kernel, gradients from the mathematically-identical XLA graph. This
keeps the kernel small while making it a drop-in for both attention
sites (transformer MHA; Bahdanau uses its own fused einsum).

On non-TPU backends the kernel runs in interpreter mode (tests), so the
same code path is exercised everywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET_CACHE: dict = {}


def _needs_interpret() -> bool:
    if "v" not in _INTERPRET_CACHE:
        _INTERPRET_CACHE["v"] = jax.default_backend() not in ("tpu",)
    return _INTERPRET_CACHE["v"]


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    """One program = one (batch*head) slice: q/k/v [S, D], bias [S, S]."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    scores = scores + bias_ref[0]
    # Numerically-stable softmax on the VPU:
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom
    o_ref[0] = jnp.dot(probs.astype(v.dtype), v,
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def _pallas_attention_fwd_impl(q, k, v, bias):
    """q: [BH, Sq, D]; k/v: [BH, Sk, D]; bias: [BH, Sq, Sk]."""
    from jax.experimental import pallas as pl

    BH, Sq, D = q.shape
    Sk = k.shape[1]
    scale = 1.0 / (D ** 0.5)
    kernel = functools.partial(_attention_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, Sq, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Sk, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Sk, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Sq, Sk), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Sq, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        interpret=_needs_interpret(),
    )(q, k, v, bias)


def _xla_reference(q, k, v, bias):
    D = q.shape[-1]
    scale = 1.0 / (D ** 0.5)
    scores = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@jax.custom_vjp
def fused_attention(q, k, v, bias):
    """Pallas-forward attention over [BH, S, D] with additive bias
    [BH, S, S]; gradients via the XLA formulation."""
    return _pallas_attention_fwd_impl(q, k, v, bias)


def _fwd(q, k, v, bias):
    return _pallas_attention_fwd_impl(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(_xla_reference, q, k, v, bias)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def multi_head_attention_pallas(q, k, v, bias, *, num_heads: int):
    """[B, S, E] q/k/v + broadcastable bias → [B, S, E] via the fused
    multi-head kernel (pallas_attention_train with dropout off).

    Inputs stay in model layout — a head-split [B·H, S, D] HBM layout
    pads the D=E/H lane dim up to 128 and multiplies HBM footprint
    (observed 4x → OOM); the kernel splits heads internally instead."""
    import numpy as np

    from .pallas_attention_train import fused_attention_train

    B, Sq, E = q.shape
    Sk = k.shape[1]
    if bias is None:
        bias_hs = jnp.zeros((B, Sq, Sk), jnp.float32)
    else:
        b4 = jnp.broadcast_to(bias, (B, 1) + bias.shape[-2:])
        bias_hs = jnp.broadcast_to(b4[:, 0], (B, Sq, Sk))
    seeds = jnp.zeros((B,), jnp.int32)  # unused (dropout off)
    rate = jnp.zeros((1,), jnp.float32)
    return fused_attention_train(q, k, v, bias_hs.astype(jnp.float32),
                                 seeds, rate, False, num_heads)
