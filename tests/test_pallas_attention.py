"""Pallas fused-attention kernel: numerics vs the XLA formulation
(interpret mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sign_language_nlp_tpu.ops.attention import (causal_bias,
                                                 multi_head_attention,
                                                 padding_bias)
from sign_language_nlp_tpu.ops.pallas_attention import (
    fused_attention, multi_head_attention_pallas)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    B, H, S, D = 2, 2, 16, 8
    shape = (B * H, S, D)
    q = rng.normal(size=shape).astype(np.float32)
    k = rng.normal(size=shape).astype(np.float32)
    v = rng.normal(size=shape).astype(np.float32)
    bias = np.zeros((B * H, S, S), np.float32)
    bias[:, :, -4:] = -1e30  # mask the last 4 keys
    return q, k, v, bias


def test_fused_matches_xla(qkv):
    q, k, v, bias = qkv
    from sign_language_nlp_tpu.ops.pallas_attention import _xla_reference

    out_pallas = fused_attention(q, k, v, bias)
    out_xla = _xla_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out_pallas),
                               np.asarray(out_xla), rtol=1e-5, atol=1e-5)


def test_fused_gradients_flow(qkv):
    q, k, v, bias = qkv

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v))
    for gi in g:
        assert bool(jnp.isfinite(gi).all())
        assert float(jnp.abs(gi).max()) > 0


def test_mha_backend_parity():
    rng = np.random.default_rng(1)
    B, S, E, H = 3, 12, 16, 4
    q = rng.normal(size=(B, S, E)).astype(np.float32)
    kv = rng.normal(size=(B, S, E)).astype(np.float32)
    valid = np.ones((B, S), bool)
    valid[:, -3:] = False
    bias = padding_bias(jnp.asarray(valid)) + causal_bias(S)
    out_xla = multi_head_attention(q, kv, kv, bias, num_heads=H,
                                   backend="xla")
    out_pl = multi_head_attention(q, kv, kv, bias, num_heads=H,
                                  backend="pallas")
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)


def test_transformer_with_pallas_backend_matches_xla():
    from sign_language_nlp_tpu.models import Transformer

    rng = np.random.default_rng(2)
    B, S, VS, VT = 2, 8, 20, 6
    tokens = rng.integers(2, VS, (B, S)).astype(np.int32)
    lengths = np.array([8, 5], np.int32)
    for i in range(B):
        tokens[i, lengths[i]:] = 1
    y = np.array([2, 3], np.int32)

    kw = dict(src_vocab_size=VS, tgt_vocab_size=VT, embedding_size=16,
              num_heads=4, num_layers=1, hidden_size=16)
    m_xla = Transformer(**kw, attn_backend="xla")
    m_pl = Transformer(**kw, attn_backend="pallas")
    params = m_xla.init({"params": jax.random.key(0)}, tokens, lengths, y)
    out_xla = m_xla.apply(params, tokens, lengths, y)
    out_pl = m_pl.apply(params, tokens, lengths, y)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)
