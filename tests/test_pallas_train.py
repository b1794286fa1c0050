"""Training-grade fused multi-head attention kernels (interpret mode on
CPU; dropout-active paths are TPU-only, validated by
scripts/validate_pallas_tpu.py against same-mask XLA autodiff)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sign_language_nlp_tpu.ops.attention import multi_head_attention
from sign_language_nlp_tpu.ops.pallas_attention_train import (
    fused_attention_train)

B, S, E, H = 3, 16, 32, 4


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, S, E)).astype(np.float32)
    k = rng.normal(size=(B, S, E)).astype(np.float32)
    v = rng.normal(size=(B, S, E)).astype(np.float32)
    bias = np.zeros((B, S, S), np.float32)
    bias[:, :, -3:] = -1e30
    seeds = np.arange(B, dtype=np.int32)
    return q, k, v, bias, seeds


def _xla(q, k, v, bias):
    # bias [B,Sq,Sk] → [B,1,Sq,Sk] for the einsum MHA path.
    return multi_head_attention(q, k, v, bias[:, None], num_heads=H,
                                backend="xla")


def test_forward_matches_xla(qkv):
    q, k, v, bias, seeds = qkv
    rate = np.array([0.0], np.float32)
    out = fused_attention_train(q, k, v, bias, seeds, rate, False, H)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_xla(q, k, v, bias)),
                               rtol=1e-5, atol=1e-6)


def test_custom_backward_matches_xla_autodiff(qkv):
    q, k, v, bias, seeds = qkv
    rate = np.array([0.0], np.float32)

    def loss_p(q, k, v):
        return jnp.sum(fused_attention_train(q, k, v, bias, seeds, rate,
                                             False, H) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(_xla(q, k, v, bias) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_cross_attention_shapes(qkv):
    q, k, v, bias, seeds = qkv
    rate = np.array([0.0], np.float32)
    q1 = q[:, :1]  # Sq=1 (the decoder's single-step query)
    bias1 = bias[:, :1]
    out = fused_attention_train(q1, k, v, bias1, seeds, rate, False, H)
    ref = _xla(q1, k, v, bias1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_vmap_population_axis(qkv):
    q, k, v, bias, seeds = qkv
    rate = np.array([0.0], np.float32)
    P = 3
    vm = jax.vmap(lambda a, b, c, d, e, f: fused_attention_train(
        a, b, c, d, e, f, False, H))
    stacked = [np.stack([x] * P) for x in (q, k, v, bias, seeds, rate)]
    out = vm(*stacked)
    single = fused_attention_train(q, k, v, bias, seeds, rate, False, H)
    assert out.shape == (P,) + single.shape
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single),
                               rtol=1e-6)


def test_grad_flows_under_jit_and_vmap(qkv):
    q, k, v, bias, seeds = qkv
    rate = np.array([0.0], np.float32)
    P = 2
    stacked = [jnp.asarray(np.stack([x] * P))
               for x in (q, k, v, bias, seeds, rate)]

    @jax.jit
    def loss(q, k, v, bias, seeds, rate):
        out = jax.vmap(lambda a, b, c, d, e, f: fused_attention_train(
            a, b, c, d, e, f, False, H))(q, k, v, bias, seeds, rate)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(*stacked)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_rows_per_program_override_snaps_to_divisor(monkeypatch):
    # ADVICE r2 (medium): the grid is (B // bb,), so a forced non-divisor
    # bb would silently skip the last B % bb rows. The override must snap
    # down to the largest divisor of B.
    from sign_language_nlp_tpu.ops.pallas_attention_train import (
        _rows_per_program)

    monkeypatch.setenv("PALLAS_ROWS_PER_PROGRAM", "16")
    assert _rows_per_program(50, S, S, E) == 10   # 16 -> 10 (50 % 10 == 0)
    monkeypatch.setenv("PALLAS_ROWS_PER_PROGRAM", "7")
    assert _rows_per_program(50, S, S, E) == 5
    monkeypatch.setenv("PALLAS_ROWS_PER_PROGRAM", "8")
    assert _rows_per_program(64, S, S, E) == 8    # divisors pass through
    monkeypatch.setenv("PALLAS_ROWS_PER_PROGRAM", "1000")
    assert _rows_per_program(50, S, S, E) == 50   # clamped to B


def test_auto_backend_requires_lane_aligned_embed(monkeypatch):
    # ADVICE r2: auto must not route E % 128 != 0 through the fused
    # kernel (64->128 lane padding ~2x inflates q/k/v/o HBM). Fake a TPU
    # backend; E=64 must take the XLA path (which works on CPU — if auto
    # had picked pallas, the TPU-only train path would diverge/fail).
    import sign_language_nlp_tpu.ops.attention as att

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 8, 64)).astype(np.float32)
    out = att.multi_head_attention(
        q, q, q, None, num_heads=2, dropout_rate=0.1,
        dropout_rng=jax.random.key(0), deterministic=False,
        backend="auto")
    ref = att.multi_head_attention(q, q, q, None, num_heads=2,
                                   backend="xla")
    # Same shapes and finite output via the XLA path (dropout makes the
    # values differ from the deterministic reference).
    assert out.shape == ref.shape and bool(jnp.isfinite(out).all())
