"""TPU-only validation of the dropout-active fused attention kernels.

CPU CI can't run the TPU PRNG, so this script is the acceptance test
for the in-kernel dropout path. It checks, on the real device:
  1. no-dropout forward == XLA reference;
  2. dropout forward is deterministic per seed, differs across seeds,
     keeps ~(1-rate) of weights;
  3. extracting the actual per-head mask (v = head-tiled identity) and
     replaying it through an XLA graph reproduces BOTH the forward and
     all three input gradients (same-mask equivalence).

Run: python scripts/validate_pallas_tpu.py   (passes/fails loudly)
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from sign_language_nlp_tpu.ops.attention import multi_head_attention
    from sign_language_nlp_tpu.ops.pallas_attention_train import (
        fused_attention_train)

    assert jax.default_backend() == "tpu", "requires the TPU backend"
    rng = np.random.default_rng(0)
    B, S, H = 2, 64, 2
    D = S  # head dim = S so v can be a per-head identity (mask probe)
    E = H * D
    q = rng.normal(size=(B, S, E)).astype(np.float32)
    k = rng.normal(size=(B, S, E)).astype(np.float32)
    v = rng.normal(size=(B, S, E)).astype(np.float32)
    bias = np.zeros((B, S, S), np.float32)
    seeds = np.arange(B, dtype=np.int32)
    r0 = np.array([0.0], np.float32)
    r5 = np.array([0.5], np.float32)

    def xla(q, k, v):
        return multi_head_attention(q, k, v, bias[:, None], num_heads=H,
                                    backend="xla")

    out = fused_attention_train(q, k, v, bias, seeds, r0, False, H)
    d = float(jnp.abs(out - xla(q, k, v)).max())
    assert d < 1e-5, f"no-dropout fwd mismatch {d}"

    o1 = fused_attention_train(q, k, v, bias, seeds, r5, True, H)
    o2 = fused_attention_train(q, k, v, bias, seeds, r5, True, H)
    assert bool(jnp.allclose(o1, o2)), "dropout must be seed-deterministic"
    o3 = fused_attention_train(q, k, v, bias, seeds + 9, r5, True, H)
    assert not bool(jnp.allclose(o1, o3)), "seeds must matter"

    # Mask probe: v = per-head identity → output head h = Pd_h.
    eye = np.zeros((B, S, E), np.float32)
    for h in range(H):
        eye[:, :, h * D:(h + 1) * D] = np.eye(S, dtype=np.float32)
    pd = np.asarray(fused_attention_train(q, k, eye, bias, seeds, r5,
                                          True, H))
    # pd[:, i, h*D+j] = Pd_h[i, j] → mask [B,H,S,S]
    mask = np.stack([(pd[:, :, h * D:(h + 1) * D] > 0)
                     for h in range(H)], axis=1).astype(np.float32)
    keep = float(mask.mean())
    assert abs(keep - 0.5) < 0.02, f"keep fraction {keep} != ~0.5"

    def xla_masked(q, k, v):
        qh = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(D)
        s = s + bias[:, None]
        p = jax.nn.softmax(s, -1) * mask / 0.5
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(B, S, E)

    op = fused_attention_train(q, k, v, bias, seeds, r5, True, H)
    d = float(jnp.abs(op - xla_masked(q, k, v)).max())
    assert d < 1e-5, f"dropout fwd vs same-mask XLA mismatch {d}"

    gp = jax.grad(lambda q, k, v: jnp.sum(fused_attention_train(
        q, k, v, bias, seeds, r5, True, H) ** 2), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(xla_masked(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gp, gx):
        d = float(jnp.abs(a - b).max())
        ref = float(jnp.abs(b).max())
        assert d < 2e-4 * max(ref, 1.0), f"d{name} mismatch {d} (ref {ref})"
    print("validate_pallas_tpu: ALL CHECKS PASSED "
          f"(keep fraction {keep:.4f})")


if __name__ == "__main__":
    main()
