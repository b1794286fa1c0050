"""scan_layers equivalence: stacking the unrolled per-layer params into
the scanned layout must reproduce the unrolled forward exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from sign_language_nlp_tpu.models import Transformer

B, S, VS, VT, L = 2, 12, 20, 6, 3
KW = dict(src_vocab_size=VS, tgt_vocab_size=VT, embedding_size=16,
          num_heads=4, num_layers=L, hidden_size=24)


def _batch():
    rng = np.random.default_rng(0)
    tokens = rng.integers(2, VS, (B, S)).astype(np.int32)
    lengths = np.array([S, 5], np.int32)
    for i in range(B):
        tokens[i, lengths[i]:] = 1
    y = np.array([2, 3], np.int32)
    return tokens, lengths, y


def _restack(unrolled_params):
    """Per-layer trees encoder_layer_i/... → stacked [L, ...] under
    encoder_layers/layer/..., matching the nn.scan parameter layout."""
    p = dict(unrolled_params["params"])
    out = {k: v for k, v in p.items()
           if not k.startswith(("encoder_layer_", "decoder_layer_"))}
    for stack, prefix in (("encoder_layers", "encoder_layer_"),
                          ("decoder_layers", "decoder_layer_")):
        per_layer = [p[f"{prefix}{i}"] for i in range(L)]
        out[stack] = {"layer": jax.tree.map(
            lambda *xs: jnp.stack(xs), *per_layer)}
    return {"params": out}


def test_scan_layers_matches_unrolled():
    tokens, lengths, y = _batch()
    unrolled = Transformer(**KW, scan_layers=False)
    scanned = Transformer(**KW, scan_layers=True)
    params = jax.jit(unrolled.init)({"params": jax.random.key(0)},
                                    tokens, lengths, y)
    out_u = unrolled.apply(params, tokens, lengths, y)
    out_s = scanned.apply(_restack(params), tokens, lengths, y)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)


def test_scan_layers_trains():
    tokens, lengths, y = _batch()
    scanned = Transformer(**KW, scan_layers=True)
    params = jax.jit(scanned.init)({"params": jax.random.key(0)},
                                   tokens, lengths, y)
    # Stacked layer params have a leading L axis:
    enc = params["params"]["encoder_layers"]["layer"]
    assert jax.tree.leaves(enc)[0].shape[0] == L

    def loss(p):
        out = scanned.apply(p, tokens, lengths, y, dropout_rate=0.1,
                            deterministic=False,
                            rngs={"dropout": jax.random.key(1)})
        return -out[jnp.arange(B), y].mean()

    g = jax.jit(jax.grad(loss))(params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
