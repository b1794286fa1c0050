"""Model family tests: shapes, log-prob validity, padding invariance,
quirk flags, and torch parity for the recurrent encoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sign_language_nlp_tpu.models import (EncoderDecoderGRUAttn,
                                          EncoderDecoderLSTMAttn,
                                          Transformer)
from sign_language_nlp_tpu.models.encoder_decoder import BiRNNEncoder
from sign_language_nlp_tpu.models.registry import build_model, resolve_model

B, S, VS, VT = 3, 16, 30, 8


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    tokens = rng.integers(2, VS, (B, S)).astype(np.int32)
    lengths = np.array([16, 9, 2], dtype=np.int32)
    for i in range(B):
        tokens[i, lengths[i]:] = 1  # pad idx
    y = np.array([2, 3, 4], dtype=np.int32)
    return tokens, lengths, y


MODELS = {
    "transformer": dict(name="model.Transformer",
                        margs={"embedding_size": 16, "hidden_size": 32,
                               "num_layers": 2, "num_heads": 4,
                               "dropout": 0.1}),
    "lstm": dict(name="model.EncoderDecoderLSTMAttn",
                 margs={"embedding_size": 12, "hidden_size": 16,
                        "num_layers": 2, "dropout": 0.1}),
    "gru": dict(name="model.EncoderDecoderGRUAttn",
                margs={"embedding_size": 12, "hidden_size": 16,
                       "num_layers": 1, "dropout": 0.1}),
}


def _init_and_apply(model, batch, **apply_kw):
    tokens, lengths, y = batch
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 tokens, lengths, y)
    out = jax.jit(lambda p, t, l, yy: model.apply(p, t, l, yy))(
        params, tokens, lengths, y)
    return params, out


@pytest.mark.parametrize("family", list(MODELS))
def test_forward_is_log_probs(family, batch):
    cfg = MODELS[family]
    model = build_model(cfg["name"], VS, VT, 1, 1, model_args=cfg["margs"])
    _, out = _init_and_apply(model, batch)
    assert out.shape == (B, VT)
    assert bool(jnp.isfinite(out).all())
    # float32 log_softmax: exp-sums are ~1 within a few e-5
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=2e-4)


@pytest.mark.parametrize("family", ["lstm", "gru"])
def test_rnn_padding_invariance(family, batch):
    # Content beyond each row's length must not affect the output
    # (mask-aware scan ≡ pack_padded semantics).
    cfg = MODELS[family]
    tokens, lengths, y = batch
    model = build_model(cfg["name"], VS, VT, 1, 1, model_args=cfg["margs"])
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 tokens, lengths, y)
    fwd = jax.jit(lambda p, t: model.apply(p, t, lengths, y))
    out1 = fwd(params, tokens)
    scrambled = tokens.copy()
    for i in range(B):
        scrambled[i, lengths[i]:] = 1  # stays pad; also try junk below
    out2 = fwd(params, scrambled)
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_transformer_masked_memory_padding_invariance(batch):
    # With mask_memory=True (non-faithful mode) the classifier output
    # must be independent of how much padding follows each row.
    tokens, lengths, y = batch
    model = Transformer(src_vocab_size=VS, tgt_vocab_size=VT,
                        embedding_size=16, num_heads=4, num_layers=1,
                        hidden_size=32, mask_memory=True)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 tokens, lengths, y)
    out1 = jax.jit(lambda p, t: model.apply(p, t, lengths, y))(params, tokens)
    # Extend padding: same rows, extra pad columns.
    wide = np.concatenate([tokens, np.full((B, 8), 1, np.int32)], axis=1)
    out2 = jax.jit(lambda p, t: model.apply(p, t, lengths, y))(params, wide)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_transformer_label_leakage_flag(batch):
    # Faithful mode feeds y to the decoder (reference transformer.py:65);
    # output must depend on y. In "bos" mode it must not.
    tokens, lengths, y = batch
    y2 = np.array([5, 6, 7], dtype=np.int32)
    faithful = Transformer(src_vocab_size=VS, tgt_vocab_size=VT,
                           embedding_size=16, num_heads=4, num_layers=1,
                           hidden_size=32, tgt_input="label")
    params = jax.jit(faithful.init)({"params": jax.random.key(0)},
                                    tokens, lengths, y)
    f = jax.jit(lambda p, yy: faithful.apply(p, tokens, lengths, yy))
    assert not np.allclose(f(params, y), f(params, y2))

    sane = Transformer(src_vocab_size=VS, tgt_vocab_size=VT,
                       embedding_size=16, num_heads=4, num_layers=1,
                       hidden_size=32, tgt_input="bos")
    params = jax.jit(sane.init)({"params": jax.random.key(0)},
                                tokens, lengths, y)
    g = jax.jit(lambda p, yy: sane.apply(p, tokens, lengths, yy))
    np.testing.assert_allclose(g(params, y), g(params, y2))


def test_rnn_output_independent_of_y(batch):
    # The RNN family's decoder consumes only the BOS embedding
    # (MAX_OUTPUT_LEN=1), so y never affects the forward pass.
    tokens, lengths, y = batch
    cfg = MODELS["gru"]
    model = build_model(cfg["name"], VS, VT, 1, 1, model_args=cfg["margs"])
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 tokens, lengths, y)
    f = jax.jit(lambda p, yy: model.apply(p, tokens, lengths, yy))
    np.testing.assert_allclose(f(params, y),
                               f(params, np.array([7, 7, 7], np.int32)))


def test_dropout_reproducible(batch):
    tokens, lengths, y = batch
    cfg = MODELS["transformer"]
    model = build_model(cfg["name"], VS, VT, 1, 1, model_args=cfg["margs"])
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 tokens, lengths, y)
    f = jax.jit(lambda p, k: model.apply(
        p, tokens, lengths, y, dropout_rate=0.3, deterministic=False,
        rngs={"dropout": k}))
    a = f(params, jax.random.key(5))
    b = f(params, jax.random.key(5))
    c = f(params, jax.random.key(6))
    np.testing.assert_allclose(a, b)
    assert not np.allclose(a, c)


def test_registry_unknown_raises():
    with pytest.raises(ValueError, match="Unknown model"):
        resolve_model("model.DoesNotExist")


# --------------------------------------------------------------- torch parity
@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_birnn_matches_torch_packed(cell):
    """The mask-aware scan encoder must reproduce torch's packed
    bidirectional RNN: per-position outputs and final per-layer
    fwd/bwd-concat hidden states (reference Encoder semantics,
    encoder_decoder_attn_bkp.py:102-159)."""
    import torch

    torch.manual_seed(0)
    Bt, St, E, H, L = 3, 7, 5, 4, 2
    lengths = np.array([7, 4, 1], dtype=np.int32)
    # float64 on both sides: XLA-CPU and libm transcendental
    # approximations differ at ~1e-6 in float32 and compound through the
    # recurrence; in f64 the comparison pins the exact semantics.
    x = np.random.default_rng(1).normal(size=(Bt, St, E))
    valid = np.arange(St)[None, :] < lengths[:, None]

    rnn_cls = torch.nn.LSTM if cell == "lstm" else torch.nn.GRU
    t_rnn = rnn_cls(input_size=E, hidden_size=H, num_layers=L,
                    batch_first=True, bidirectional=True).double()
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False)
    with torch.no_grad():
        out_packed, hidden = t_rnn(packed)
    t_out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=St, padding_value=0.0)
    h_n = hidden[0] if cell == "lstm" else hidden  # [L*2, B, H]
    t_hidden_concat = torch.cat([h_n[0::2], h_n[1::2]], dim=2)  # [L,B,2H]

    # Copy torch weights into our parameter layout (transpose: torch is
    # [G*H, in], ours [in, G*H]; gate order matches).
    with jax.enable_x64():
        enc = BiRNNEncoder(input_size=E, hidden_size=H, num_layers=L,
                           cell_type=cell)
        new_params = {"params": {}}
        for layer in range(L):
            for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
                new_params["params"][f"l{layer}_{direction}"] = {
                    "w_ih": jnp.asarray(getattr(
                        t_rnn,
                        f"weight_ih_l{layer}{suffix}").detach().numpy().T),
                    "w_hh": jnp.asarray(getattr(
                        t_rnn,
                        f"weight_hh_l{layer}{suffix}").detach().numpy().T),
                    "b_ih": jnp.asarray(getattr(
                        t_rnn, f"bias_ih_l{layer}{suffix}").detach().numpy()),
                    "b_hh": jnp.asarray(getattr(
                        t_rnn, f"bias_hh_l{layer}{suffix}").detach().numpy()),
                }
        out, hidden_concat = jax.jit(
            lambda p: enc.apply(p, jnp.asarray(x, jnp.float64),
                                jnp.asarray(valid), 0.0, True)
        )(new_params)
        out = np.asarray(out)
        hidden_concat = np.asarray(hidden_concat)

    np.testing.assert_allclose(out, t_out.numpy(), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(hidden_concat,
                               t_hidden_concat.numpy(), rtol=1e-9, atol=1e-9)
