"""JAX ESM2 encoder vs the HuggingFace torch implementation.

Builds a tiny random-weight ``EsmModel`` with the ESM2 configuration
(rotary positions, token dropout, no pre-embedding LN) and checks the
converted JAX forward matches ``last_hidden_state`` numerically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from diffdock_tpu.models.esm2 import (  # noqa: E402
    ESM2Config,
    JaxESM2Embedder,
    convert_hf_state_dict,
    esm2_forward,
    load_params,
    save_params,
    tokenize,
)

HID, LAYERS, HEADS, INTER = 64, 2, 4, 96


@pytest.fixture(scope="module")
def hf_model():
    from transformers import EsmConfig, EsmModel

    cfg = EsmConfig(
        vocab_size=33, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=256, position_embedding_type="rotary",
        token_dropout=True, emb_layer_norm_before=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1, mask_token_id=32, layer_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = EsmModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    cfg = ESM2Config(hidden_size=HID, num_layers=LAYERS, num_heads=HEADS,
                     intermediate_size=INTER)
    params = convert_hf_state_dict(hf_model.state_dict(), LAYERS)
    return cfg, params


def _compare(hf_model, cfg, params, tokens, mask):
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.asarray(np.asarray(tokens, np.int64)),
            attention_mask=torch.asarray(np.asarray(mask, np.int64)),
        ).last_hidden_state.numpy()
    out = np.asarray(esm2_forward(params, cfg, tokens, mask))
    # padded rows are unconstrained (HF computes garbage there); compare
    # valid rows only
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-4)


def test_matches_hf_full_batch(hf_model, jax_setup):
    cfg, params = jax_setup
    rng = np.random.RandomState(0)
    tokens = rng.randint(3, 30, (2, 17)).astype(np.int32)
    tokens[:, 0] = 0  # <cls>
    tokens[:, -1] = 2  # <eos>
    mask = np.ones_like(tokens)
    _compare(hf_model, cfg, params, tokens, mask)


def test_matches_hf_with_padding_and_mask_tokens(hf_model, jax_setup):
    """f64 on both sides: with padding the f32 noise floor (2e-4 after one
    layer) amplifies through the LayerNorms past any useful f32 tolerance,
    so the architecture check runs in double precision."""
    import jax

    cfg, params = jax_setup
    rng = np.random.RandomState(1)
    tokens = rng.randint(3, 30, (2, 21)).astype(np.int32)
    tokens[:, 0] = 0
    tokens[0, 5] = 32  # a <mask> token exercises the token-dropout scaling
    mask = np.ones_like(tokens)
    tokens[0, 15:] = 1  # pad
    mask[0, 15:] = 0
    tokens[0, 14] = 2
    tokens[1, -1] = 2

    # NOTE: current transformers' EsmModel.forward drops attention_mask
    # when calling embeddings, silently skipping the token-dropout length
    # scaling and padding zeroing — fair-esm (the reference's LM path,
    # esm/model/esm2.py) DOES apply both, and that is what we implement.
    # So the oracle here is embeddings(mask) + the encoder layers, not the
    # full EsmModel.forward.
    model64 = hf_model.double()
    tt = torch.asarray(np.asarray(tokens, np.int64))
    tm = torch.asarray(np.asarray(mask, np.int64))
    with torch.no_grad():
        h = model64.embeddings(input_ids=tt, attention_mask=tm)
        ext = model64.get_extended_attention_mask(tm, tokens.shape)
        for layer in model64.encoder.layer:
            o = layer(h, attention_mask=ext)
            h = o[0] if isinstance(o, tuple) else o
        ref = model64.encoder.emb_layer_norm_after(h).numpy()
    try:
        with jax.enable_x64(True):
            p64 = jax.tree.map(
                lambda a: np.asarray(a, np.float64), params
            )
            out = np.asarray(esm2_forward(p64, cfg, tokens, mask))
    finally:
        hf_model.float()
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=1e-6, atol=1e-6)


def test_embedder_roundtrip(hf_model, jax_setup, tmp_path):
    cfg, params = jax_setup
    path = str(tmp_path / "esm2_tiny.npz")
    save_params(params, path, num_heads=HEADS)
    params_l, cfg_l = load_params(path)
    assert cfg_l.num_heads == HEADS and cfg_l.intermediate_size == INTER
    emb = JaxESM2Embedder(params_l, cfg_l, length_quantum=16)
    seq = "MKTAYIAKQR"
    out = emb.embed(seq)
    assert out.shape == (len(seq), HID)

    ids = tokenize(seq)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.asarray(np.asarray(ids[None], np.int64)),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.int64),
        ).last_hidden_state.numpy()[0, 1:-1]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_make_embedder_uses_npz(jax_setup, tmp_path, monkeypatch):
    """data/esm.py picks the JAX backend when a converted npz is present."""
    cfg, params = jax_setup
    path = str(tmp_path / "esm2.npz")
    save_params(params, path, num_heads=HEADS)
    monkeypatch.setenv("DIFFDOCK_TPU_ESM2_NPZ", path)

    from diffdock_tpu.data.esm import make_embedder

    emb = make_embedder()
    assert isinstance(emb, JaxESM2Embedder)
    out = emb.embed("MKTAYI")
    assert out.shape == (6, HID) and np.isfinite(out).all()
