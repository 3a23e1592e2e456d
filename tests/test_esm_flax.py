"""Numerical parity of the flax ESM2 port against the HuggingFace torch
implementation on a random-weight tiny config (architecture parity without
pretrained weights), plus tokenizer framing checks."""
import numpy as np
import pytest

from diffdock_pocket_tpu.data import esm_flax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


import contextlib


@contextlib.contextmanager
def _x64():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def torch_tiny():
    from transformers import EsmConfig, EsmModel

    cfg = EsmConfig(
        vocab_size=33,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=48,
        max_position_embeddings=64,
        position_embedding_type="rotary",
        token_dropout=True,
        emb_layer_norm_before=False,
        pad_token_id=1,
        mask_token_id=32,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = EsmModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


def test_flax_matches_torch(torch_tiny):
    """Run BOTH implementations in float64: rounding noise (which random
    untrained layers amplify chaotically) vanishes, so any surviving
    difference is an architecture/conversion bug."""
    import jax

    model_t = torch_tiny.double()
    rng = np.random.default_rng(0)
    B, L = 3, 17
    lens = [17, 11, 5]
    toks = np.full((B, L), 1, np.int64)  # pad
    mask = np.zeros((B, L), np.int64)
    for b, n in enumerate(lens):
        toks[b, :n] = rng.integers(4, 29, n)
        toks[b, 0] = 0  # cls
        toks[b, n - 1] = 2  # eos
        mask[b, :n] = 1
    toks[1, 3] = 32  # a mask token exercises token_dropout compensation

    with torch.no_grad():
        ref = model_t(
            input_ids=torch.tensor(toks), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    with jax.default_matmul_precision("highest"), _x64():
        cfg, params = esm_flax.convert_torch_esm(model_t)
        model = esm_flax.ESM2(cfg)
        out = np.asarray(
            model.apply({"params": params}, np.asarray(toks, np.int32),
                        np.asarray(mask, bool))
        )
    assert out.dtype == np.float64
    # tolerance floor: HF's eager_attention_forward hardcodes the softmax in
    # float32 even for f64 inputs (softmax(..., dtype=torch.float32)); our
    # port keeps full precision, leaving ~7e-8 of torch-side f32 noise. Any
    # architecture/conversion bug shows up orders of magnitude above this.
    # (In production both sides run f32, where the behaviors coincide.)
    # only valid positions are comparable (torch computes garbage values at
    # padded query positions; we mask keys identically so valid rows agree)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(out[b, :n], ref[b, :n], atol=5e-7, rtol=5e-7)


def test_tokenize_framing():
    toks, mask = esm_flax.tokenize(["LAG", "V"])
    assert toks.shape == (2, 5)
    assert toks[0, 0] == esm_flax.CLS and toks[0, 4] == esm_flax.EOS
    assert toks[1, 2] == esm_flax.EOS and toks[1, 3] == esm_flax.PAD
    assert mask[0].all() and not mask[1, 3]
    # residue characters map to the canonical alphabet
    assert [int(t) for t in toks[0, 1:4]] == [
        esm_flax.TOKEN_TO_ID[c] for c in "LAG"
    ]


def test_flax_embedder_tier(monkeypatch, tmp_path):
    """FlaxESMEmbedder end-to-end on a tiny local checkpoint: per-chain
    [L, H] float32 arrays, empty chains -> [0, H]."""
    from transformers import EsmConfig, EsmModel

    from diffdock_pocket_tpu.data import esm as esm_mod

    cfg = EsmConfig(
        vocab_size=33, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=24,
        max_position_embeddings=128, position_embedding_type="rotary",
        token_dropout=True, emb_layer_norm_before=False,
        pad_token_id=1, mask_token_id=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    EsmModel(cfg, add_pooling_layer=False).save_pretrained(tmp_path / "tiny_esm")
    emb = esm_mod.FlaxESMEmbedder(str(tmp_path / "tiny_esm"))
    outs = emb.embed_chains(["LAGVSER", "", "MKT"])
    assert outs[0].shape == (7, 16) and outs[0].dtype == np.float32
    assert outs[1].shape == (0, 16)
    assert outs[2].shape == (3, 16)
    assert np.all(np.isfinite(outs[0]))
