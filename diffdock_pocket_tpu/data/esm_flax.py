"""TPU-native ESM2 protein language model (flax).

The reference computes receptor embeddings with fair-esm (PyTorch,
utils/esm.py:156-188) as a CPU/GPU preprocessing pass.  This is a faithful
flax port of the ESM2 architecture (rotary attention, pre-LN blocks,
token-dropout embedding compensation, exact-erf GELU) so the embedding pass
runs on the TPU itself, plus a weight converter from the HuggingFace torch
``EsmModel`` checkpoint layout.  Numerical parity with the torch
implementation is pinned by tests/test_esm_flax.py on a random-weight tiny
config (no pretrained weights are needed to verify the architecture).

ESM2 specifics mirrored from the HF implementation (modeling_esm.py):
- queries are scaled by head_dim**-0.5 BEFORE rotary embedding (not the
  logits after), which matters because RoPE does not commute with scaling;
- rotary tables use the RoFormer convention: emb = concat(freqs, freqs),
  rotate_half(x) = concat(-x2, x1) over halves (not interleaved pairs);
- GELU is the exact erf form (tanh-approx GELU is subtly wrong for ESM);
- token_dropout: mask-token embeddings are zeroed and the rest rescaled by
  (1 - 0.15*0.8) / (1 - observed mask ratio);
- embeddings are multiplied by the padding mask; a final LayerNorm follows
  the encoder stack.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# canonical ESM2 alphabet (fair-esm Alphabet.from_architecture("ESM-1b"))
ESM2_TOKENS = (
    ["<cls>", "<pad>", "<eos>", "<unk>"]
    + list("LAGVSERTIDPKQNFYMHWCXBUZO")
    + [".", "-", "<null_1>", "<mask>"]
)
TOKEN_TO_ID = {t: i for i, t in enumerate(ESM2_TOKENS)}
CLS, PAD, EOS, UNK, MASK = 0, 1, 2, 3, TOKEN_TO_ID["<mask>"]


@dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = 33
    hidden_size: int = 1280
    num_layers: int = 33
    num_heads: int = 20
    intermediate_size: int = 5120
    layer_norm_eps: float = 1e-5
    token_dropout: bool = True
    mask_token_id: int = MASK
    pad_token_id: int = PAD


def _rope_tables(L: int, dim: int, dtype=jnp.float32):
    # inv_freq is rounded to float32 first: torch registers it as an f32
    # buffer at init, so all ESM2 checkpoints (and the f64 parity test)
    # carry f32-quantized frequencies
    inv_freq = (
        1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ).astype(np.float32)
    t = jnp.arange(L, dtype=dtype)
    freqs = jnp.outer(t, jnp.asarray(inv_freq, dtype))  # [L, dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [L, dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(x, cos, sin):
    # x [B, heads, L, dim]; cos/sin [L, dim]
    return x * cos[None, None] + _rotate_half(x) * sin[None, None]


class ESM2Layer(nn.Module):
    cfg: ESM2Config

    @nn.compact
    def __call__(self, x, mask):  # x [B, L, H], mask [B, L] bool
        cfg = self.cfg
        H = cfg.hidden_size
        nh = cfg.num_heads
        hd = H // nh
        B, L, _ = x.shape

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False, name="ln1")(x)
        q = nn.Dense(H, name="q")(h).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        k = nn.Dense(H, name="k")(h).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        v = nn.Dense(H, name="v")(h).reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

        q = q * (hd ** -0.5)  # scale BEFORE rotary (ESM convention)
        cos, sin = _rope_tables(L, hd, x.dtype)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        neg = jnp.finfo(x.dtype).min
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, H)
        x = x + nn.Dense(H, name="o")(out)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
        h = h * 0.5 * (1.0 + jax.lax.erf(h / jnp.sqrt(2.0).astype(h.dtype)))
        x = x + nn.Dense(H, name="fc2")(h)
        return x


class ESM2(nn.Module):
    cfg: ESM2Config

    @nn.compact
    def __call__(self, tokens, mask):  # [B, L] int32, [B, L] bool
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="embed")(tokens)

        if cfg.token_dropout:
            # mask-token compensation.  NOTE: we mirror the HF EsmModel tier
            # we convert weights from, which computes the observed ratio over
            # the full (padded) length and does not zero pad embeddings
            # (modeling_esm.py passes no attention_mask into EsmEmbeddings);
            # fair-esm normalizes by true lengths instead.  Protein-embedding
            # inputs never contain <mask>, so valid positions agree either
            # way (pinned by the f64 parity test).
            is_mask = tokens == cfg.mask_token_id
            x = jnp.where(is_mask[..., None], 0.0, x)
            mask_ratio_train = 0.15 * 0.8
            observed = is_mask.sum(-1) / tokens.shape[1]
            x = x * ((1 - mask_ratio_train) / (1 - observed))[:, None, None]
        for i in range(cfg.num_layers):
            x = ESM2Layer(cfg, name=f"layer_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False, name="final_ln")(x)
        return x


# ---------------------------------------------------------------------------
# torch (HuggingFace EsmModel) -> flax weight conversion
# ---------------------------------------------------------------------------

def config_from_torch(torch_cfg) -> ESM2Config:
    return ESM2Config(
        vocab_size=torch_cfg.vocab_size,
        hidden_size=torch_cfg.hidden_size,
        num_layers=torch_cfg.num_hidden_layers,
        num_heads=torch_cfg.num_attention_heads,
        intermediate_size=torch_cfg.intermediate_size,
        layer_norm_eps=torch_cfg.layer_norm_eps,
        token_dropout=torch_cfg.token_dropout,
        mask_token_id=torch_cfg.mask_token_id,
        pad_token_id=torch_cfg.pad_token_id,
    )


def convert_torch_esm(torch_model) -> tuple[ESM2Config, dict]:
    """HF ``EsmModel`` (rotary, ESM2-style) -> (ESM2Config, flax params)."""
    sd = {k: np.asarray(v.detach().cpu().numpy()) for k, v in torch_model.state_dict().items()}
    cfg = config_from_torch(torch_model.config)
    assert torch_model.config.position_embedding_type == "rotary", (
        "only the ESM2 rotary architecture is supported"
    )

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {"embed": {"embedding": sd["embeddings.word_embeddings.weight"]}}
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "ln1": ln(f"{p}.attention.LayerNorm"),
            "q": dense(f"{p}.attention.self.query"),
            "k": dense(f"{p}.attention.self.key"),
            "v": dense(f"{p}.attention.self.value"),
            "o": dense(f"{p}.attention.output.dense"),
            "ln2": ln(f"{p}.LayerNorm"),
            "fc1": dense(f"{p}.intermediate.dense"),
            "fc2": dense(f"{p}.output.dense"),
        }
    params["final_ln"] = ln("encoder.emb_layer_norm_after")
    return cfg, jax.tree.map(jnp.asarray, params)


def tokenize(seqs: list[str], max_len: int | None = None):
    """ESM2 tokenization with <cls>/<eos> framing and <pad> padding.

    Returns (tokens [B, L] int32, mask [B, L] bool); residue i of sequence b
    is at tokens[b, i + 1]."""
    n = max(len(s) for s in seqs) if seqs else 0
    L = (max_len or n) + 2
    toks = np.full((len(seqs), L), PAD, np.int32)
    mask = np.zeros((len(seqs), L), bool)
    for b, s in enumerate(seqs):
        toks[b, 0] = CLS
        for i, c in enumerate(s):
            toks[b, i + 1] = TOKEN_TO_ID.get(c, UNK)
        toks[b, len(s) + 1] = EOS
        mask[b, : len(s) + 2] = True
    return jnp.asarray(toks), jnp.asarray(mask)
