"""TPU-native ESM2 protein language model encoder.

The reference computes per-residue ESM2-650M embeddings with fair-esm on
GPU (``utils/inference_utils.py:137-157``, ``models/cg_model.py:76-81``)
and treats them as a 1280-d input feature. Round 1 gated the live-LM path
behind an optional torch dependency; this module closes that gap with a
from-scratch JAX implementation of the ESM2 architecture (RoPE attention,
pre-LN blocks, ESM-style token dropout scaling) that runs on TPU under
jit, plus a numerically-validated converter from HuggingFace ``EsmModel``
state dicts (``tests/test_esm2_jax.py`` checks parity against
``transformers``' torch implementation on a random-weight model).

Functional style (params = a plain dict pytree) so the converter is the
single source of truth for the layout; no flax module needed for a pure
encoder. Shapes are static per (batch, length) bucket; pad with the
``<pad>`` token and a 0 attention mask.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# The ESM alphabet (fair-esm ``Alphabet.from_architecture("ESM-1b")``,
# shared by every ESM2 release; part of the checkpoint contract).
ESM2_TOKENS: List[str] = [
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
]
TOKEN_TO_ID = {t: i for i, t in enumerate(ESM2_TOKENS)}
CLS_ID, PAD_ID, EOS_ID, UNK_ID = 0, 1, 2, 3
MASK_ID = TOKEN_TO_ID["<mask>"]


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = 33
    hidden_size: int = 1280  # esm2_t33_650M
    num_layers: int = 33
    num_heads: int = 20
    intermediate_size: int = 5120
    layer_norm_eps: float = 1e-5
    token_dropout: bool = True
    mask_token_id: int = MASK_ID
    pad_token_id: int = PAD_ID

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tokenize(sequence: str) -> np.ndarray:
    """<cls> + residues + <eos> (fair-esm batch_converter layout)."""
    ids = [CLS_ID] + [TOKEN_TO_ID.get(c, UNK_ID) for c in sequence] + [EOS_ID]
    return np.asarray(ids, np.int32)


def _layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _rotary_cos_sin(length: int, dim: int, dtype):
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
    )
    t = np.arange(length, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # (L, dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (L, dim)
    return jnp.asarray(np.cos(emb), dtype), jnp.asarray(np.sin(emb), dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rotary(x, cos, sin):
    # x: (B, heads, L, head_dim); cos/sin: (L, head_dim)
    return x * cos + _rotate_half(x) * sin


def esm2_forward(params: Dict, cfg: ESM2Config, tokens: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """tokens (B, L) int32, mask (B, L) {0,1} -> (B, L, hidden) f32.

    Matches HF ``EsmModel``'s ``last_hidden_state`` (ESM2 configuration:
    rotary positions, pre-LN blocks, token-dropout scaling, exact-erf
    gelu, final ``emb_layer_norm_after``).
    """
    cfg_eps = cfg.layer_norm_eps
    mask_f = mask.astype(jnp.float32)
    x = params["embed"][tokens]  # (B, L, H)

    if cfg.token_dropout:
        is_mask = (tokens == cfg.mask_token_id)[..., None]
        x = jnp.where(is_mask, 0.0, x)
        mask_ratio_train = 0.15 * 0.8
        src_len = mask_f.sum(-1)
        ratio_obs = is_mask[..., 0].astype(jnp.float32).sum(-1) / src_len
        x = x * (1.0 - mask_ratio_train) / (1.0 - ratio_obs)[:, None, None]

    x = x * mask_f[..., None]

    B, L, H = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    cos, sin = _rotary_cos_sin(L, hd, x.dtype)
    # additive attention bias: 0 for valid keys, -inf for padding
    bias = jnp.where(mask_f[:, None, None, :] > 0, 0.0, -jnp.inf)

    def heads(v):  # (B, L, H) -> (B, nh, L, hd)
        return v.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

    for li in range(cfg.num_layers):
        p = params["layers"][li]
        h_ln = _layer_norm(x, p["ln1_w"], p["ln1_b"], cfg_eps)
        q = heads(h_ln @ p["q_w"] + p["q_b"]) * (hd ** -0.5)
        k = heads(h_ln @ p["k_w"] + p["k_b"])
        v = heads(h_ln @ p["v_w"] + p["v_b"])
        q = _apply_rotary(q, cos, sin)
        k = _apply_rotary(k, cos, sin)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        x = x + (ctx @ p["attn_out_w"] + p["attn_out_b"])

        h_ln2 = _layer_norm(x, p["ln2_w"], p["ln2_b"], cfg_eps)
        ff = h_ln2 @ p["fc1_w"] + p["fc1_b"]
        ff = ff * 0.5 * (1.0 + jax.lax.erf(ff / np.sqrt(2.0)))  # exact gelu
        x = x + (ff @ p["fc2_w"] + p["fc2_b"])

    return _layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                       cfg_eps)


def convert_hf_state_dict(state_dict, num_layers: int) -> Dict:
    """HF ``EsmModel`` state dict (torch tensors or numpy arrays) -> our
    params pytree. Accepts keys with or without a leading ``esm.`` prefix
    (EsmModel vs EsmForMaskedLM checkpoints). Linear weights transpose
    from torch's (out, in) to (in, out)."""

    def arr(key):
        for k in (key, "esm." + key):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v, np.float32)
        raise KeyError(key)

    params = {
        "embed": arr("embeddings.word_embeddings.weight"),
        "final_ln_w": arr("encoder.emb_layer_norm_after.weight"),
        "final_ln_b": arr("encoder.emb_layer_norm_after.bias"),
        "layers": [],
    }
    for i in range(num_layers):
        pre = f"encoder.layer.{i}."
        params["layers"].append({
            "ln1_w": arr(pre + "attention.LayerNorm.weight"),
            "ln1_b": arr(pre + "attention.LayerNorm.bias"),
            "q_w": arr(pre + "attention.self.query.weight").T,
            "q_b": arr(pre + "attention.self.query.bias"),
            "k_w": arr(pre + "attention.self.key.weight").T,
            "k_b": arr(pre + "attention.self.key.bias"),
            "v_w": arr(pre + "attention.self.value.weight").T,
            "v_b": arr(pre + "attention.self.value.bias"),
            "attn_out_w": arr(pre + "attention.output.dense.weight").T,
            "attn_out_b": arr(pre + "attention.output.dense.bias"),
            "ln2_w": arr(pre + "LayerNorm.weight"),
            "ln2_b": arr(pre + "LayerNorm.bias"),
            "fc1_w": arr(pre + "intermediate.dense.weight").T,
            "fc1_b": arr(pre + "intermediate.dense.bias"),
            "fc2_w": arr(pre + "output.dense.weight").T,
            "fc2_b": arr(pre + "output.dense.bias"),
        })
    return params


def save_params(params: Dict, path: str,
                num_heads: Optional[int] = None) -> None:
    flat = {"embed": params["embed"],
            "final_ln_w": params["final_ln_w"],
            "final_ln_b": params["final_ln_b"]}
    for i, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            flat[f"layer{i}/{k}"] = v
    if num_heads is not None:
        flat["meta/num_heads"] = np.asarray(num_heads, np.int32)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params(path: str):
    """Returns (params, cfg) — the config is reconstructed from the stored
    shapes (+ the ``meta/num_heads`` entry when present)."""
    z = np.load(path)
    layers: List[Dict] = []
    i = 0
    while f"layer{i}/ln1_w" in z:
        layers.append({k.split("/", 1)[1]: z[k] for k in z.files
                       if k.startswith(f"layer{i}/")})
        i += 1
    params = {"embed": z["embed"], "final_ln_w": z["final_ln_w"],
              "final_ln_b": z["final_ln_b"], "layers": layers}
    hidden = params["embed"].shape[1]
    heads = (int(z["meta/num_heads"]) if "meta/num_heads" in z
             else max(1, hidden // 64))
    cfg = ESM2Config(
        vocab_size=params["embed"].shape[0],
        hidden_size=hidden,
        num_layers=len(layers),
        num_heads=heads,
        intermediate_size=layers[0]["fc1_w"].shape[1] if layers else 4 * hidden,
    )
    return params, cfg


class JaxESM2Embedder:
    """Per-chain embedding front end on TPU (drop-in for the torch-backed
    ``data/esm.py:ESM2Embedder``): returns per-residue representations
    (the <cls>/<eos> rows stripped), bucketing lengths to bound
    recompilation."""

    def __init__(self, params: Dict, cfg: ESM2Config,
                 length_quantum: int = 128):
        self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.quantum = length_quantum
        self._fwd = jax.jit(
            lambda p, t, m: esm2_forward(p, cfg, t, m)
        )

    def embed(self, sequence: str) -> np.ndarray:
        ids = tokenize(sequence)
        n = len(ids)
        lb = -(-n // self.quantum) * self.quantum
        toks = np.full((1, lb), PAD_ID, np.int32)
        toks[0, :n] = ids
        mask = np.zeros((1, lb), np.int32)
        mask[0, :n] = 1
        out = self._fwd(self.params, jnp.asarray(toks), jnp.asarray(mask))
        return np.asarray(out[0, 1 : n - 1])  # strip <cls>/<eos>

    def embed_protein(self, protein) -> np.ndarray:
        from diffdock_tpu.data.esm import chain_sequences

        parts = [self.embed(seq) for _, seq in chain_sequences(protein)]
        return np.concatenate(parts, axis=0)
