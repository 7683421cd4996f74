"""CLIP ViT-L/14 text encoder in Flax — produces the (77, 768) prompt
embedding the SD UNet cross-attends to.

The reference pipeline tokenizes the (empty) prompt with the SD-1.5
tokenizer and runs openai/clip-vit-large-patch14
(reference: core/inference/mix_methods/utils/inpainter.py:12-26 via
StableDiffusionControlNetInpaintPipeline). Zero-egress: no tokenizer vocab
ships here, but the empty prompt needs no tokenizer — it is
[BOS, EOS, EOS, ...] = [49406, 49407, 49407, ...] (SD pads with the EOS
token), provided as `empty_prompt_tokens()`. Arbitrary prompts can be fed
as precomputed token ids.

Activation parity vs transformers.CLIPTextModel:
tests/test_parity_diffusion.py.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BOS_TOKEN = 49406
EOS_TOKEN = 49407
MAX_TOKENS = 77


def empty_prompt_tokens(batch: int = 1) -> jnp.ndarray:
    """Token ids for prompt '' with SD padding (pad token == EOS)."""
    ids = np.full((batch, MAX_TOKENS), EOS_TOKEN, np.int32)
    ids[:, 0] = BOS_TOKEN
    return jnp.asarray(ids)


class ClipAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, causal_mask):
        B, N, C = x.shape
        d = C // self.heads

        def proj(name):
            p = nn.Dense(C, name=name)(x)
            return p.reshape(B, N, self.heads, d).transpose(0, 2, 1, 3)

        q = proj("q_proj") * d ** -0.5
        k = proj("k_proj")
        v = proj("v_proj")
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(causal_mask, logits, -1e9)
        a = jax.nn.softmax(logits, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="out_proj")(o)


class ClipLayer(nn.Module):
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, causal_mask):
        y = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + ClipAttention(self.heads, name="self_attn")(y, causal_mask)
        y = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, name="fc1")(y)
        h = h * nn.sigmoid(1.702 * h)          # quick_gelu
        x = x + nn.Dense(x.shape[-1], name="fc2")(h)
        return x


class ClipTextEncoder(nn.Module):
    """ViT-L/14 text tower: 12 layers, width 768, 12 heads, quick_gelu."""
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_tokens: int = MAX_TOKENS

    @nn.compact
    def __call__(self, token_ids):  # (B, 77) int32
        B, N = token_ids.shape
        tok = self.param("token_embedding",
                         nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (self.max_tokens, self.width))
        x = tok[token_ids] + pos[None, :N]
        causal = jnp.tril(jnp.ones((1, 1, N, N), bool))
        for i in range(self.layers):
            x = ClipLayer(self.heads, self.width * 4,
                          name=f"layer{i}")(x, causal)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


def convert_clip_text(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> ClipTextEncoder params."""
    from ..convert import _lin, _np, norm_params

    p = "text_model"
    if not any(k.startswith(p) for k in sd):
        p = ""  # bare text_model dumps

    def key(s):
        return f"{p}.{s}" if p else s

    params: Dict[str, Any] = {
        "token_embedding": _np(sd[key("embeddings.token_embedding.weight")]),
        "position_embedding": _np(
            sd[key("embeddings.position_embedding.weight")]),
        "final_layer_norm": norm_params(key("final_layer_norm"), sd),
    }
    i = 0
    while key(f"encoder.layers.{i}.layer_norm1.weight") in sd:
        lp = key(f"encoder.layers.{i}")
        params[f"layer{i}"] = {
            "layer_norm1": norm_params(f"{lp}.layer_norm1", sd),
            "layer_norm2": norm_params(f"{lp}.layer_norm2", sd),
            "self_attn": {n: _lin(sd, f"{lp}.self_attn.{n}")
                          for n in ("q_proj", "k_proj", "v_proj",
                                    "out_proj")},
            "fc1": _lin(sd, f"{lp}.mlp.fc1"),
            "fc2": _lin(sd, f"{lp}.mlp.fc2"),
        }
        i += 1
    return {"params": params}
