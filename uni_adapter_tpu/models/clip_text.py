"""CLIP text transformer (causal, QuickGELU, EOT-token pooling).

Rebuild of the reference text tower (models/ulip/text_encoder.py:8-106),
parameterised so one module covers all three text spaces the reference
loads:
  * ULIP's SLIP text encoder — width 512 / 12 layers / 8 heads (defaults)
  * open_clip ViT-bigG  — width 1280 / 32 layers / 20 heads (OpenShape)
  * open_clip EVA02-E-14-plus text tower (Uni3D) — width 1280 / 32 / 20

Precomputed text-feature banks (assets/text_features/*.npy, converted from
the reference's .pt files) normally bypass this tower at TTA; it exists for
the live `clip_classifier` path (Uni_Adapter.py:32-51).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.common import LN, Mlp, ViTAttention, quick_gelu


class ResidualAttentionBlock(nn.Module):
    """Pre-norm block with causal mask + QuickGELU MLP
    (reference text_encoder.py:24-46)."""
    width: int
    heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        a = ViTAttention(self.width, self.heads, qkv_bias=True,
                         dtype=self.dtype, name="attn")(
            LN(dtype=self.dtype, name="ln_1")(x), mask=mask)
        x = x + a
        x = x + Mlp(self.width, self.width * 4, act=quick_gelu,
                    dtype=self.dtype, name="mlp")(
            LN(dtype=self.dtype, name="ln_2")(x))
        return x


class TextEncoder(nn.Module):
    """CLIP text encoder (reference text_encoder.py:60-106)."""
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, text: jax.Array) -> jax.Array:
        """text: (B, 77) int32 token ids → (B, embed_dim) features."""
        tok_emb = self.param("token_embedding",
                             nn.initializers.normal(0.02),
                             (self.vocab_size, self.width))
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (self.context_length, self.width))
        x = tok_emb[text].astype(self.dtype) + pos_emb.astype(self.dtype)

        # additive causal mask (text_encoder.py:84-90)
        L = self.context_length
        mask = jnp.where(
            jnp.tril(jnp.ones((L, L), bool)), 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None]

        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       dtype=self.dtype,
                                       name=f"resblocks_{i}")(x, mask)
        x = LN(dtype=self.dtype, name="ln_final")(x)

        # EOT pooling: highest token id marks end of text (text_encoder.py:100)
        eot = jnp.argmax(text, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        text_projection = self.param("text_projection",
                                     nn.initializers.normal(0.02),
                                     (self.width, self.embed_dim))
        return jnp.matmul(pooled.astype(jnp.float32), text_projection,
                          precision=jax.lax.Precision.HIGHEST)

    def encode_text(self, text: jax.Array) -> jax.Array:
        return self(text)


#: Text-tower presets per backbone (reference utils/load_models.py:41-127).
TEXT_PRESETS = {
    "ulip": dict(width=512, layers=12, heads=8, embed_dim=512),
    "uni3d": dict(width=1280, layers=32, heads=20, embed_dim=1024),
    "openshape_vitg14": dict(width=1280, layers=32, heads=20, embed_dim=1280),
    "openshape_vitl14": dict(width=768, layers=12, heads=12, embed_dim=768),
}


def create_text_encoder(name: str, dtype=jnp.bfloat16) -> TextEncoder:
    return TextEncoder(dtype=dtype, **TEXT_PRESETS[name])
