"""Uni3D: point-cloud encoder with an EVA02-Large transformer trunk.

TPU-native rebuild of the reference Uni3D path
(models/uni3d.py:9-45 + models/point_encoder.py:93-223):

    (B, N, 6) xyz‖color
      → Group: FPS 512 centers + kNN-64 neighbourhoods, center-relative
        xyz ‖ color                       (point_encoder.py:99-127)
      → mini-PointNet Encoder: per-point MLP 6→128→256, group max-pool,
        concat, 512→512→encoder_dim, max-pool   (point_encoder.py:131-159)
      → encoder2trans Linear → [CLS ‖ tokens] + pos-embed MLP(3→128→width)
      → EVA02 blocks (rope inactive; see common.EvaBlock)
      → norm(CLS) → fc_norm → trans2embed → (B, embed_dim)

All geometry runs through ops/geometry (Pallas FPS optional); the trunk is
plain flax so pjit/NamedSharding can shard it without special casing.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.common import BatchNormInference, EvaBlock, LN, gelu_exact
from uni_adapter_tpu.ops.geometry import group_points


class MiniPointNet(nn.Module):
    """Group-feature encoder (reference point_encoder.py:131-159 `Encoder`).

    Conv1d(k=1) ≡ per-point Dense; the two max-pools are over the group axis.
    """
    encoder_channel: int
    in_channels: int = 6       # xyz-relative ‖ color (3 for ULIP's variant)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, point_groups: jax.Array) -> jax.Array:
        # point_groups: (B, G, M, C)
        B, G, M, C = point_groups.shape
        if C != self.in_channels:
            raise ValueError(
                f"MiniPointNet(in_channels={self.in_channels}) fed "
                f"{C}-channel groups — a silent mismatch would build the "
                f"wrong conv1 kernel shape")
        x = point_groups.astype(self.dtype)
        x = nn.Dense(128, dtype=self.dtype, name="conv1")(x)
        x = BatchNormInference(128, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(256, dtype=self.dtype, name="conv2")(x)          # (B,G,M,256)
        g = jnp.max(x, axis=2, keepdims=True)                          # (B,G,1,256)
        x = jnp.concatenate([jnp.broadcast_to(g, x.shape), x], axis=-1)
        x = nn.Dense(512, dtype=self.dtype, name="conv3")(x)
        x = BatchNormInference(512, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, dtype=self.dtype, name="conv4")(x)
        return jnp.max(x, axis=2)                                      # (B,G,C')


class PosEmbedMLP(nn.Module):
    """3 → 128 → width GELU MLP (reference point_encoder.py:183-187)."""
    width: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, center: jax.Array) -> jax.Array:
        x = nn.Dense(128, dtype=self.dtype, name="fc1")(center.astype(self.dtype))
        x = gelu_exact(x)
        return nn.Dense(self.width, dtype=self.dtype, name="fc2")(x)


class PointcloudEncoder(nn.Module):
    """Uni3D point encoder (reference point_encoder.py:161-223)."""
    trans_dim: int = 1024       # EVA02-L width (args.pc_feat_dim)
    embed_dim: int = 1024       # CLIP embedding dim
    num_group: int = 512
    group_size: int = 64
    encoder_dim: int = 512
    depth: int = 24             # EVA02-L
    num_heads: int = 16
    mlp_ratio: float = 4 * 2 / 3   # EVA02 SwiGLU hidden/width ratio
    use_pallas_fps: bool = False
    approx_knn: bool = False
    use_pallas_knn: bool = False
    use_pallas_knn_gather: bool = False
    quantize: bool = False      # int8 MXU trunk (opt-in, beyond parity)
    use_pallas_attention: bool = False
    use_pallas_attn_block: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xyz: jax.Array, color: jax.Array,
                 return_attn: bool = False):
        _, center, features = group_points(
            xyz, color, self.num_group, self.group_size,
            use_pallas_fps=self.use_pallas_fps, approx_knn=self.approx_knn,
            use_pallas_knn=self.use_pallas_knn,
            use_pallas_knn_gather=self.use_pallas_knn_gather)
        tokens = MiniPointNet(self.encoder_dim, 6, dtype=self.dtype,
                              name="encoder")(features)
        tokens = nn.Dense(self.trans_dim, dtype=self.dtype,
                          name="encoder2trans")(tokens)

        B = tokens.shape[0]
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.trans_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                             (1, 1, self.trans_dim))
        pos = PosEmbedMLP(self.trans_dim, dtype=self.dtype,
                          name="pos_embed")(center)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype),
                              (B, 1, self.trans_dim)), tokens], axis=1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos.astype(self.dtype),
                              (B, 1, self.trans_dim)), pos], axis=1)
        x = x + pos   # pos added once, before the blocks (point_encoder.py:210)

        attn_maps = []
        for i in range(self.depth):
            x = EvaBlock(self.trans_dim, self.num_heads,
                         mlp_ratio=self.mlp_ratio,
                         quantize=self.quantize,
                         use_pallas_attention=self.use_pallas_attention,
                         use_pallas_attn_block=self.use_pallas_attn_block,
                         dtype=self.dtype,
                         name=f"blocks_{i}")(x, return_attn=return_attn)
            if return_attn:
                x, attn = x
                attn_maps.append(attn)

        x = LN(dtype=self.dtype, name="norm")(x[:, 0, :])
        x = LN(dtype=self.dtype, name="fc_norm")(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="trans2embed")(x)
        if return_attn:
            return x, attn_maps
        return x


class Uni3D(nn.Module):
    """Top-level wrapper (reference models/uni3d.py:9-28): split (B, N, 6)
    into xyz + color and encode."""
    trans_dim: int = 1024
    embed_dim: int = 1024
    num_group: int = 512
    group_size: int = 64
    encoder_dim: int = 512
    depth: int = 24
    num_heads: int = 16
    use_pallas_fps: bool = False
    approx_knn: bool = False
    use_pallas_knn: bool = False
    use_pallas_knn_gather: bool = False
    quantize: bool = False
    use_pallas_attention: bool = False
    use_pallas_attn_block: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pc: jax.Array, return_attn: bool = False):
        xyz, color = pc[:, :, :3], pc[:, :, 3:]
        out = PointcloudEncoder(
            self.trans_dim, self.embed_dim, self.num_group, self.group_size,
            self.encoder_dim, self.depth, self.num_heads,
            use_pallas_fps=self.use_pallas_fps, approx_knn=self.approx_knn,
            use_pallas_knn=self.use_pallas_knn,
            use_pallas_knn_gather=self.use_pallas_knn_gather,
            quantize=self.quantize,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_attn_block=self.use_pallas_attn_block,
            dtype=self.dtype,
            name="point_encoder",
        )(xyz, color, return_attn=return_attn)
        if return_attn:
            feat, attn = out
            return feat.astype(jnp.float32), attn
        return out.astype(jnp.float32)

    def encode_pc(self, pc: jax.Array) -> jax.Array:
        return self(pc)


def create_uni3d(cfg, dtype: Optional[jnp.dtype] = None) -> Uni3D:
    """Build Uni3D from a ModelConfig (reference: models/uni3d.py:36-45)."""
    return Uni3D(
        trans_dim=cfg.pc_feat_dim, embed_dim=cfg.embed_dim,
        num_group=cfg.num_group, group_size=cfg.group_size,
        encoder_dim=cfg.pc_encoder_dim, depth=cfg.eva_depth,
        num_heads=cfg.eva_heads, use_pallas_fps=cfg.use_pallas_fps,
        approx_knn=cfg.approx_knn, use_pallas_knn=cfg.use_pallas_knn,
        use_pallas_knn_gather=cfg.use_pallas_knn_gather,
        quantize=cfg.quantize_int8,
        use_pallas_attention=cfg.use_pallas_attention,
        use_pallas_attn_block=getattr(cfg, "use_pallas_attn_block", False),
        dtype=dtype or jnp.dtype(cfg.compute_dtype),
    )
