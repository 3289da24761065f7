"""ULIP-2 Point-BERT encoder.

Rebuild of the reference ULIP path (models/ulip/ulip_model.py:7-19 +
models/ulip/pointbert/point_encoder.py:11-193 + dvae.py Group/Encoder):

    (B, N, 3) xyz
      → Group: FPS 512 + kNN-32, center-relative xyz (dvae.py:152-181)
      → 3-channel mini-PointNet → reduce_dim Linear → trans_dim 384
      → [CLS ‖ tokens]; 12 pre-norm ViT blocks with the positional embedding
        re-added at EVERY block (point_encoder.py:95-98 — a Point-BERT
        idiosyncrasy, preserved)
      → concat[CLS, max-pool(tokens)]  (768-d)
      → pc_projection matmul → 512-d CLIP space (ulip_model.py:15-18)
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.common import LN, ViTBlock
from uni_adapter_tpu.models.uni3d import MiniPointNet, PosEmbedMLP
from uni_adapter_tpu.ops.geometry import group_points


class PointTransformer(nn.Module):
    """Point-BERT trunk (reference point_encoder.py:120-193)."""
    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_group: int = 512
    group_size: int = 32
    encoder_dim: int = 256
    use_pallas_fps: bool = False
    approx_knn: bool = False
    use_pallas_knn: bool = False
    use_pallas_knn_gather: bool = False
    use_pallas_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pts: jax.Array, return_attn: bool = False):
        neighborhood, center, _ = group_points(
            pts, None, self.num_group, self.group_size,
            use_pallas_fps=self.use_pallas_fps, approx_knn=self.approx_knn,
            use_pallas_knn=self.use_pallas_knn,
            use_pallas_knn_gather=self.use_pallas_knn_gather)
        tokens = MiniPointNet(self.encoder_dim, 3, dtype=self.dtype,
                              name="encoder")(neighborhood)
        tokens = nn.Dense(self.trans_dim, dtype=self.dtype,
                          name="reduce_dim")(tokens)

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

        attn_maps = []
        for i in range(self.depth):
            # pos re-added every block (point_encoder.py:95-98)
            out = ViTBlock(self.trans_dim, self.num_heads,
                           use_pallas_attention=self.use_pallas_attention,
                           dtype=self.dtype,
                           name=f"blocks_{i}")(x + pos, return_attn=return_attn)
            if return_attn:
                x, attn = out
                attn_maps.append(attn)
            else:
                x = out

        x = LN(dtype=self.dtype, name="norm")(x)
        concat_f = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)],
                                   axis=-1)  # (B, 2·trans_dim)
        if return_attn:
            return concat_f, attn_maps
        return concat_f


class ULIP(nn.Module):
    """ULIP wrapper: Point-BERT features @ pc_projection
    (reference ulip_model.py:7-19)."""
    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_group: int = 512
    group_size: int = 32
    encoder_dim: int = 256
    embed_dim: int = 512
    use_pallas_fps: bool = False
    approx_knn: bool = False
    use_pallas_knn: bool = False
    use_pallas_knn_gather: bool = False
    use_pallas_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pc: jax.Array, return_attn: bool = False):
        out = PointTransformer(
            self.trans_dim, self.depth, self.num_heads, self.num_group,
            self.group_size, self.encoder_dim,
            use_pallas_fps=self.use_pallas_fps, approx_knn=self.approx_knn,
            use_pallas_knn=self.use_pallas_knn,
            use_pallas_knn_gather=self.use_pallas_knn_gather,
            use_pallas_attention=self.use_pallas_attention, dtype=self.dtype,
            name="point_encoder")(pc, return_attn=return_attn)
        feat, attn_maps = out if return_attn else (out, None)
        pc_projection = self.param(
            "pc_projection", nn.initializers.normal(0.02),
            (2 * self.trans_dim, self.embed_dim))
        proj = jnp.matmul(feat.astype(jnp.float32), pc_projection,
                          precision=jax.lax.Precision.HIGHEST)
        return (proj, attn_maps) if return_attn else proj


def create_ulip(cfg, dtype=None) -> ULIP:
    return ULIP(
        trans_dim=cfg.ulip_trans_dim, depth=cfg.ulip_depth,
        num_heads=cfg.ulip_heads, num_group=cfg.num_group,
        group_size=cfg.ulip_group_size, encoder_dim=cfg.ulip_encoder_dim,
        embed_dim=cfg.ulip_embed_dim, use_pallas_fps=cfg.use_pallas_fps,
        approx_knn=cfg.approx_knn, use_pallas_knn=cfg.use_pallas_knn,
        use_pallas_knn_gather=cfg.use_pallas_knn_gather,
        use_pallas_attention=cfg.use_pallas_attention,
        dtype=dtype or jnp.dtype(cfg.compute_dtype),
    )
