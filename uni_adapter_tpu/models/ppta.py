"""OpenShape Point-BERT (PointPatchTransformer / PPTA).

Rebuild of the reference OpenShape path (models/openshape/ppta.py:10-199 +
pointnet_util.py:20-210):

    (B, N, 3) xyz, (B, N, 6) features (xyz ‖ color)
      → PointNetSetAbstraction: FPS `patches` centers + ball query
        (radius prad, nsample nsamp) + shared-MLP [64, 64, sa_dim] + max-pool
      → lift Conv1d(sa_dim+3 → dim) + LayerNorm
      → [CLS ‖ tokens], centroid prepended with 0
      → Transformer with optional relative-PE conv on centroid deltas
      → CLS → proj Linear (→ CLIP text dim)

Scaling presets mirror make(cfg) (ppta.py:159-199): vit-L = scaling 3,
vit-G = scaling 4 (config.yaml:11).  NOTE the reference's own loader never
instantiates this model (`lm3d_model = None`, utils/load_models.py:126) —
this is the completed implementation the stub points at.

The KMeans patch-center path (cache_type local/hierarchical,
ppta.py:101-112) is served by utils.kmeans — a jit-compiled Lloyd iteration
instead of sklearn.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.common import LN, Mlp, ViTAttention
from uni_adapter_tpu.ops.geometry import sample_and_group


@dataclasses.dataclass(frozen=True)
class PPTAPreset:
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    sa_dim: int
    patches: int
    prad: float
    nsamp: int


#: make(cfg) scaling table (reference ppta.py:159-199).
PRESETS = {
    1: PPTAPreset(256, 6, 4, 1024, 96, 64, 0.4, 256),
    2: PPTAPreset(512, 6, 8, 1024, 128, 64, 0.4, 256),
    3: PPTAPreset(512, 12, 8, 1024, 128, 128, 0.35, 128),   # vit-L
    4: PPTAPreset(512, 12, 8, 512 * 3, 256, 384, 0.2, 64),  # vit-G
    5: PPTAPreset(768, 12, 12, 768 * 3, 256, 512, 0.2, 64),
    6: PPTAPreset(768, 24, 12, 768 * 4, 256, 512, 0.2, 64),
}


class SetAbstraction(nn.Module):
    """PointNet++ set abstraction, single scale (pointnet_util.py:170-210).

    Conv2d(k=1) ≡ per-point Dense; BatchNorm folded into inference
    scale/bias like the other encoders.
    """
    npoint: int
    radius: float
    nsample: int
    mlp: tuple
    use_pallas_fps: bool = False
    use_pallas_ballq: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xyz: jax.Array, points: jax.Array):
        from uni_adapter_tpu.models.common import BatchNormInference
        new_xyz, new_points = sample_and_group(
            self.npoint, self.radius, self.nsample, xyz, points,
            use_pallas_fps=self.use_pallas_fps,
            use_pallas_ballq=self.use_pallas_ballq)
        x = new_points.astype(self.dtype)            # (B, S, n, C)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNormInference(ch, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return new_xyz, jnp.max(x, axis=2)            # (B, S, 3), (B, S, C')


class RelPE(nn.Module):
    """Relative position bias from centroid deltas
    (reference ppta.py:50-52,58-59): Conv 3→64→1 on (B, N, N, 3)."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, centroid_delta: jax.Array) -> jax.Array:
        x = nn.Dense(64, dtype=self.dtype, name="fc1")(
            centroid_delta.astype(self.dtype))
        x = nn.relu(x)
        x = nn.Dense(1, dtype=self.dtype, name="fc2")(x)   # (B, N, N, 1)
        return jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)


class PPTABlockPair(nn.Module):
    """PreNorm attention + PreNorm feed-forward (reference ppta.py:69-84)."""
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    rel_pe: bool = False
    use_pallas_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, centroid_delta, return_attn: bool = False):
        bias = None
        if self.rel_pe:
            bias = RelPE(dtype=self.dtype, name="pe")(centroid_delta)
        inner = self.dim_head * self.heads
        a = ViTAttention(self.dim, self.heads, qkv_bias=False,
                         inner_dim=inner,
                         project_out=not (self.heads == 1 and inner == self.dim),
                         use_pallas=self.use_pallas_attention,
                         dtype=self.dtype, name="attn")(
            LN(dtype=self.dtype, name="attn_norm")(x),
            attn_bias=bias, return_attn=return_attn)
        attn = None
        if return_attn:
            a, attn = a
        x = x + a
        f = Mlp(self.dim, self.mlp_dim, dtype=self.dtype, name="ff")(
            LN(dtype=self.dtype, name="ff_norm")(x))
        out = x + f
        return (out, attn) if return_attn else out


class PointPatchTransformer(nn.Module):
    """Reference ppta.py:87-135, cache_type='global' path."""
    preset: PPTAPreset
    in_dim: int = 6
    dim_head: int = 64
    rel_pe: bool = False
    use_pallas_fps: bool = False
    use_pallas_ballq: bool = False
    use_pallas_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xyz: jax.Array, features: jax.Array,
                 return_tokens: bool = False, return_attn: bool = False):
        p = self.preset
        centroids, feat = SetAbstraction(
            p.patches, p.prad, p.nsamp, (64, 64, p.sa_dim),
            use_pallas_fps=self.use_pallas_fps,
            use_pallas_ballq=self.use_pallas_ballq,
            dtype=self.dtype, name="sa")(xyz, features)
        x = jnp.concatenate([centroids.astype(self.dtype), feat], axis=-1)
        x = nn.Dense(p.dim, dtype=self.dtype, name="lift")(x)
        x = LN(dtype=self.dtype, name="lift_norm")(x)

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (p.dim,))
        B = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, p.dim)), x],
            axis=1)
        # centroid 0 prepended for CLS (ppta.py:121)
        centroids = jnp.concatenate(
            [jnp.zeros((B, 1, 3), centroids.dtype), centroids], axis=1)
        delta = centroids[:, :, None, :] - centroids[:, None, :, :]  # (B,S+1,S+1,3)

        attn_maps = []
        for i in range(p.depth):
            out = PPTABlockPair(p.dim, p.heads, self.dim_head, p.mlp_dim,
                                self.rel_pe,
                                use_pallas_attention=self.use_pallas_attention,
                                dtype=self.dtype,
                                name=f"layers_{i}")(x, delta,
                                                    return_attn=return_attn)
            if return_attn:
                x, attn = out
                attn_maps.append(attn)
            else:
                x = out
        result = (x[:, 0], x[:, 1:]) if return_tokens else x[:, 0]
        return (result, attn_maps) if return_attn else result


class Projected(nn.Module):
    """PPTA + CLIP-space projection (reference ppta.py:138-155).

    cache_type selects the reference's return modes (ppta.py:127-135):
      'global'        → projected CLS token (the TTA path)
      'local'         → projected KMeans patch centers (n_cluster, out)
      'hierarchical'  → (projected CLS, projected patch centers)
    The KMeans runs as a jit'd on-device Lloyd iteration (utils/kmeans)
    rather than the reference's sklearn round-trip.
    """
    preset: PPTAPreset
    out_channel: int = 1280
    in_dim: int = 6
    rel_pe: bool = False
    cache_type: str = "global"
    n_cluster: int = 5
    use_pallas_fps: bool = False
    use_pallas_ballq: bool = False
    use_pallas_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xyz: jax.Array, features: jax.Array,
                 return_attn: bool = False):
        want_tokens = self.cache_type != "global"
        if return_attn and want_tokens:
            raise ValueError("return_attn is supported for "
                             "cache_type='global' (the TTA/extraction path)")
        out = PointPatchTransformer(
            self.preset, self.in_dim, rel_pe=self.rel_pe,
            use_pallas_fps=self.use_pallas_fps,
            use_pallas_ballq=self.use_pallas_ballq,
            use_pallas_attention=self.use_pallas_attention, dtype=self.dtype,
            name="ppat")(xyz, features, return_tokens=want_tokens,
                         return_attn=return_attn)
        proj = nn.Dense(self.out_channel, dtype=jnp.float32, name="proj")
        if not want_tokens:
            if return_attn:
                cls_out, attn_maps = out
                return proj(cls_out.astype(jnp.float32)), attn_maps
            return proj(out.astype(jnp.float32))
        cls_token, patch_tokens = out
        from uni_adapter_tpu.utils.kmeans import cluster_patches
        centers = cluster_patches(patch_tokens.astype(jnp.float32),
                                  self.n_cluster)
        if self.cache_type == "local":
            return proj(centers)
        return proj(cls_token.astype(jnp.float32)), proj(centers)


def create_openshape(cfg, dtype=None) -> Projected:
    """Build from ModelConfig: vitg14 → scaling 4 / 1280-d bigG text space,
    vitl14 → scaling 3 / 768-d L text space (config.yaml:3,11)."""
    scaling = 4 if cfg.oshape_version == "vitg14" else 3
    out = cfg.oshape_clip_dim if cfg.oshape_version == "vitg14" else 768
    return Projected(
        preset=PRESETS[scaling], out_channel=out,
        use_pallas_fps=cfg.use_pallas_fps,
        use_pallas_ballq=cfg.use_pallas_ballq,
        use_pallas_attention=cfg.use_pallas_attention,
        dtype=dtype or jnp.dtype(cfg.compute_dtype),
    )
