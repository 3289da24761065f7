"""PointNet++ set-abstraction modules (single-scale, multi-scale, feature
propagation).

Completes the PointNet++ utility layer (reference
models/openshape/pointnet_util.py:170-323): the single-scale abstraction
lives with the PPTA model (models/ppta.SetAbstraction); here are the
multi-scale-grouping variant and the feature-propagation (upsampling)
module, so every reference module in that file has a TPU-native equivalent.
All Conv2d(k=1)+BN stacks are per-point Dense + inference BatchNorm; every
gather is one batched `take_along_axis` fed by an MXU distance matrix.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.common import BatchNormInference
from uni_adapter_tpu.ops.geometry import (farthest_point_sample, index_points,
                                          query_ball_point, square_distance)


class PointNetSetAbstractionMsg(nn.Module):
    """Multi-scale grouping set abstraction
    (reference pointnet_util.py:213-270): FPS centers once, ball-query at
    several radii, per-scale shared MLPs, concat the max-pooled features.
    """
    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, points: jax.Array | None
                 ) -> Tuple[jax.Array, jax.Array]:
        # xyz: (B, N, 3); points: (B, N, D) or None
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)                   # (B, S, 3)
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radius_list, self.nsample_list, self.mlp_list)):
            idx = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [index_points(points, idx), grouped_xyz], axis=-1)
            else:
                grouped = grouped_xyz
            x = grouped.astype(self.dtype)
            for j, ch in enumerate(mlp):
                x = nn.Dense(ch, dtype=self.dtype,
                             name=f"conv{i}_{j}")(x)
                x = BatchNormInference(ch, dtype=self.dtype,
                                       name=f"bn{i}_{j}")(x)
                x = nn.relu(x)
            outs.append(jnp.max(x, axis=2))                    # (B, S, ch)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFeaturePropagation(nn.Module):
    """Feature propagation / upsampling
    (reference pointnet_util.py:273-323): inverse-distance-weighted
    3-NN interpolation from the coarse level, concat skip features, shared
    MLP."""
    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz1: jax.Array, xyz2: jax.Array,
                 points1: jax.Array | None, points2: jax.Array) -> jax.Array:
        # xyz1: (B, N, 3) fine; xyz2: (B, S, 3) coarse; points2: (B, S, D)
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interp = jnp.broadcast_to(points2, (B, N, points2.shape[-1]))
        else:
            d = square_distance(xyz1, xyz2)                    # (B, N, S)
            d3, idx3 = jax.lax.top_k(-d, 3)
            d3 = -d3
            w = 1.0 / (d3 + 1e-8)
            w = w / jnp.sum(w, axis=2, keepdims=True)          # (B, N, 3)
            neigh = index_points(points2, idx3)                # (B, N, 3, D)
            interp = jnp.sum(neigh * w[..., None], axis=2)
        x = (interp if points1 is None
             else jnp.concatenate([points1, interp], axis=-1))
        x = x.astype(self.dtype)
        for j, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{j}")(x)
            x = BatchNormInference(ch, dtype=self.dtype, name=f"bn{j}")(x)
            x = nn.relu(x)
        return x
