"""Point-cloud augmentation and cropping helpers (training-era parity).

Rebuild of the misc helpers the reference carries from Point-BERT training
(models/ulip/pointbert/misc.py:22-287): seeded determinism, directional
point-cloud cropping ("separate point cloud" for incomplete-cloud
generation), and the standard jitter/scale/rotate augmentations.  The TTA
loop itself only corrupts inputs at dataset-generation time; these exist so
the framework can regenerate and train.

All functions are pure (explicit PRNG keys) and jit-friendly with static
crop sizes — the TPU analogue of the reference's numpy/torch loops.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def worker_seed(base_seed: int, rank: int = 0) -> jax.Array:
    """Deterministic per-process key — the reference seeds torch/numpy/random
    with seed+rank (main_test-time.py:18-23, misc.py:81-105)."""
    return jax.random.fold_in(jax.random.PRNGKey(base_seed), rank)


def separate_point_cloud(rng: jax.Array, xyz: jax.Array, num_crop: int,
                         fixed_center: Optional[jax.Array] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Split each cloud into (kept, cropped) halves around a random
    direction (reference misc.py:169-230 `seprate_point_cloud`).

    The `num_crop` points nearest a random unit direction are cropped; the
    rest are kept.  Static sizes in, static sizes out.

    Args:
      xyz: (B, N, 3); num_crop: points to remove (static).
    Returns:
      kept (B, N-num_crop, 3), cropped (B, num_crop, 3).
    """
    B, N, _ = xyz.shape
    if fixed_center is None:
        center = jax.random.normal(rng, (B, 1, 3))
        center = center / (jnp.linalg.norm(center, axis=-1,
                                           keepdims=True) + 1e-12)
    else:
        center = jnp.broadcast_to(fixed_center.reshape(1, 1, 3), (B, 1, 3))
    dist = jnp.linalg.norm(xyz - center, axis=-1)              # (B, N)
    order = jnp.argsort(dist, axis=-1)                          # near → far
    crop_idx = order[:, :num_crop]
    keep_idx = order[:, num_crop:]
    take = lambda idx: jnp.take_along_axis(xyz, idx[..., None], axis=1)
    return take(keep_idx), take(crop_idx)


def jitter_points(rng: jax.Array, xyz: jax.Array, std: float = 0.01,
                  clip: float = 0.05) -> jax.Array:
    """Clipped Gaussian jitter (standard Point-BERT train aug)."""
    noise = jnp.clip(std * jax.random.normal(rng, xyz.shape), -clip, clip)
    return xyz + noise


def random_scale(rng: jax.Array, xyz: jax.Array, lo: float = 0.8,
                 hi: float = 1.25) -> jax.Array:
    """Per-cloud uniform scaling."""
    s = jax.random.uniform(rng, (xyz.shape[0], 1, 1), minval=lo, maxval=hi)
    return xyz * s


def random_translate(rng: jax.Array, xyz: jax.Array,
                     shift: float = 0.1) -> jax.Array:
    t = jax.random.uniform(rng, (xyz.shape[0], 1, 3), minval=-shift,
                           maxval=shift)
    return xyz + t


def random_rotate_z(rng: jax.Array, xyz: jax.Array) -> jax.Array:
    """Random rotation about the gravity axis."""
    theta = jax.random.uniform(rng, (xyz.shape[0],), maxval=2 * jnp.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack([c, -s, zeros, s, c, zeros, zeros, zeros, ones],
                    axis=-1).reshape(-1, 3, 3)
    return jnp.einsum("bnc,bcd->bnd", xyz, rot)


def normalize_cloud(xyz: jax.Array) -> jax.Array:
    """Center + unit-sphere normalisation (reference
    pointnet_util.py:12-18 pc_normalize, batched)."""
    centered = xyz - xyz.mean(axis=1, keepdims=True)
    scale = jnp.max(jnp.linalg.norm(centered, axis=-1, keepdims=True),
                    axis=1, keepdims=True)
    return centered / (scale + 1e-12)
