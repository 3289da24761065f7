"""jit-compiled KMeans (Lloyd's algorithm).

TPU-native replacement for the sklearn KMeans the reference calls inside its
models to cluster patch tokens (models/ulip/pointbert/point_encoder.py:
160-171 `cluster_patches`, models/openshape/ppta.py:101-112) for the
local/hierarchical cache types.  sklearn forces a device→host→device round
trip per sample; this version is a fixed-trip-count `lax.scan` that stays
on-device and jits into the encoder program.

Initialisation: kmeans++-style greedy farthest seeding from a PRNG key
(deterministic given the key, mirroring the reference's random_state=1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def _pairwise_sq(x: jax.Array, c: jax.Array) -> jax.Array:
    return (jnp.sum(x * x, 1)[:, None] + jnp.sum(c * c, 1)[None, :]
            - 2.0 * jnp.matmul(x, c.T, precision=_HIGH))


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iter"))
def kmeans(features: jax.Array, n_clusters: int, rng: jax.Array,
           n_iter: int = 25):
    """Cluster (N, D) features into `n_clusters` centers.

    Returns:
      centers: (n_clusters, D)
      assignment: (N,) int32
    """
    x = features.astype(jnp.float32)
    n = x.shape[0]

    # greedy farthest-point seeding (deterministic kmeans++ variant)
    first = jax.random.randint(rng, (), 0, n)

    init_center = x[first]
    seeds = [init_center]
    dist = jnp.full((n,), jnp.inf)
    c = init_center
    for _ in range(n_clusters - 1):
        d = jnp.sum((x - c[None]) ** 2, 1)
        dist = jnp.minimum(dist, d)
        c = x[jnp.argmax(dist)]
        seeds.append(c)
    centers = jnp.stack(seeds)

    def lloyd(carry, _):
        centers = carry
        assign = jnp.argmin(_pairwise_sq(x, centers), 1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
        counts = onehot.sum(0)
        sums = jnp.matmul(onehot.T, x, precision=_HIGH)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts, 1.0)[:, None], centers)
        return new, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=n_iter)
    assign = jnp.argmin(_pairwise_sq(x, centers), 1).astype(jnp.int32)
    return centers, assign


def cluster_patches(local_patches: jax.Array, n_cluster: int,
                    rng: jax.Array | None = None) -> jax.Array:
    """Patch-token clustering, the reference's `cluster_patches` contract
    (point_encoder.py:160-171): (N, D) tokens → (n_cluster, D) centers."""
    rng = rng if rng is not None else jax.random.PRNGKey(1)
    x = local_patches.reshape(-1, local_patches.shape[-1])
    centers, _ = kmeans(x, n_cluster, rng)
    return centers
