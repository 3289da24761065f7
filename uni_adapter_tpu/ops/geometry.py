"""Point-cloud geometry ops, TPU-first (pure XLA reference implementations).

These are the L0 primitives of the framework (SURVEY.md §1): farthest point
sampling, k-nearest-neighbour search, neighbourhood grouping, and ball query.
The reference implements FPS with an external CUDA kernel
(pointnet2_ops.furthest_point_sample, used at models/point_encoder.py:12-13)
plus two pure-torch fallbacks (models/ulip/pointbert/misc.py:40-60,
models/openshape/pointnet_util.py:64-86); kNN is a dense distance matrix +
topk (models/point_encoder.py:17-49) and ball query is a masked sort
(models/openshape/pointnet_util.py:89-110).

TPU design notes
----------------
* All shapes are static; FPS is a `lax.fori_loop` with the (B, N) running
  min-distance vector carried on-device — the same sequential recurrence the
  CUDA kernel implements, expressed so XLA keeps it in VMEM/registers.
* Distance matrices are computed via a single (B, S, N) matmul that lands on
  the MXU rather than per-point gathers.
* A Pallas kernel for FPS lives in ops/fps_pallas.py; this module is the
  numerics oracle it is tested against.
* Deterministic start index 0 by default (matches pointnet2_ops CUDA
  semantics).  The torch fallbacks seed randomly; pass `start_idx` to
  reproduce any fixed choice (SURVEY.md §7 hard part 1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distances.

    Args:
      src: (B, N, C)
      dst: (B, M, C)
    Returns:
      (B, N, M) squared distances.

    One MXU matmul + two rank-broadcast adds (reference:
    models/point_encoder.py:31-49 computes the identical expansion).
    """
    # -2 src·dstᵀ + |src|² + |dst|²
    cross = jnp.einsum("bnc,bmc->bnm", src, dst,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[:, :, None]
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[:, None, :]
    return s2 + d2 - 2.0 * cross


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz: jax.Array, npoint: int,
                          start_idx: int = 0) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      xyz: (B, N, 3) points.
      npoint: number of centers to sample (static).
      start_idx: index of the first centroid.  0 matches the reference's CUDA
        kernel; the torch fallbacks draw it randomly
        (pointnet_util.py:77, misc.py:52).
    Returns:
      (B, npoint) int32 indices of sampled points.

    Sequential G-step recurrence over a carried (B, N) min-distance vector —
    the canonical FPS loop, written as lax.fori_loop so the whole sweep
    compiles to one fused on-device loop.
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    x2 = jnp.sum(xyz * xyz, axis=-1)  # (B, N), reused every step

    def body(i, carry):
        dist, farthest, out = carry
        out = out.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # (B,1,3)
        c2 = jnp.sum(centroid * centroid, axis=-1)  # (B,1)
        # |x - c|² = |x|² - 2 x·c + |c|², batched matvec on the MXU
        d = x2 - 2.0 * jnp.einsum("bnc,bkc->bn", xyz, centroid,
                                  precision=jax.lax.Precision.HIGHEST) + c2
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, farthest, out

    init = (
        jnp.full((B, N), jnp.inf, dtype=jnp.float32),
        jnp.full((B,), start_idx, dtype=jnp.int32),
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, out = jax.lax.fori_loop(0, npoint, body, init)
    return out


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points by per-batch indices.

    Args:
      points: (B, N, C)
      idx: (B, ...) integer indices into N.
    Returns:
      (B, ..., C) gathered points (reference: pointnet_util.py:46-61).
    """
    return jnp.take_along_axis(
        points,
        idx.reshape(idx.shape[0], -1)[..., None].astype(jnp.int32),
        axis=1,
    ).reshape(*idx.shape, points.shape[-1])


def index_points_matmul(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather as a one-hot matmul — numerically exact, MXU-resident.

    TPUs execute large gathers on the slow scatter/gather path; a one-hot
    (rows of exact 0/1) fp32 matmul produces identical values on the MXU and
    measures ~7× faster at the encoder's (B, G·M, N) shapes (v5e, 2026-08-16
    profile).  XLA fuses the one-hot generation into the contraction, so the
    (B, G·M, N) indicator never materialises in HBM.

    Args:
      points: (B, N, C); idx: (B, ...) int indices into N.
    Returns:
      (B, ..., C), exactly equal to index_points.
    """
    B, N, C = points.shape
    flat = idx.reshape(B, -1)
    onehot = jax.nn.one_hot(flat, N, dtype=jnp.float32)
    out = jnp.einsum("bgn,bnc->bgc", onehot, points.astype(jnp.float32),
                     precision=_HIGH)
    return out.reshape(*idx.shape, C).astype(points.dtype)


def fps_gather(xyz: jax.Array, npoint: int, start_idx: int = 0) -> jax.Array:
    """FPS + gather: returns the sampled points themselves, (B, npoint, 3).

    Mirrors the reference's fps() composition of furthest_point_sample +
    gather_operation (models/point_encoder.py:7-14).
    """
    return index_points(xyz, farthest_point_sample(xyz, npoint, start_idx))


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def knn_point(k: int, xyz: jax.Array, new_xyz: jax.Array,
              approx: bool = False) -> jax.Array:
    """k nearest neighbours of each query in `new_xyz` among `xyz`.

    Args:
      k: neighbours per query (static).
      xyz: (B, N, C) all points.
      new_xyz: (B, S, C) query points.
      approx: use the TPU-optimised `approx_max_k` partial reduce instead of
        the full sort (recall_target 0.99; measured recall 1.0 on the
        benchmark's point distributions — distances separate well).  Off by
        default for bit-exact reference parity.
    Returns:
      (B, S, k) int32 indices (reference: models/point_encoder.py:17-28;
      unsorted there via topk(sorted=False) — we return ascending-distance
      order, a documented tie-break difference that leaves the neighbourhood
      *set* identical).
    """
    sqd = square_distance(new_xyz, xyz)  # (B, S, N)
    if approx:
        _, idx = jax.lax.approx_max_k(-sqd, k, recall_target=0.99)
    else:
        _, idx = jax.lax.top_k(-sqd, k)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nsample",))
def query_ball_point(radius: float, nsample: int, xyz: jax.Array,
                     new_xyz: jax.Array) -> jax.Array:
    """Ball query: up to `nsample` points within `radius` of each query.

    Matches the reference's semantics (pointnet_util.py:89-110): points
    outside the ball get sentinel index N, indices are sorted ascending, the
    first nsample taken, and out-of-ball slots replaced by the first in-ball
    index.  Sorting index-ascending (not distance-ascending) is the reference
    behaviour and is preserved.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqd = square_distance(new_xyz, xyz)  # (B, S, N)
    arange = jax.lax.broadcasted_iota(jnp.int32, (B, S, N), 2)
    group_idx = jnp.where(sqd > radius * radius, N, arange)
    group_idx = jnp.sort(group_idx, axis=-1)[:, :, :nsample]
    first = group_idx[:, :, :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    # Degenerate case (no point in ball): reference leaves sentinel N via
    # `first`; clamp so the gather stays in-bounds (torch would index-error
    # identically — this path never occurs when queries come from FPS).
    return jnp.minimum(group_idx, N - 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_group", "group_size",
                                              "use_pallas_fps", "approx_knn",
                                              "use_pallas_knn",
                                              "use_pallas_knn_gather"))
def group_points(xyz: jax.Array, color: jax.Array | None, num_group: int,
                 group_size: int, use_pallas_fps: bool = False,
                 approx_knn: bool = False, use_pallas_knn: bool = False,
                 use_pallas_knn_gather: bool = False):
    """FPS centers + kNN neighbourhoods, center-relative coordinates.

    The Uni3D/Point-BERT grouping stage (reference:
    models/point_encoder.py:93-127 with color; models/ulip/pointbert/
    dvae.py:152-181 without).

    Args:
      xyz: (B, N, 3)
      color: (B, N, 3) or None.
      num_group: G centers.
      group_size: M neighbours per center.
    Returns:
      neighborhood: (B, G, M, 3) center-relative xyz
      center: (B, G, 3)
      features: (B, G, M, 6) [rel-xyz ‖ color] if color given, else None
    """
    if use_pallas_fps:
        # batch-parallel kernel: 1.8 ms vs 6.5 ms XLA at (30, 1024)→512 on
        # v5e (3.6×) — all clouds advance per iteration on the VPU sublanes
        from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched
        fps_idx = fps_pallas_batched(xyz, num_group)
    else:
        fps_idx = farthest_point_sample(xyz, num_group)
    center = index_points(xyz, fps_idx)                     # (B, G, 3)
    if use_pallas_knn_gather:
        # selection + exact feature gather in ONE kernel (the winner
        # one-hot plane never leaves VMEM) — ops/knn_pallas.knn_gather_pallas
        from uni_adapter_tpu.ops.knn_pallas import knn_gather_pallas
        vals = xyz if color is None else jnp.concatenate([xyz, color],
                                                         axis=-1)
        _, joined = knn_gather_pallas(group_size, xyz, center, vals)
        neighborhood = joined[..., :3] - center[:, :, None, :]
        if color is None:
            return neighborhood, center, None
        features = jnp.concatenate([neighborhood, joined[..., 3:]], axis=-1)
        return neighborhood, center, features
    if use_pallas_knn:
        # fused distance+selection kernel: 3.6× the sqdist+top_k path at
        # encoder shapes on v5e (ops/knn_pallas.py)
        from uni_adapter_tpu.ops.knn_pallas import knn_pallas
        idx = knn_pallas(group_size, xyz, center)           # (B, G, M)
    else:
        idx = knn_point(group_size, xyz, center, approx=approx_knn)
    if color is not None:
        # one exact one-hot-matmul gather over the joined 6 channels
        joined = index_points_matmul(
            jnp.concatenate([xyz, color], axis=-1), idx)
        neighborhood = joined[..., :3] - center[:, :, None, :]
        features = jnp.concatenate([neighborhood, joined[..., 3:]], axis=-1)
        return neighborhood, center, features
    neighborhood = index_points_matmul(xyz, idx) - center[:, :, None, :]
    return neighborhood, center, None


@functools.partial(jax.jit, static_argnames=("npoint", "radius", "nsample",
                                             "use_pallas_fps",
                                             "use_pallas_ballq"))
def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: jax.Array, points: jax.Array | None,
                     use_pallas_fps: bool = False,
                     use_pallas_ballq: bool = False):
    """PointNet++ set-abstraction grouping (reference: pointnet_util.py:113-147).

    Returns:
      new_xyz: (B, npoint, 3) FPS centers
      new_points: (B, npoint, nsample, 3+D) rel-xyz ‖ point features
    """
    if use_pallas_fps:
        from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched
        fps_idx = fps_pallas_batched(xyz, npoint)
    else:
        fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)
    if use_pallas_ballq:
        # fused distance+index-selection kernel, bitwise-exact vs the twin:
        # 2.2× the sqdist+sort path at PPTA shapes on v5e
        # (ops/ballquery_pallas.py)
        from uni_adapter_tpu.ops.ballquery_pallas import query_ball_pallas
        idx = query_ball_pallas(radius, nsample, xyz, new_xyz)
    else:
        idx = query_ball_point(radius, nsample, xyz, new_xyz)
    if points is not None:
        joined = index_points_matmul(
            jnp.concatenate([xyz, points], axis=-1), idx)
        grouped_xyz = joined[..., :3] - new_xyz[:, :, None, :]
        new_points = jnp.concatenate([grouped_xyz, joined[..., 3:]], axis=-1)
    else:
        new_points = index_points_matmul(xyz, idx) - new_xyz[:, :, None, :]
    return new_xyz, new_points
