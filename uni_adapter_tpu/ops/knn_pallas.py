"""Fused Pallas TPU kernel for k-nearest-neighbour grouping.

TPU-native replacement for the reference's dense-distance-matrix + topk kNN
(models/point_encoder.py:17-49, torch.topk over a (B, S, N) matrix).  The
XLA twin (ops/geometry.knn_point) materialises the (B, S, N) fp32 distance
matrix in HBM and calls the TopK custom call, which dominates the grouping
stage (5.9 ms of the ~11.7 ms grouping total at ULIP shapes — BASELINE.md
round-2 profile).  This kernel fuses both:

* distances are computed on the MXU *inside* the kernel — the (S, N)
  matrix lives only in VMEM and never costs an HBM round-trip;
* selection is k iterative min-extractions over the lane axis (min value,
  then lowest-index argmin via a masked iota-min, then knock the winner out
  with +inf).  All S queries of a cloud advance together on the sublane
  axis, so each of the k sequential steps is a handful of full-width VPU
  sweeps — the same "parallel over rows, serial over selections" shape as
  ops/fps_pallas.fps_pallas_batched.

Tie-break semantics match jax.lax.top_k on negated distances: ascending
distance, equal distances resolved to the lowest index (XLA's TopK is
stable).  The distance formula is the same |q|² − 2q·x + |x|² expansion as
ops/geometry.square_distance; the MXU contraction runs at HIGHEST precision
like the XLA twin's einsum, so disagreement is confined to sub-ulp ties
(tested exact on tie-free clouds, like the FPS kernel).

Grid: one step per cloud; VMEM per step is the (S, N) fp32 distance block
(2 MB at the encoder's 512×1024) plus coordinate planes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGH = jax.lax.Precision.HIGHEST


def sqdist_plane(q, x):
    """(S, N) squared-distance plane |q − x|² plus the (S, N) lane iota.

    The single home of the numerics-sensitive expansion shared by the kNN,
    fused-gather, and ball-query kernels (ops/ballquery_pallas.py imports
    it): cross term on the MXU at HIGHEST precision with fp32 accumulate;
    the zero-padded channel rows/cols contribute exact zeros to every term.

    Args:
      q: (S, 8) query xyz, channels zero-padded 3→8.
      x: (8, N) points transposed, channel rows zero-padded.
    """
    cross = jax.lax.dot_general(
        q, x, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_HIGH, preferred_element_type=jnp.float32)   # (S, N)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)                 # (S, 1)
    x2 = jnp.sum(x * x, axis=0, keepdims=True)                 # (1, N)
    d = q2 + x2 - 2.0 * cross
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    return d, lane


def _knn_kernel(k: int, n_real: int, q_ref, x_ref, out_ref):
    # q_ref: (1, S, 8) query xyz (channels zero-padded 3→8)
    # x_ref: (1, 8, N) points, transposed (channel rows zero-padded)
    # out_ref: (1, S, k) int32 neighbour indices, ascending distance
    # (the fp32 distance matrix lives entirely in registers/VMEM values —
    # a scratch buffer would add a dead store per grid step, measured ~15%
    # on the sibling ball-query kernel)
    q = q_ref[0]                                     # (S, 8)
    x = x_ref[0]                                     # (8, N)
    S, N = q_ref.shape[1], x_ref.shape[2]

    # |q − x|² expansion, all in VMEM
    d, lane = sqdist_plane(q, x)
    # padded lanes (n_real ≤ lane < N) must never win a min
    d_i = jnp.where(lane < n_real, d, jnp.inf)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (S, k), 1)

    def body(i, d_i):
        m = jnp.min(d_i, axis=1, keepdims=True)                     # (S, 1)
        # lowest index attaining the min — matches stable TopK tie-break
        # (measured faster than jnp.argmin's lowering)
        idx = jnp.min(jnp.where(d_i == m, lane, N), axis=1,
                      keepdims=True).astype(jnp.int32)              # (S, 1)
        out_ref[0, :, :] = jnp.where(out_lane == i, idx, out_ref[0, :, :])
        return jnp.where(lane == idx, jnp.inf, d_i)

    for i in range(k):       # unrolled: k is small and static
        d_i = body(i, d_i)


def _knn_gather_kernel(k: int, n_real: int, q_ref, x_ref, v_ref,
                       out_ref, vals_ref):
    # Like _knn_kernel, plus: the winner one-hot of every extraction step is
    # already a full (S, N) plane in VMEM — one MXU matmul against the
    # (N, C) value pane gathers that neighbour's features EXACTLY (one-hot
    # rows have a single nonzero, so fp32-HIGHEST accumulation reproduces
    # the value bit-for-bit), replacing the separate one-hot-gather pass
    # over HBM that follows the unfused kernel.
    q = q_ref[0]                                     # (S, 8)
    x = x_ref[0]                                     # (8, N)
    v = v_ref[0]                                     # (N, 8) gather values
    S, N = q_ref.shape[1], x_ref.shape[2]

    d, lane = sqdist_plane(q, x)
    d_i = jnp.where(lane < n_real, d, jnp.inf)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (S, k), 1)

    def body(i, d_i):
        m = jnp.min(d_i, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d_i == m, lane, N), axis=1,
                      keepdims=True).astype(jnp.int32)
        onehot = lane == idx                                     # (S, N)
        out_ref[0, :, :] = jnp.where(out_lane == i, idx, out_ref[0, :, :])
        g = jax.lax.dot_general(
            onehot.astype(jnp.float32), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_HIGH, preferred_element_type=jnp.float32)  # (S, 8)
        vals_ref[0, :, i, :] = g
        return jnp.where(onehot, jnp.inf, d_i)

    for i in range(k):
        d_i = body(i, d_i)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_gather_pallas(k: int, xyz: jax.Array, new_xyz: jax.Array,
                      values: jax.Array, interpret: bool = False):
    """Fused kNN + neighbour-feature gather in one kernel.

    Same selection contract as knn_pallas; additionally gathers
    `values[b, idx]` for every selected neighbour while the winner one-hot
    is still in VMEM (exact — see kernel comment), so the caller's separate
    one-hot-matmul gather pass (ops/geometry.index_points_matmul) and the
    HBM round-trip of the indicator disappear.

    Args:
      k: neighbours per query (static).
      xyz: (B, N, 3) points (distance space).
      new_xyz: (B, S, 3) queries.
      values: (B, N, C) features to gather, C ≤ 8 (e.g. xyz‖color).
    Returns:
      (idx (B, S, k) int32, gathered (B, S, k, C) float32)
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C = values.shape[-1]
    assert C <= 8, f"values channels {C} > 8"
    n_pad = -(-N // 128) * 128
    # Mosaic software-pipelines the k gather matmuls and keeps every step's
    # (s_tile, N) one-hot plane live — the dominant VMEM term scales with k,
    # so the query tile must shrink as k grows (measured: 72.8 MB of scoped
    # stack at s_tile=512, k=32).
    s_tile = max(8, min(-(-S // 8) * 8,
                        ((4 << 20) // (4 * n_pad)) // 8 * 8,
                        ((24 << 20) // (4 * n_pad * k)) // 8 * 8))
    s_pad = -(-S // s_tile) * s_tile

    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, n_pad - N)))
    q = jnp.pad(new_xyz.astype(jnp.float32),
                ((0, 0), (0, s_pad - S), (0, 5)))
    vp = jnp.pad(values.astype(jnp.float32),
                 ((0, 0), (0, n_pad - N), (0, 8 - C)))   # (B, N_pad, 8)

    kernel = functools.partial(_knn_gather_kernel, k, N)
    idx, gathered = pl.pallas_call(
        kernel,
        grid=(B, s_pad // s_tile),
        in_specs=[
            pl.BlockSpec((1, s_tile, 8), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 8), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s_tile, k), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, k, 8), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, s_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((B, s_pad, k, 8), jnp.float32),
        ],
        # the extra value pane + (s_tile, k, 8) output push the step past
        # the 16M default scoped-vmem limit at encoder shapes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, xt, vp)
    return idx[:, :S], gathered[:, :S, :, :C]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(k: int, xyz: jax.Array, new_xyz: jax.Array,
               interpret: bool = False) -> jax.Array:
    """k nearest neighbours of each query among `xyz`, fused in one kernel.

    Same contract as ops.geometry.knn_point (the numerics oracle): returns
    (B, S, k) int32 indices in ascending-distance order.

    Args:
      k: neighbours per query (static).
      xyz: (B, N, 3) points.
      new_xyz: (B, S, 3) queries.
      interpret: run in interpreter mode (for CPU tests).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    n_pad = -(-N // 128) * 128
    # Tile the query axis so the (s_tile, N_pad) fp32 distance scratch stays
    # within ~4 MB of VMEM (N=1024 ⇒ all 512 encoder queries in one tile;
    # N=8192 ⇒ 128-query tiles).
    s_tile = max(8, min(-(-S // 8) * 8, ((4 << 20) // (4 * n_pad)) // 8 * 8))
    s_pad = -(-S // s_tile) * s_tile

    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)       # (B, 3, N)
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, n_pad - N)))     # (B, 8, N_pad)
    q = jnp.pad(new_xyz.astype(jnp.float32),
                ((0, 0), (0, s_pad - S), (0, 5)))          # (B, S_pad, 8)

    kernel = functools.partial(_knn_kernel, k, N)
    out = pl.pallas_call(
        kernel,
        grid=(B, s_pad // s_tile),
        in_specs=[
            pl.BlockSpec((1, s_tile, 8), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, k), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, k), jnp.int32),
        interpret=interpret,
    )(q, xt)
    return out[:, :S]
