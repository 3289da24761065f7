"""Pallas TPU kernel for farthest point sampling.

TPU-native replacement for the reference's single native dependency, the CUDA
`pointnet2_ops.furthest_point_sample` kernel (imported at
models/point_encoder.py:3, used at :12-13).  FPS is inherently sequential —
G dependent argmax steps — so the win is keeping the whole recurrence
resident in VMEM: the (3, N) coordinate block and the (1, N) running
min-distance vector never leave the chip, and each step is one VPU
distance + min + argmax sweep (SURVEY.md §2.4, §7 hard part 1).

Layout: points are fed transposed as (B, 3, N) so the long N axis sits on
the 128-wide lane dimension.  N is padded to a multiple of 128; padded slots
start at -inf running distance so argmax never selects them.

Start-index semantics match the CUDA kernel (first centroid = index 0), the
same choice as ops/geometry.farthest_point_sample.

Measured (v5e, 2026-08-16): 1.4× faster than the XLA fori_loop twin at
N=8192 (3.3 vs 4.6 ms) where the VMEM-resident distance vector pays off;
comparable at N=1024.  Numerics note: this kernel computes (x−c)² directly
while the XLA twin uses the expanded |x|²−2x·c+|c|² form — on near-tied
distances the argmax chains can diverge after some step (both are valid FPS
solutions; SURVEY.md §7 hard part 1).  The CPU interpret-mode test checks
exact agreement on tie-free clouds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint: int, n_real: int, xyz_ref, out_ref, dist_ref):
    # xyz_ref: (1, 8, N) VMEM (3 coord rows + tile padding);
    # out_ref: (1, 1, npoint) int32; dist_ref: (1, N) f32 scratch.
    # The TPU lowering forbids scalar VMEM loads/stores, so the centroid
    # extraction and the index write are masked vector ops on (1, N) /
    # (1, npoint) rows; the running `farthest` index is a loop-carried sreg.
    n = xyz_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)
    valid = lane < n_real
    dist_ref[:, :] = jnp.where(valid, jnp.inf, -jnp.inf).astype(jnp.float32)

    xs = xyz_ref[0, 0:1, :]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]

    def body(i, farthest):
        # masked vector write of the chosen index into slot i
        out_ref[0, :, :] = jnp.where(out_lane == i, farthest, out_ref[0, :, :])
        # centroid coords via masked reduce (scalar loads are not lowerable)
        sel = lane == farthest
        cx = jnp.sum(jnp.where(sel, xs, 0.0))
        cy = jnp.sum(jnp.where(sel, ys, 0.0))
        cz = jnp.sum(jnp.where(sel, zs, 0.0))
        dx = xs - cx
        dy = ys - cy
        dz = zs - cz
        d = dx * dx + dy * dy + dz * dz
        dist_ref[:, :] = jnp.minimum(dist_ref[:, :], d)
        return jnp.argmax(dist_ref[:, :]).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, jnp.int32(0))


def _fps_batched_kernel(npoint: int, n_real: int, xs_ref, ys_ref, zs_ref,
                        out_ref, dist_ref):
    """Batch-parallel FPS: every cloud advances in the same iteration.

    All refs are (B_pad, N_pad) planes; the b-th sublane row carries cloud b,
    so each of the `npoint` sequential iterations does ONE VPU sweep over
    the whole batch (select centroid coords per row, distance update, row
    argmin/argmax) instead of a separate kernel per cloud — FPS's serial
    chain is over iterations only, never over the batch.
    """
    Bp, n = xs_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bp, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (Bp, npoint), 1)
    valid = lane < n_real
    dist_ref[:, :] = jnp.where(valid, jnp.inf, -jnp.inf).astype(jnp.float32)

    xs, ys, zs = xs_ref[:, :], ys_ref[:, :], zs_ref[:, :]

    def body(i, farthest):
        # farthest: (Bp, 1) int32 — per-row current centroid index
        out_ref[:, :] = jnp.where(out_lane == i, farthest, out_ref[:, :])
        sel = lane == farthest
        cx = jnp.sum(jnp.where(sel, xs, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel, ys, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel, zs, 0.0), axis=1, keepdims=True)
        d = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2
        new_dist = jnp.minimum(dist_ref[:, :], d)
        dist_ref[:, :] = new_dist
        return jnp.argmax(new_dist, axis=1, keepdims=True).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body,
                      jnp.zeros((Bp, 1), jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas_batched(xyz: jax.Array, npoint: int,
                       interpret: bool = False) -> jax.Array:
    """Batch-parallel Pallas FPS — one kernel, batch on the sublane axis.

    Same contract as fps_pallas / ops.geometry.farthest_point_sample.
    Preferable when B > 1 (the grid variant serializes clouds; this one
    advances all of them per iteration).
    """
    B, N, _ = xyz.shape
    n_pad = -(-N // 128) * 128
    b_pad = -(-B // 8) * 8
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)   # (B, 3, N)
    xt = jnp.pad(xt, ((0, b_pad - B), (0, 0), (0, n_pad - N)))
    xs, ys, zs = xt[:, 0], xt[:, 1], xt[:, 2]          # (B_pad, N_pad)

    kernel = functools.partial(_fps_batched_kernel, npoint, N)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_pad, n_pad), jnp.float32)],
        interpret=interpret,
    )(xs, ys, zs)
    return out[:B]


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jax.Array, npoint: int, interpret: bool = False) -> jax.Array:
    """Farthest point sampling via a Pallas TPU kernel.

    Args:
      xyz: (B, N, 3) points, any float dtype.
      npoint: number of centers (static).
      interpret: run in interpreter mode (for CPU tests).
    Returns:
      (B, npoint) int32 indices — same contract as
      ops.geometry.farthest_point_sample, which is the numerics oracle.
    """
    B, N, _ = xyz.shape
    n_pad = -(-N // 128) * 128
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    # pad coordinate rows 3→8 (fp32 sublane tile) and N to the 128-lane tile
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, n_pad - N)))

    kernel = functools.partial(_fps_kernel, npoint, N)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 8, n_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[:, 0]
