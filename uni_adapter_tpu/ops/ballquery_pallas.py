"""Fused Pallas TPU kernel for ball query (radius neighbourhood search).

TPU-native replacement for the XLA twin ops/geometry.query_ball_point,
which materialises the (B, S, N) distance matrix in HBM and then runs a
full 1024-lane `jnp.sort` per query row — the dominant fixed cost of the
OpenShape/PointNet++ set-abstraction stage (reference semantics:
models/openshape/pointnet_util.py:89-110).

The fusion mirrors ops/knn_pallas.py: distances are computed on the MXU
inside the kernel and live only in VMEM.  Selection is *cheaper* than kNN's:
ball query wants the first `nsample` in-ball points by ascending INDEX (the
reference sorts indices, not distances), so the sort key is simply
`where(d ≤ r², lane, N)` — each of the `nsample` extraction steps is one
lane-min reduce plus one knockout pass, with no separate index-location
pass.  Exhausted balls keep emitting the sentinel N, which the wrapper
replaces with the first in-ball index and clamps exactly like the XLA twin
(the pinned empty-ball deviation, tests/test_geometry.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uni_adapter_tpu.ops.knn_pallas import sqdist_plane

_HIGH = jax.lax.Precision.HIGHEST


def _ballquery_kernel(nsample: int, n_real: int, r2: float,
                      q_ref, x_ref, out_ref):
    # q_ref: (1, S, 8) query xyz (channels zero-padded 3→8)
    # x_ref: (1, 8, N) points transposed (channel rows zero-padded)
    # out_ref: (1, S, nsample) int32 — ascending in-ball indices, sentinel N
    # (the int32 key plane lives entirely in registers/VMEM values — no
    # scratch buffer needed, unlike the kNN kernel's fp32 distance matrix)
    q = q_ref[0]
    x = x_ref[0]
    S, N = q_ref.shape[1], x_ref.shape[2]

    d, lane = sqdist_plane(q, x)
    # strict `>` exclusion matches the twin's `sqd > r²` masking; padded
    # lanes are never in-ball
    in_ball = jnp.logical_and(d <= r2, lane < n_real)
    key = jnp.where(in_ball, lane, n_real)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (S, nsample), 1)

    for i in range(nsample):   # unrolled: nsample is small and static
        m = jnp.min(key, axis=1, keepdims=True)                 # (S, 1)
        out_ref[0, :, :] = jnp.where(out_lane == i, m, out_ref[0, :, :])
        key = jnp.where(key == m, n_real, key)


@functools.partial(jax.jit, static_argnames=("radius", "nsample",
                                             "interpret"))
def query_ball_pallas(radius: float, nsample: int, xyz: jax.Array,
                      new_xyz: jax.Array, interpret: bool = False
                      ) -> jax.Array:
    """Ball query, fused in one kernel.

    Same contract as ops.geometry.query_ball_point (the numerics oracle):
    (B, S, nsample) int32, ascending in-ball indices, out-of-ball slots
    filled with the first in-ball index, empty balls clamped to N−1.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    n_pad = -(-N // 128) * 128
    s_tile = max(8, min(-(-S // 8) * 8, ((4 << 20) // (4 * n_pad)) // 8 * 8))
    s_pad = -(-S // s_tile) * s_tile

    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, n_pad - N)))
    q = jnp.pad(new_xyz.astype(jnp.float32),
                ((0, 0), (0, s_pad - S), (0, 5)))

    kernel = functools.partial(_ballquery_kernel, nsample, N,
                               float(radius) * float(radius))
    out = pl.pallas_call(
        kernel,
        grid=(B, s_pad // s_tile),
        in_specs=[
            pl.BlockSpec((1, s_tile, 8), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_pad), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, nsample), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, nsample), jnp.int32),
        interpret=interpret,
    )(q, xt)
    group_idx = out[:, :S]
    # identical post-fix to the XLA twin (geometry.py): out-of-ball slots
    # take the first in-ball index; empty balls clamp the sentinel to N−1
    first = group_idx[:, :, :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    return jnp.minimum(group_idx, N - 1).astype(jnp.int32)
