"""Fused full-attention Pallas kernel for short sequences.

The point transformers run full (non-causal) attention over at most 513
tokens (SURVEY.md §5.7 — "keep full attention; the TPU lever is the
FPS/kNN stage, not attention sharding").  At these lengths the whole
(N, N) score matrix fits in VMEM, so QK^T → softmax → AV can run as ONE
kernel with zero HBM traffic for the intermediates — the buffers that
dominate the small trunks' step time (BASELINE.md: bf16 logit storage alone
bought +19%; fusing removes the remaining round-trips).

Grid: one step per (batch, head); blocks are the (N_pad, hd_pad) q/k/v
panes.  Numerics: fp32 scores and softmax, bf16 output — strictly more
precise than the bf16-storage XLA path.

Measured (v5e, 2026-08-16): correct to bf16 noise but NOT faster than the
bf16-storage XLA attention at the sweep shapes (ULIP (30,6,513,64): 32.7 vs
22.6 ms; Uni3D ≈ neutral) — the (B·H)-step grid serialises small kernels
and hd 64 pads to the 128-lane tile, doubling matmul work.  Kept as a
tested building block; the XLA path stays the default.  Round-2 shape:
pack heads into the lane dimension (6×64=384 lanes → 3 panes of 128).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(n_real: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    # refs: (1, 1, N_pad, hd_pad)
    q = q_ref[0, 0, :, :].astype(jnp.float32)
    k = k_ref[0, 0, :, :].astype(jnp.float32)
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    n = q.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    s = jnp.where(col < n_real, s, -jnp.inf)      # mask padded keys
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                     scale: float | None = None,
                     interpret: bool = False) -> jax.Array:
    """Fused scaled-dot-product attention.

    Args:
      q, k, v: (B, H, N, hd); N ≤ ~1024 (the (N, N) fp32 score pane must fit
        VMEM), hd padded to the 128-lane tile internally.
    Returns:
      (B, H, N, hd), same dtype as v.
    """
    B, H, N, hd = q.shape
    scale = float(scale if scale is not None else hd ** -0.5)
    n_pad = -(-N // 128) * 128
    hd_pad = -(-hd // 128) * 128

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - N), (0, hd_pad - hd)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    spec = pl.BlockSpec((1, 1, n_pad, hd_pad), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, N, scale),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, hd_pad), v.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :N, :hd]
