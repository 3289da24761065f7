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

Two kernels:
  * `attention_pallas` — round-1 kernel, grid (B, H).  Measured (v5e,
    2026-08-16): correct but NOT faster than the bf16-storage XLA attention
    at the sweep shapes (ULIP (30,6,513,64): 32.7 vs 22.6 ms) — the
    (B·H)-step grid serialises 180 small kernels, and the fp32 cast before
    QK^T runs the MXU at fp32 rate.  Kept as a tested building block.
  * `attention_pallas_heads` — round-2 kernel, grid (B,): one step holds
    ALL heads of a batch element in VMEM and unrolls the head loop, so the
    pipeline has B large steps instead of B·H tiny ones; matmuls stay bf16
    (fp32 accumulation via preferred_element_type), softmax is fp32, and
    the (H, N, N) score planes never leave VMEM.
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


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
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


def _attn_heads_kernel(n_real: int, scale: float, mask_mode: str,
                       q_ref, k_ref, v_ref, o_ref):
    # q/o refs: (Bg, G, Nq_pad, hd_pad) — query rows pad only to the
    # 8-sublane tile (e.g. 513→520), not to 128: the 128-lane constraint
    # applies to the KEY axis alone, and every matmul row / softmax pass
    # scales with Nq_pad (513 tokens: 520 vs 640 = −19% work).
    # k/v refs: (Bg, G, Nk_pad, hd_pad) — keys pad to the 128-lane tile.
    #
    # VPU economy (the kernel is VMEM-traffic-bound, not matmul-bound):
    #   * softmax(s·scale) == exp((s − max(s))·scale) / Σ — the scale folds
    #     into the single fused sub·mul·exp·cast pass over the score plane;
    #   * the key-pad mask folds into that same pass (`where(pad, 0, exp)`),
    #     so no separate masked-score plane is materialised; the row max is
    #     taken over REAL keys only (pad lanes masked to −inf for the max)
    #     so a row of uniformly very-negative real scores cannot underflow
    #     to an all-zero sum;
    #   * row normalisation divides the (N, hd) output, not the (N, N) plane.
    Bg, G, nq = q_ref.shape[0], q_ref.shape[1], q_ref.shape[2]
    nk = k_ref.shape[2]
    if mask_mode == "where":
        col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        key_pad = col >= n_real
    for b in range(Bg):
        for h in range(G):
            q = q_ref[b, h, :, :]
            k = k_ref[b, h, :, :]
            v = v_ref[b, h, :, :]
            # bf16 operands, fp32 accumulation — full-rate MXU.
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if mask_mode == "where":
                # Max over REAL keys only: if every real raw score sat below
                # −88/scale, a max that included the pad columns' exact-zero
                # q·k would underflow every real exp term and the pad-zeroed
                # row sum would hit 0 → NaN.  Pad lanes may then overflow to
                # +inf in the exp below; the where replaces them with 0.
                m = jnp.max(jnp.where(key_pad, -jnp.inf, s), axis=1,
                            keepdims=True)
                p = jnp.where(key_pad, 0.0, jnp.exp((s - m) * scale))
            else:
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp((s - m) * scale)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = o / jnp.sum(p, axis=1, keepdims=True)
            o_ref[b, h, :, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "head_group",
                                    "batch_group"))
def attention_pallas_heads(q: jax.Array, k: jax.Array, v: jax.Array,
                           scale: float | None = None,
                           interpret: bool = False,
                           head_group: int = 8,
                           batch_group: int = 1) -> jax.Array:
    """Fused attention, one grid step per (batch element, head group).

    Args:
      q, k, v: (B, H, N, hd).  The (G, N_pad, hd_pad) q/k/v panes plus one
        fp32 (N_pad, N_pad) score plane must fit the double-buffered VMEM
        budget; G = min(H, head_group) heads per step keeps the worst case
        (EVA02-L, 8×640×128 bf16 ×4 ×2 buffers + scores ≈ 14 MB) inside it.
    Returns:
      (B, H, N, hd), same dtype as v.
    """
    B, H, N, hd = q.shape
    G = min(H, head_group)
    while H % G:
        G -= 1
    Bg = min(B, batch_group)
    while B % Bg:
        Bg -= 1
    scale = float(scale if scale is not None else hd ** -0.5)
    nq_pad = -(-N // 8) * 8         # query rows: sublane tile only
    nk_pad = -(-N // 128) * 128     # key axis: lane tile
    hd_pad = -(-hd // 128) * 128

    def pad(x, n_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - N), (0, hd_pad - hd)))

    # Measured (v5e): folding the key-pad mask into the exp pass beats both
    # a separate masked-score plane and baking the mask into a spare
    # contraction lane (the XLA-side `.at[].set` costs more than it saves).
    mask_mode = "none" if nk_pad == N else "where"
    qp, kp, vp = pad(q, nq_pad), pad(k, nk_pad), pad(v, nk_pad)

    def mkspec(n_pad):
        return pl.BlockSpec((Bg, G, n_pad, hd_pad),
                            lambda b, g: (b, g, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_heads_kernel, N, scale, mask_mode),
        grid=(B // Bg, H // G),
        in_specs=[mkspec(nq_pad), mkspec(nk_pad), mkspec(nk_pad)],
        out_specs=mkspec(nq_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, nq_pad, hd_pad), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :N, :hd]


def _eva_fused_kernel(n_real: int, num_heads: int, scale: float, eps: float,
                      apply_ln: bool,
                      q_ref, k_ref, v_ref, gq_ref, bq_ref, gk_ref, bk_ref,
                      o_ref):
    # q/k/v/o refs: (1, N_pad, D) in the NATURAL post-Dense layout — the
    # head split happens on VMEM lane slices in here, so the (B, H, N, hd)
    # transpose + pad copies of the generic path never exist in HBM.
    # gq/bq/gk/bk refs: (1, hd) fp32 — the per-head q/k LayerNorm params
    # (shared across heads, timm EVA `norm_layer(head_dim)` semantics).
    D = q_ref.shape[2]
    hd = D // num_heads
    np_ = q_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    key_pad = row >= n_real
    gq = gq_ref[0, :].astype(jnp.float32)
    bq = bq_ref[0, :].astype(jnp.float32)
    gk = gk_ref[0, :].astype(jnp.float32)
    bk = bk_ref[0, :].astype(jnp.float32)

    def ln(x, g, b):
        # fp32 statistics over the hd lanes (flax LayerNorm upcasts its
        # mean/var; eps matches models/common.LN = 1e-5)
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * g[None, :] + b[None, :]

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        if apply_ln:
            qh = ln(q_ref[0, :, sl].astype(jnp.float32), gq, bq)
            kh = ln(k_ref[0, :, sl].astype(jnp.float32), gk, bk)
        else:
            # LN already applied upstream (the flax modules run on the
            # natural (B, N, H, hd) reshape — no transpose, one fused
            # elementwise pass — so the param tree stays the module's)
            qh = q_ref[0, :, sl].astype(jnp.float32)
            kh = k_ref[0, :, sl].astype(jnp.float32)
        vh = v_ref[0, :, sl]
        # operands at the model compute dtype (bf16 runs: the XLA path's
        # LN emits bf16 into the einsum; fp32 runs stay fp32 — mirrors
        # _attend's dtype-dependent storage), fp32 accumulation
        s = jax.lax.dot_general(qh.astype(v_ref.dtype),
                                kh.astype(v_ref.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(jnp.where(key_pad, -jnp.inf, s), axis=1, keepdims=True)
        p = jnp.where(key_pad, 0.0, jnp.exp((s - m) * scale))
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = o / jnp.sum(p, axis=1, keepdims=True)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _eva_block_kernel(num_heads: int, scale: float, eps: float,
                      xn_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref,
                      gq_ref, bqh_ref, gk_ref, bkh_ref, wo_ref, bo_ref,
                      o_ref):
    # xn_ref/o_ref: (1, N, D) — post-norm1 tokens in / attention-side out.
    # w*_ref: (D, D) with CONSTANT index maps — Mosaic keeps the four
    # projection matrices resident in VMEM across the whole batch grid,
    # so the q/k/v/attn-out intermediates never exist in HBM at all.
    D = xn_ref.shape[2]
    hd = D // num_heads
    xn = xn_ref[0]                                   # (N, D) compute dtype
    dt = xn.dtype

    def proj(w_ref, b_ref):
        # nn.Dense semantics at the model compute dtype: bf16 operands,
        # fp32 MXU accumulation, round to bf16, then add the bf16 bias
        y = jax.lax.dot_general(xn, w_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y.astype(dt)
        return y if b_ref is None else y + b_ref[0, :][None, :].astype(dt)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, None)                           # k_proj has no bias
    v = proj(wv_ref, bv_ref)
    gq = gq_ref[0, :].astype(jnp.float32)
    bq = bqh_ref[0, :].astype(jnp.float32)
    gk = gk_ref[0, :].astype(jnp.float32)
    bk = bkh_ref[0, :].astype(jnp.float32)

    def ln(x, g, b):
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * g[None, :] + b[None, :]

    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = ln(q[:, sl].astype(jnp.float32), gq, bq).astype(dt)
        kh = ln(k[:, sl].astype(jnp.float32), gk, bk).astype(dt)
        # N here is the true token count (no HBM-side padding; Mosaic masks
        # its own ragged sublane tail) — no key-pad mask needed
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp((s - m) * scale)
        o = jax.lax.dot_general(p.astype(dt), v[:, sl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o / jnp.sum(p, axis=1, keepdims=True))
    cat = jnp.concatenate(outs, axis=1).astype(dt)   # (N, D)
    out = jax.lax.dot_general(cat, wo_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (out.astype(dt) + bo_ref[0, :][None, :].astype(dt)
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "eps",
                                             "interpret"))
def eva_attn_block_fused(xn: jax.Array,
                         wq: jax.Array, bq: jax.Array, wk: jax.Array,
                         wv: jax.Array, bv: jax.Array,
                         gq: jax.Array, bqh: jax.Array,
                         gk: jax.Array, bkh: jax.Array,
                         wo: jax.Array, bo: jax.Array,
                         *, num_heads: int, scale: float | None = None,
                         eps: float = 1e-5,
                         interpret: bool = False) -> jax.Array:
    """The ENTIRE EVA attention side — q/k/v projections, per-head q/k
    LayerNorm, softmax(QKᵀ·scale)·V, out-projection — as ONE kernel over
    the natural (B, N, D) layout.

    Round-5 lesson (BASELINE.md): a kernel covering only the LN+attention
    span wins standalone (1.21 vs 2.05 ms at (30, 513, 1024)×16h) yet
    LOSES end-to-end on Uni3D — XLA's fusion across the whole EVA block is
    worth more than the kernel saves at its boundaries.  Pulling the four
    projection matmuls inside collapses the boundary to xn-in / a-out:
    the q/k/v/attn-out intermediates (4 × 30 MB HBM round-trips per block)
    vanish, the weights sit VMEM-resident across the batch grid, and the
    ops XLA keeps (norm1 prologue, residual epilogue) are exactly the ones
    it can still fuse.

    Args:
      xn: (B, N, D) post-norm1 tokens (N = true token count, unpadded).
      wq/wk/wv/wo: (D, D) projection kernels (nn.Dense layout, in×out).
      bq/bv/bo: (D,) biases (k_proj has none — EVA02 semantics).
      gq/bqh/gk/bkh: (hd,) per-head q/k LayerNorm scale/bias.
    Returns:
      (B, N, D) attention-side output `a` (caller adds the residual),
      dtype of xn.
    """
    B, N, D = xn.shape
    hd = D // num_heads
    scale = float(scale if scale is not None else hd ** -0.5)
    dt = xn.dtype
    wspec = pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, hd), lambda b: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    cast = lambda a: a.astype(dt)
    row = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_eva_block_kernel, num_heads, scale, eps),
        grid=(B,),
        in_specs=[spec, wspec, dspec, wspec, wspec, dspec,
                  hspec, hspec, hspec, hspec, wspec, dspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xn, cast(wq), row(cast(bq)), cast(wk), cast(wv), row(cast(bv)),
      row(gq), row(bqh), row(gk), row(bkh), cast(wo), row(cast(bo)))


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "eps",
                                             "interpret"))
def eva_attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                        gq: jax.Array | None = None,
                        bq: jax.Array | None = None,
                        gk: jax.Array | None = None,
                        bk: jax.Array | None = None,
                        *, num_heads: int, scale: float | None = None,
                        eps: float = 1e-5,
                        interpret: bool = False) -> jax.Array:
    """EVA attention core in the NATURAL layout: per-head q/k LayerNorm +
    softmax(QKᵀ·scale)·V fused into one kernel over (B, N, D) operands.

    Round-5 motivation (BASELINE.md): the transposed-layout kernel
    (`attention_pallas_heads`) beats XLA 0.80 vs 1.93 ms on the bare
    (30, 16, 513, 64) core, but loses END-TO-END inside EvaAttention
    (3.29 vs 2.42 ms) — the (B, H, N, hd) materialisation + pad copies
    and the per-head LayerNorm on that layout cost more than the kernel
    saves.  Taking q/k/v exactly as the Dense projections emit them and
    splitting heads on VMEM lane slices removes both.

    Args:
      q, k, v: (B, N, D) — the raw q/k/v projections (pre-reshape).
      gq, bq, gk, bk: (hd,) LayerNorm scale/bias for q_norm / k_norm.
      num_heads: H; hd = D // H.
    Returns:
      (B, N, D): concatenated per-head attention outputs (pre out-proj),
      same dtype as v.
    """
    B, N, D = q.shape
    hd = D // num_heads
    scale = float(scale if scale is not None else hd ** -0.5)
    apply_ln = gq is not None
    if not apply_ln:
        gq = bq = gk = bk = jnp.zeros((hd,), jnp.float32)
    # no HBM-side padding: the (1, N, D) block is handed to Mosaic as-is
    # (it masks the ragged sublane tail itself) — a jnp.pad here would
    # copy all three 60 MB operands through HBM per layer
    pspec = pl.BlockSpec((1, hd), lambda b: (0, 0), memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_eva_fused_kernel, N, num_heads, scale, eps,
                          apply_ln),
        grid=(B,),
        in_specs=[spec, spec, spec, pspec, pspec, pspec, pspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, gq.reshape(1, hd), bq.reshape(1, hd),
      gk.reshape(1, hd), bk.reshape(1, hd))
    return out
