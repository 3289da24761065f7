"""Shared transformer building blocks (flax.linen).

One attention/MLP/block family reused by all three backbones and the CLIP
text towers.  Compute runs in a configurable dtype (bf16 on TPU by default),
parameters stay fp32; attention is a plain scaled-dot-product expressed so
XLA maps the (B, H, N, hd) contractions onto the MXU and fuses softmax.

Variants covered:
  * ViTAttention — fused qkv (ULIP Point-BERT, reference
    models/ulip/pointbert/point_encoder.py:33-55; OpenShape ppta.py:31-66).
  * EvaAttention — separate q/k/v with per-head q/k LayerNorm, the EVA02
    structure the reference inspects at extract_attention.py:128-153.
  * Mlp (GELU), SwiGLU (EVA02), QuickGELU MLP (CLIP text,
    models/ulip/text_encoder.py:19-21).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch nn.GELU's default, vs flax's tanh approx."""
    return nn.gelu(x, approximate=False)


def LN(dtype=jnp.bfloat16, name=None):
    """LayerNorm with torch's default epsilon (1e-5; flax defaults 1e-6) —
    required for activation-level parity with converted checkpoints."""
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x·sigmoid(1.702x) (reference: models/ulip/text_encoder.py:19-21)."""
    return x * jax.nn.sigmoid(1.702 * x)


class QuantDense(nn.Module):
    """Dense with dynamic int8×int8 MXU math (opt-in, beyond-parity speed).

    The v5e's int8 MXU path doubles matmul throughput over bf16; with the
    pipeline compute-bound at the measured bf16 roofline (BASELINE.md), this
    is the remaining speed lever.  Quantisation is symmetric abs-max:
    activations per row (token), weights per output channel, int32
    accumulation, fp32 rescale.  Parameter names/shapes are identical to
    nn.Dense so converted checkpoints overlay unchanged; quantisation
    happens inside the program (weights requantise per call — ~0.6 ms for
    the full trunk, amortised against the 2× matmul saving).
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        lead = x.shape[:-1]
        xf = x.reshape(-1, in_features).astype(jnp.float32)
        # per-row activation scales, per-column weight scales
        sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0 + 1e-12
        sw = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * sx * sw
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out.reshape(*lead, self.features).astype(self.dtype)


def make_dense(quant: bool):
    """Dense-layer factory: nn.Dense or the int8 QuantDense."""
    if quant:
        return lambda features, use_bias=True, dtype=jnp.bfloat16, name=None: \
            QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return lambda features, use_bias=True, dtype=jnp.bfloat16, name=None: \
        nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def _attend(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
            mask: Optional[jax.Array] = None,
            bias: Optional[jax.Array] = None,
            use_pallas: bool = False) -> jax.Array:
    """Scaled dot-product attention on (B, H, N, hd) tensors.

    With `use_pallas` (TPU only) the unmasked/unbiased case runs as the
    fused ops/attention_pallas.attention_pallas_heads kernel: the score
    planes stay fp32 in VMEM (more precise than the bf16-storage XLA path
    below) and never touch HBM.

    Softmax always runs in fp32.  Under bf16 compute the (B, H, N, N)
    attention-logit buffers are kept bf16 (the MXU still accumulates fp32
    internally; only the stored logits round) — these buffers dominate HBM
    traffic for small-width trunks, and bf16 storage halves the 12-block
    ULIP trunk's step time (30.5 → 16.4 ms at (30, 513, 384), v5e).  fp32
    compute keeps fully-fp32 logits, so fp32-mode numerics are unchanged.
    """
    if use_pallas and mask is None and bias is None:
        from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads

        return attention_pallas_heads(q, k, v, float(scale)).astype(v.dtype)
    if v.dtype == jnp.bfloat16:
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)           # bf16 storage
    else:
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
    attn = attn.astype(jnp.float32)
    if bias is not None:
        attn = attn + bias
    attn = attn * scale
    if mask is not None:
        attn = attn + mask
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    if v.dtype == jnp.bfloat16:
        return jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _attn_probs(q, k, scale, mask=None, bias=None):
    """The softmax map _attend applies, recomputed for extraction
    (return_attn): mirrors _attend's logit storage exactly — bf16 compute
    rounds the stored qk logits before the fp32 softmax — so the extracted
    maps match the attention actually applied, up to _attend's final cast
    of the probabilities to the value dtype.  (In use_pallas mode the
    kernel computes its logits at fp32, i.e. like fp32 compute here.)"""
    if q.dtype == jnp.bfloat16:
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    else:
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32)
    s = s.astype(jnp.float32)
    if bias is not None:
        s = s + bias
    s = s * scale
    if mask is not None:
        s = s + mask
    return jax.nn.softmax(s, axis=-1)


class ViTAttention(nn.Module):
    """Fused-qkv multi-head attention (Point-BERT / PPTA / CLIP-text style)."""
    dim: int
    num_heads: int
    qkv_bias: bool = False
    inner_dim: Optional[int] = None       # PPTA allows inner != dim
    project_out: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, attn_bias=None, return_attn=False):
        inner = self.inner_dim or self.dim
        hd = inner // self.num_heads
        qkv = nn.Dense(inner * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        B, N = x.shape[0], x.shape[1]
        scale = hd ** -0.5
        if (self.use_pallas and mask is None and attn_bias is None
                and not return_attn and hd % 8 == 0):
            # Natural-layout fused path (round-5): slice the fused qkv on
            # its last axis and attend straight from the post-Dense
            # layout — the (B, H, N, hd) transposes + pad copies of the
            # transposed kernel never exist.  Measured (v5e, 2026-08-21,
            # B=30 N=513): ULIP (384, H6) 0.164 vs 0.338 ms transposed /
            # 0.759 XLA; OpenShape vitG (1280, H16) 0.624 vs 0.768 /
            # 2.125.
            from uni_adapter_tpu.ops.attention_pallas import (
                eva_attention_fused)

            out = eva_attention_fused(qkv[..., :inner],
                                      qkv[..., inner:2 * inner],
                                      qkv[..., 2 * inner:],
                                      num_heads=self.num_heads, scale=scale)
            if self.project_out:
                out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
            return out
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
        out = _attend(q, k, v, scale, mask, attn_bias,
                      use_pallas=self.use_pallas)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, inner)
        if self.project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        if return_attn:
            return out, _attn_probs(q, k, scale, mask, attn_bias)
        return out


class _DenseParams(nn.Module):
    """Param-holder with nn.Dense's exact tree (kernel/bias, same names,
    shapes, and initialisers) for kernels that consume the weights as
    arrays instead of applying the layer — the flax path-derived RNG makes
    the values identical to what nn.Dense at the same path would draw."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.features,)) if self.use_bias else None)
        return k, b


class _LNParams(nn.Module):
    """Param-holder matching nn.LayerNorm's tree (scale/bias)."""
    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones_init(),
                       (self.features,))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        return g, b


class EvaAttention(nn.Module):
    """EVA02 attention: separate q/k/v projections + per-head q/k LayerNorm.

    Structure per the reference's introspection (extract_attention.py:128-153):
    q = q_norm(reshape(q_proj(x))), k likewise; k_proj has no bias.
    """
    dim: int
    num_heads: int
    use_qk_norm: bool = True
    quantize: bool = False
    use_pallas: bool = False
    use_pallas_block: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_attn=False):
        dense = make_dense(self.quantize)
        hd = self.dim // self.num_heads
        B, N = x.shape[0], x.shape[1]
        if (self.use_pallas_block and not return_attn and not self.quantize
                and self.use_qk_norm):
            # Whole-span kernel (round-5 cont.): q/k/v/out projections +
            # per-head LN + attention in ONE pallas call — the param tree
            # stays byte-identical to the Dense/LN path (holders above),
            # so checkpoints and the converter see no difference.
            from uni_adapter_tpu.ops.attention_pallas import (
                eva_attn_block_fused)

            wq, bq = _DenseParams(self.dim, True, name="q_proj")(self.dim)
            wk, _ = _DenseParams(self.dim, False, name="k_proj")(self.dim)
            wv, bv = _DenseParams(self.dim, True, name="v_proj")(self.dim)
            gq, bqh = _LNParams(hd, name="q_norm")()
            gk, bkh = _LNParams(hd, name="k_norm")()
            wo, bo = _DenseParams(self.dim, True, name="proj")(self.dim)
            return eva_attn_block_fused(
                x.astype(self.dtype), wq, bq, wk, wv, bv, gq, bqh, gk, bkh,
                wo, bo, num_heads=self.num_heads, scale=hd ** -0.5)
        q = dense(self.dim, use_bias=True, dtype=self.dtype, name="q_proj")(x)
        k = dense(self.dim, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = dense(self.dim, use_bias=True, dtype=self.dtype, name="v_proj")(x)
        scale = hd ** -0.5
        if self.use_pallas and not return_attn and not self.quantize:
            # Natural-layout fused path (round-5, BASELINE.md): the
            # (B, H, N, hd) transpose + pad copies and the per-head LN on
            # that layout are what made the transposed-layout kernel LOSE
            # end-to-end (3.29 vs 2.42 ms/block) despite its 0.80-vs-1.93
            # core win.  Here the q/k LayerNorms run on the transpose-free
            # (B, N, H, hd) reshape (same flax modules, same params, same
            # per-element math — XLA fuses reshape+LN into one elementwise
            # pass) and ops/attention_pallas.eva_attention_fused splits
            # heads on VMEM lane slices.  Measured (v5e, 2026-08-21):
            # 1.21 vs 2.05 ms for the LN+attention+layout span at
            # (30, 513, 1024) x 16 heads.
            from uni_adapter_tpu.ops.attention_pallas import (
                eva_attention_fused)

            if self.use_qk_norm:
                q = LN(dtype=self.dtype, name="q_norm")(
                    q.reshape(B, N, self.num_heads, hd)).reshape(B, N,
                                                                 self.dim)
                k = LN(dtype=self.dtype, name="k_norm")(
                    k.reshape(B, N, self.num_heads, hd)).reshape(B, N,
                                                                 self.dim)
            out = eva_attention_fused(q, k, v, num_heads=self.num_heads,
                                      scale=scale)
            return dense(self.dim, dtype=self.dtype, name="proj")(out)
        q = jnp.transpose(q.reshape(B, N, self.num_heads, hd), (0, 2, 1, 3))
        k = jnp.transpose(k.reshape(B, N, self.num_heads, hd), (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(B, N, self.num_heads, hd), (0, 2, 1, 3))
        if self.use_qk_norm:
            q = LN(dtype=self.dtype, name="q_norm")(q)
            k = LN(dtype=self.dtype, name="k_norm")(k)
        out = _attend(q, k, v, scale, use_pallas=self.use_pallas)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, self.dim)
        out = dense(self.dim, dtype=self.dtype, name="proj")(out)
        if return_attn:
            return out, _attn_probs(q, k, scale)
        return out


class Mlp(nn.Module):
    """Two-layer MLP (reference: point_encoder.py:11-27 Mlp)."""
    dim: int
    hidden_dim: int
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class SwiGLU(nn.Module):
    """EVA02 SwiGLU MLP with mid LayerNorm (timm eva GluMlp structure)."""
    dim: int
    hidden_dim: int
    quantize: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dense = make_dense(self.quantize)
        g = dense(self.hidden_dim, dtype=self.dtype, name="fc1_g")(x)
        h = dense(self.hidden_dim, dtype=self.dtype, name="fc1_x")(x)
        x = nn.silu(g) * h
        x = LN(dtype=self.dtype, name="norm")(x)
        return dense(self.dim, dtype=self.dtype, name="fc2")(x)


class ViTBlock(nn.Module):
    """Pre-norm transformer block (Point-BERT, reference
    point_encoder.py:58-77)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    use_pallas_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_attn=False):
        a = ViTAttention(self.dim, self.num_heads, self.qkv_bias,
                         use_pallas=self.use_pallas_attention,
                         dtype=self.dtype, name="attn")(
            LN(dtype=self.dtype, name="norm1")(x),
            return_attn=return_attn)
        attn = None
        if return_attn:
            a, attn = a
        x = x + a
        x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio),
                    dtype=self.dtype, name="mlp")(
            LN(dtype=self.dtype, name="norm2")(x))
        return (x, attn) if return_attn else x


class EvaBlock(nn.Module):
    """EVA02 block: pre-norm, separate-qkv attention, SwiGLU MLP.

    Rope is omitted: the reference drives timm EVA blocks as plain
    `blk(x)` with no rope argument (models/point_encoder.py:217-218), so
    rotary embeddings are inactive in the Uni3D path.
    """
    dim: int
    num_heads: int
    mlp_ratio: float = 4 * 2 / 3
    quantize: bool = False
    use_pallas_attention: bool = False
    use_pallas_attn_block: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_attn=False):
        a = EvaAttention(self.dim, self.num_heads, quantize=self.quantize,
                         use_pallas=self.use_pallas_attention,
                         use_pallas_block=self.use_pallas_attn_block,
                         dtype=self.dtype, name="attn")(
            LN(dtype=self.dtype, name="norm1")(x),
            return_attn=return_attn)
        attn = None
        if return_attn:
            a, attn = a
        x = x + a
        x = x + SwiGLU(self.dim, int(self.dim * self.mlp_ratio),
                       quantize=self.quantize, dtype=self.dtype, name="mlp")(
            LN(dtype=self.dtype, name="norm2")(x))
        return (x, attn) if return_attn else x


class BatchNormInference(nn.Module):
    """BatchNorm evaluated with running statistics (inference mode).

    The reference's mini-PointNet encoders use nn.BatchNorm1d
    (models/point_encoder.py:134-143); at TTA everything runs under
    model.eval(), so only running stats matter — they live here as
    parameters filled by the checkpoint converter.
    """
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return (x * inv + (bias - mean * inv)).astype(self.dtype)
