"""Logit fusion rules: adapted logits × CLIP logits → final logits.

Rebuild of the reference's three fusion paths (Uni_Adapter.py:489-521 for
MODE-DOTA, :554-574 for the cache, and the *intended* pure-DOTA fusion).

Documented reference bugs resolved here (SURVEY.md §7 hard part 6):
  * Pure-DOTA never assigns `final_logits` (Uni_Adapter.py:409-412 then
    NameError at :581).  We implement the intended fusion documented in the
    reference's own usage comment (dota_mixture.py:289-292):
    final = clip + clamp(ρ·c̄/B, η)·dota.
  * The MODE-DOTA inverse-entropy weights are double-normalised: weight_dota
    divides by the *already-normalised* weight_clip (Uni_Adapter.py:512-513),
    so the weights don't sum to 1.  Reproduced by default for numerical
    parity; pass fix_normalization=True for the corrected convex combination.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from uni_adapter_tpu.utils.math import softmax_entropy


def dota_fusion_weight(rho: float, eta: float, c_mean: jax.Array,
                       batch) -> jax.Array:
    """w = clamp(ρ·mean(c)/B, max=η) (Uni_Adapter.py:491).

    `batch` is the batch the fit consumed — a Python int single-device, or
    a psum-traced global count under dist_mode='psum' (engine.py).
    """
    return jnp.minimum(rho * c_mean / batch, eta)


def fuse_dota(clip_logits: jax.Array, dota_logits: jax.Array,
              weight: jax.Array) -> jax.Array:
    """Intended pure-DOTA fusion (dota_mixture.py:289-292)."""
    return clip_logits + weight * dota_logits


def fuse_mode_dota(clip_logits: jax.Array, dota_logits: jax.Array,
                   weight: jax.Array,
                   fix_normalization: bool = False) -> jax.Array:
    """Inverse-entropy fusion (Uni_Adapter.py:498-521).

    dota_logits are first scaled by the count-based weight; then each stream
    is weighted by the reciprocal of its softmax entropy.
    """
    scaled_dota = weight * dota_logits
    ent_clip = softmax_entropy(clip_logits)
    ent_dota = softmax_entropy(scaled_dota)
    w_clip = 1.0 / (ent_clip + 1e-3)
    w_dota = 1.0 / (ent_dota + 1e-3)
    if fix_normalization:
        total = w_clip + w_dota
        w_clip, w_dota = w_clip / total, w_dota / total
    else:
        # reference order: w_clip is normalised first, then w_dota divides by
        # the *new* w_clip (Uni_Adapter.py:512-513)
        w_clip = w_clip / (w_clip + w_dota)
        w_dota = w_dota / (w_clip + w_dota)
    return (w_clip[:, None] * clip_logits + w_dota[:, None] * scaled_dota)


def fuse_cache(clip_logits: jax.Array, cache_logits: jax.Array,
               logit_scale: float = 100.0) -> jax.Array:
    """Cache-path fusion (Uni_Adapter.py:554-574).

    final = (1/H₁)·softmax(clip/scale) + (1/H₂)·softmax(cache_logits)
    with H computed on the already-softmaxed distributions.  The divisor
    undoes the logits' similarity scaling (the reference hardcodes its
    100× scale); it must match the scale that produced clip_logits or the
    clip side fuses at the wrong temperature.
    """
    prob1 = jax.nn.softmax(clip_logits / logit_scale, axis=1)
    ent1 = softmax_entropy(prob1, enable_softmax=False)
    prob2 = jax.nn.softmax(cache_logits, axis=1)
    ent2 = softmax_entropy(prob2, enable_softmax=False)
    return (1.0 / ent1)[:, None] * prob1 + (1.0 / ent2)[:, None] * prob2
