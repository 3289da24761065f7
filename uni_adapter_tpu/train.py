"""Contrastive pretraining loop for the point encoders.

The reference ships the Uni3D training-era pieces — the pc↔text/pc↔image
InfoNCE loss (models/losses.py:7-69) and NCCL DDP + `all_gather_batch`
scaffolding (utils/utils.py:86-99, utils/distributed.py) — but no training
entry point (it is a TTA repo).  This module completes the capability
TPU-first: a pure jittable train step that distils a point encoder into the
frozen CLIP embedding space (the Uni3D pretraining recipe: text/image
embeddings come precomputed from the frozen towers), and a `shard_map`
data-parallel wrapper where

  * the contrastive negatives are gathered across the mesh axis with
    `jax.lax.all_gather` inside the loss (the reference's
    `all_gather_batch` role, riding ICI instead of NCCL), and
  * gradients are `pmean`-ed across shards (the DDP all-reduce role).

With loss = mean over local rows and equal shard sizes, the DP step is
mathematically identical to a single-device step over the concatenated
global batch (tested in tests/test_train.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uni_adapter_tpu.models.losses import uni3d_text_image_loss


class TrainState(NamedTuple):
    params: dict
    logit_scale: jax.Array      # () fp32, learnable log-scale like CLIP
    opt_state: optax.OptState
    step: jax.Array


def decay_mask(grads_like):
    """Weight-decay mask for (params, logit_scale) grad trees.

    Masks by NAME, not rank: flax matrices are 'kernel' leaves (plus the
    raw ULIP pc_projection matrix).  A rank test would decay
    cls_token/cls_pos (embeddings, excluded in the open_clip/timm recipe)
    and break under pipeline parallelism, where block params stack to
    (S, L/S, ...) and every leaf gains two axes — the name mask is
    stacking-invariant (tested in tests/test_pp.py)."""
    params, _logit_scale = grads_like

    def is_matrix(path, _p):
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", ""))
        return key in ("kernel", "pc_projection")

    return (jax.tree_util.tree_map_with_path(is_matrix, params), False)


def make_optimizer(lr: float = 1e-3, weight_decay: float = 0.05,
                   total_steps: int = 100_000,
                   warmup_steps: int = 2_000) -> optax.GradientTransformation:
    """AdamW + linear warmup → cosine decay (the open_clip-family recipe).

    Weight decay applies to matrices only — biases, norm gains, and the
    logit scale are excluded, as in open_clip (decaying logit_scale would
    fight the contrastive objective, which drives the scale toward ~100).
    """
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))

    return optax.chain(optax.clip_by_global_norm(10.0),
                       optax.adamw(sched, weight_decay=weight_decay,
                                   mask=decay_mask))


def init_train_state(model, rng: jax.Array, example_pc: jax.Array,
                     tx: optax.GradientTransformation,
                     init_logit_scale: float = float(np.log(1 / 0.07))
                     ) -> TrainState:
    params = model.init(rng, example_pc)["params"]
    logit_scale = jnp.float32(init_logit_scale)
    opt_state = tx.init((params, logit_scale))
    return TrainState(params, logit_scale, opt_state, jnp.int32(0))


def _loss_fn(params, logit_scale, model, pc, text_embed, image_embed, mask,
             axis_name):
    pc_embed = model.apply({"params": params}, pc)
    out = uni3d_text_image_loss(pc_embed, text_embed, image_embed,
                                jnp.exp(logit_scale), mask=mask,
                                axis_name=axis_name)
    return out["loss"], out


_MAX_LOG_SCALE = float(np.log(100.0))


def _apply_grads(state: TrainState, tx, grads) -> TrainState:
    updates, opt_state = tx.update(grads, state.opt_state,
                                   (state.params, state.logit_scale))
    params, logit_scale = optax.apply_updates(
        (state.params, state.logit_scale), updates)
    # CLIP clamps the PARAMETER after the step (a forward-side jnp.minimum
    # would zero the gradient above the cap, leaving nothing to pull the
    # scale back down).  Two-sided [0, log 100] per the open_clip recipe —
    # the lower bound keeps a long run from driving the temperature negative.
    logit_scale = jnp.clip(logit_scale, 0.0, _MAX_LOG_SCALE)
    return TrainState(params, logit_scale, opt_state, state.step + 1)


@functools.partial(jax.jit, static_argnames=("model", "tx"))
def train_step(model, tx, state: TrainState, pc: jax.Array,
               text_embed: jax.Array, image_embed: jax.Array,
               mask: Optional[jax.Array] = None
               ) -> Tuple[TrainState, dict]:
    """Single-device contrastive step.  pc: (B, N, C); embeds: (B, D)."""
    (loss, metrics), grads = jax.value_and_grad(
        _loss_fn, argnums=(0, 1), has_aux=True)(
        state.params, state.logit_scale, model, pc, text_embed, image_embed,
        mask, None)
    return _apply_grads(state, tx, grads), metrics


def make_dp_train_step(model, tx, mesh, axis_name: str = "dp",
                       donate: bool = False):
    """Data-parallel train step over `mesh`'s `axis_name` axis.

    Batch args are sharded on axis 0; params/state replicated.  Negatives
    gather across shards inside the loss; grads/metrics pmean across shards
    — step-for-step equal to single-device training on the global batch.

    `donate=True` donates the input TrainState's buffers to the step
    (halves peak memory for params + Adam moments — at EVA02-L scale that
    decides what fits per chip).  Opt-in because the donated state is
    invalidated: callers that reuse the input state after stepping (the
    oracle pattern in tests) must leave it off.  The pretraining CLI
    enables it.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def _shard_step(state, pc, text_embed, image_embed, mask):
        (loss, metrics), grads = jax.value_and_grad(
            _loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, state.logit_scale, model, pc, text_embed,
            image_embed, mask, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean(metrics, axis_name)
        return _apply_grads(state, tx, grads), metrics

    sharded = jax.jit(shard_map(
        _shard_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    ), donate_argnums=(0,) if donate else ())

    def dp_step(state, pc, text_embed, image_embed, mask=None):
        if mask is None:
            # all-ones mask ≡ the unmasked image leg (mean over all rows),
            # keeping this wrapper signature-compatible with train_step
            mask = jnp.ones((pc.shape[0],), jnp.float32)
        return sharded(state, pc, text_embed, image_embed, mask)

    return dp_step
