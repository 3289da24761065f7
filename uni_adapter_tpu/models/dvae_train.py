"""dVAE training loop — the point-tokenizer pretraining stage.

The reference ships the dVAE inference graph only (models/ulip/pointbert/
dvae.py; its training recipe lives in the upstream Point-BERT project and is
not part of the repo).  This module completes the capability TPU-first: a
pure jittable train step over the DiscreteVAE in models/dvae.py with the
standard Point-BERT schedule shapes — Gumbel temperature annealed
exponentially 1 → 0.0625 and a linearly warmed KL weight — so the tokenizer
can be (re)trained on-device.  Data parallelism composes from the outside:
the step is pure, so `jax.jit(..., in_shardings=...)` over a mesh axis or
`parallel.mesh`'s helpers shard it without changes.

Design notes
------------
* The whole epoch can run as one `lax.scan` over pre-batched data
  (`train_epoch`), keeping the optimiser loop on-device like the engine's
  stream scan — no per-batch dispatch overhead.
* Schedules are computed *inside* the jitted step from the carried step
  counter, so one compiled step serves the whole run (no per-temperature
  recompiles).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from uni_adapter_tpu.models.dvae import DiscreteVAE, dvae_loss


class DVAETrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array          # () int32


class DVAESchedule(NamedTuple):
    """Point-BERT-style schedules (upstream Point-BERT train config)."""
    temp_start: float = 1.0
    temp_end: float = 0.0625
    temp_anneal_steps: int = 100_000
    kl_weight: float = 0.1
    kl_warmup_steps: int = 10_000


def schedule_at(sched: DVAESchedule, step: jax.Array) -> Tuple[jax.Array,
                                                               jax.Array]:
    """(temperature, kl_weight) at `step` — exponential temp decay, linear
    KL warmup; both computed on-device so the step compiles once."""
    frac = jnp.clip(step / sched.temp_anneal_steps, 0.0, 1.0)
    log_t = (jnp.log(sched.temp_start)
             + frac * (jnp.log(sched.temp_end) - jnp.log(sched.temp_start)))
    temp = jnp.exp(log_t)
    kl_w = sched.kl_weight * jnp.clip(step / sched.kl_warmup_steps, 0.0, 1.0)
    return temp.astype(jnp.float32), kl_w.astype(jnp.float32)


def make_optimizer(lr: float = 5e-4, weight_decay: float = 1e-4,
                   total_steps: int = 300_000,
                   warmup_steps: int = 3_000) -> optax.GradientTransformation:
    """AdamW + linear warmup → cosine decay, grad-norm clipped at 10."""
    lr_sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.chain(optax.clip_by_global_norm(10.0),
                       optax.adamw(lr_sched, weight_decay=weight_decay))


def init_train_state(model: DiscreteVAE, rng: jax.Array, example: jax.Array,
                     tx: optax.GradientTransformation) -> DVAETrainState:
    p_rng, g_rng = jax.random.split(rng)
    params = model.init(p_rng, example, g_rng)["params"]
    return DVAETrainState(params, tx.init(params), jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("model", "tx", "sched", "hard"))
def dvae_train_step(model: DiscreteVAE, tx: optax.GradientTransformation,
                    sched: DVAESchedule, state: DVAETrainState,
                    batch: jax.Array, rng: jax.Array, hard: bool = False
                    ) -> Tuple[DVAETrainState, dict]:
    """One optimiser step.  batch: (B, N, 3) clouds."""
    temp, kl_w = schedule_at(sched, state.step)
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        ret = model.apply({"params": params}, batch, step_rng,
                          temperature=temp, hard=hard)
        rec, klv = dvae_loss(ret)
        return rec + kl_w * klv, (rec, klv)

    (loss, (rec, klv)), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {"loss": loss, "recon": rec, "kl": klv,
               "temperature": temp, "kl_weight": kl_w}
    return DVAETrainState(params, opt_state, state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("model", "tx", "sched", "hard"))
def train_epoch(model: DiscreteVAE, tx: optax.GradientTransformation,
                sched: DVAESchedule, state: DVAETrainState,
                batches: jax.Array, rng: jax.Array, hard: bool = False
                ) -> Tuple[DVAETrainState, dict]:
    """Scan the train step over (T, B, N, 3) pre-batched data on-device."""
    def body(carry, batch):
        new_state, metrics = dvae_train_step(model, tx, sched, carry, batch,
                                             rng, hard=hard)
        return new_state, metrics

    return jax.lax.scan(body, state, batches)
