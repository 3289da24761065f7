"""Pretraining demo: contrastive point-encoder distillation + dVAE tokenizer.

Runs both training loops this framework adds beyond the reference (which
ships the losses and inference graphs but no training entry points —
PARITY.md "New capabilities"):

  1. `train.py` — distil a small Uni3D-style point encoder into a frozen
     CLIP embedding space with the pc↔text/pc↔image InfoNCE loss
     (reference models/losses.py:7-69), optionally data-parallel over all
     local devices via shard_map (gathered negatives, pmean grads).
  2. `models/dvae_train.py` — the Point-BERT dVAE tokenizer with Gumbel
     temperature annealing and a scanned epoch.

Synthetic data; a few steps; prints the loss curves.  Runs on CPU
(`JAX_PLATFORMS=cpu python examples/pretraining_demo.py`) or TPU.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uni_adapter_tpu.models.uni3d import Uni3D  # noqa: E402
from uni_adapter_tpu.train import (init_train_state, make_dp_train_step,
                                   make_optimizer, train_step)


def contrastive_demo(steps: int = 10, dp: bool = True) -> None:
    D, B, N = 32, 16, 128
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=16, group_size=8,
                  encoder_dim=16, depth=2, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    mask = jnp.ones((B,), jnp.float32)

    tx = make_optimizer(lr=1e-3, total_steps=steps, warmup_steps=1)
    state = init_train_state(model, jax.random.PRNGKey(0), pc[:1], tx)

    n_dev = len(jax.devices())
    if dp and n_dev > 1 and B % n_dev == 0:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        step_fn = make_dp_train_step(model, tx, mesh)
        print(f"data-parallel over {n_dev} devices")
        run = lambda s: step_fn(s, pc, text, image, mask)
    else:
        run = lambda s: train_step(model, tx, s, pc, text, image, mask)

    for i in range(steps):
        state, m = run(state)
        print(f"step {i:2d}  loss={float(m['loss']):.4f}  "
              f"pc_text_acc={float(m['pc_text_acc']):.1f}%")


def dvae_demo(steps: int = 8) -> None:
    from uni_adapter_tpu.models.dvae import DiscreteVAE
    from uni_adapter_tpu.models.dvae_train import (
        DVAESchedule, dvae_train_step, init_train_state as dvae_init,
        make_optimizer as dvae_opt)

    model = DiscreteVAE(num_group=8, group_size=8, encoder_dims=16,
                        tokens_dims=16, decoder_dims=16, num_tokens=64)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 3), jnp.float32)
    tx = dvae_opt(lr=3e-3, total_steps=steps, warmup_steps=1)
    sched = DVAESchedule(temp_anneal_steps=steps, kl_warmup_steps=2)
    state = dvae_init(model, rng, pts, tx)
    for i in range(steps):
        state, m = dvae_train_step(model, tx, sched, state, pts, rng)
        print(f"dvae step {i:2d}  loss={float(m['loss']):.4f}  "
              f"recon={float(m['recon']):.4f}  temp={float(m['temperature']):.3f}")


if __name__ == "__main__":
    print("== contrastive point-encoder distillation ==")
    contrastive_demo()
    print("\n== dVAE tokenizer training ==")
    dvae_demo()
