"""Elastic recovery: interrupt the host-loop stream mid-way, restart from the
periodic checkpoint, and the final trajectory must equal the uninterrupted
run exactly (SURVEY.md §5.3/5.4 — a capability the reference lacks)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D

K, D, N, T = 4, 16, 32, 6


def test_interrupt_and_resume(tmp_path):
    model = Uni3D(trans_dim=24, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc0 = jnp.asarray(rng.standard_normal((1, N, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=False),
                 cache=CacheConfig(cg_max_iter=5))
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (T, 1)).astype(np.int32)
    batches = list(zip(pcs, rgbs, targets))
    ckpt = os.path.join(tmp_path, "stream")

    # uninterrupted reference run
    full = engine.run_stream(cfg, model, params, jnp.asarray(text), batches)

    # crash after 4 steps (checkpoint every 2)
    class Boom(Exception):
        pass

    def crashing():
        for i, b in enumerate(batches):
            if i == 4:
                raise Boom()
            yield b

    with pytest.raises(Boom):
        engine.run_stream(cfg, model, params, jnp.asarray(text), crashing(),
                          checkpoint_every=2, checkpoint_path=ckpt)
    assert os.path.exists(ckpt + ".npz")

    # restart: resumes at the checkpointed step, skips seen batches
    resumed = engine.run_stream(cfg, model, params, jnp.asarray(text),
                                batches, checkpoint_every=2,
                                checkpoint_path=ckpt)
    assert resumed["acc1"] == pytest.approx(full["acc1"], abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(resumed["state"].method_state.mu),
        np.asarray(full["state"].method_state.mu), rtol=1e-5, atol=1e-7)
    assert int(resumed["state"].step) == T
