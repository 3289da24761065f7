"""Contrastive pretraining loop tests (beyond-parity: the reference ships
the loss + DDP scaffolding but no training entry point).

DP exactness: with the negatives all-gathered inside the loss and grads
pmean-ed, the shard_map step over the 8-device mesh must equal the
single-device step on the concatenated global batch.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.train import (init_train_state, make_dp_train_step,
                                   make_optimizer, train_step)

D, N = 16, 32


def _setup(B):
    model = Uni3D(trans_dim=16, embed_dim=D, num_group=4, group_size=4,
                  encoder_dim=8, depth=1, num_heads=2, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    mask = jnp.ones((B,), jnp.float32)
    tx = make_optimizer(lr=1e-3, total_steps=50, warmup_steps=1)
    state = init_train_state(model, jax.random.PRNGKey(0), pc[:1], tx)
    return model, tx, state, pc, text, image, mask


def test_train_step_loss_decreases():
    model, tx, state, pc, text, image, mask = _setup(B=8)
    losses = []
    for _ in range(12):
        state, m = train_step(model, tx, state, pc, text, image, mask)
        assert np.isfinite(float(m["loss"]))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]          # deterministic objective
    assert int(state.step) == 12


def test_train_step_image_mask():
    model, tx, state, pc, text, image, mask = _setup(B=8)
    # all-masked image leg: loss reduces to the pc↔text term only
    zmask = jnp.zeros((8,), jnp.float32)
    _, m_masked = train_step(model, tx, state, pc, text, image, zmask)
    _, m_full = train_step(model, tx, state, pc, text, image, mask)
    assert float(m_masked["loss"]) < float(m_full["loss"])


def test_dp_train_step_matches_single_device():
    n_dev = 8
    assert len(jax.devices()) >= n_dev
    model, tx, state, pc, text, image, mask = _setup(B=n_dev * 2)

    s_single, m_single = train_step(model, tx, state, pc, text, image, mask)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    dp_step = make_dp_train_step(model, tx, mesh)
    s_dp, m_dp = dp_step(state, pc, text, image, mask)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_single["pc_text_acc"]),
                               float(m_dp["pc_text_acc"]), atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=1e-6),
        s_single.params, s_dp.params)
    np.testing.assert_allclose(float(s_single.logit_scale),
                               float(s_dp.logit_scale), rtol=1e-5)


def test_dp_train_step_matches_single_device_nonuniform_mask():
    """The image-validity mask normalises by the GLOBAL mask count under
    DP — shards with different numbers of valid images must still match
    single-device training exactly (losses.py masked branch)."""
    n_dev = 8
    model, tx, state, pc, text, image, _ = _setup(B=n_dev * 2)
    # first half of the global batch masked out entirely: shards 0-3 carry
    # zero valid images, shards 4-7 carry two each
    mask = jnp.concatenate([jnp.zeros((n_dev,), jnp.float32),
                            jnp.ones((n_dev,), jnp.float32)])

    s_single, m_single = train_step(model, tx, state, pc, text, image, mask)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    dp_step = make_dp_train_step(model, tx, mesh)
    s_dp, m_dp = dp_step(state, pc, text, image, mask)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=1e-6),
        s_single.params, s_dp.params)


def test_logit_scale_excluded_from_decay_and_clamped():
    """Weight decay must not touch logit_scale, and the parameter is
    clamped to log(100) after the step (the open_clip recipe)."""
    model, tx, state, pc, text, image, mask = _setup(B=8)
    # plant a logit_scale above the cap: the step must clamp it back
    state = state._replace(logit_scale=jnp.float32(10.0))
    state2, _ = train_step(model, tx, state, pc, text, image, mask)
    assert float(state2.logit_scale) <= np.log(100.0) + 1e-6
