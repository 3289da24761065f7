"""Sequence parallelism (parallel/sp.py): ring attention must equal dense
softmax attention, and the token-sharded forwards must equal the plain
single-device forward for both trunk families — padded (non-divisible token
counts, the flagship's 513-token case) and exact splits, composed with DP,
through jax.grad, and dropped into the TTA engine.

Runs on the virtual 8-device CPU mesh (conftest).  No reference analogue —
the reference has no sequence parallelism (SURVEY.md §2.4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from uni_adapter_tpu.models.pointbert import ULIP
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import pp, sp


def _mesh(n, axis="seq"):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _uni3d(depth, num_group=16):
    return Uni3D(trans_dim=48, embed_dim=32, num_group=num_group,
                 group_size=8, encoder_dim=24, depth=depth, num_heads=4,
                 dtype=jnp.float32)


def _ulip(depth, num_group=16):
    return ULIP(trans_dim=48, depth=depth, num_heads=4,
                num_group=num_group, group_size=8, encoder_dim=24,
                embed_dim=32, dtype=jnp.float32)


def _dense_attention(q, k, v, scale, valid):
    s = np.einsum("bhnd,bhmd->bhnm", q, k).astype(np.float64) * scale
    s = np.where(valid[None, None, None, :], s, -np.inf)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhnm,bhmd->bhnd", p, v)


@pytest.mark.parametrize("n_dev,n_tok", [
    (4, 16),   # exact split
    (8, 24),   # exact split, 3 tokens/chip
    (8, 19),   # padded: 5 tokens of right-padding, mask rides the ring
])
def test_ring_attention_matches_dense(n_dev, n_tok):
    mesh = _mesh(n_dev)
    B, H, hd = 2, 3, 8
    n_pad = -n_tok % n_dev
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((B, H, n_tok + n_pad, hd))
               .astype(np.float32) for _ in range(3))
    valid = np.arange(n_tok + n_pad) < n_tok
    scale = hd ** -0.5

    f = jax.jit(jax.shard_map(
        lambda q_, k_, v_, m: sp.ring_attention(q_, k_, v_, scale, "seq", m),
        mesh=mesh,
        in_specs=(P(None, None, "seq"),) * 3 + (P("seq"),),
        out_specs=P(None, None, "seq"), check_vma=False))
    got = np.asarray(f(q, k, v, valid.astype(np.float32)))[:, :, :n_tok]
    want = _dense_attention(q, k, v, scale, valid)[:, :, :n_tok]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n_dev,num_group", [
    (2, 16),   # 17 tokens: padded
    (4, 15),   # 16 tokens: exact split
    (8, 16),   # full virtual mesh, 17 tokens padded to 24
])
def test_sp_uni3d_matches_plain_forward(n_dev, num_group):
    mesh = _mesh(n_dev)
    model = _uni3d(4, num_group)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = sp.make_sp_forward_uni3d(model, mesh)
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_dev,num_group", [(4, 16), (8, 16)])
def test_sp_ulip_matches_plain_forward(n_dev, num_group):
    mesh = _mesh(n_dev)
    model = _ulip(4, num_group)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pts)
    want = np.asarray(jax.jit(model.apply)(params, pts))

    prepare, fwd = sp.make_sp_forward_ulip(model, mesh)
    got = np.asarray(fwd(prepare(params), pts))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sp_dp_composition_matches_plain_forward():
    """SP × DP on a 2-D (data, seq) mesh: batch over `data`, tokens over
    `seq` — output equal to the plain forward."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "seq"))
    model = _uni3d(4)
    rng = np.random.default_rng(3)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = sp.make_sp_forward_uni3d(model, mesh, data_axis="data")
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sp_bf16_close_to_plain_forward():
    """Under bf16 compute the SP trunk keeps fp32 softmax state while the
    plain path stores (N, N) logits in bf16 (models/common._attend) — the
    outputs agree to bf16-level tolerance, not bitwise."""
    mesh = _mesh(4)
    model = Uni3D(trans_dim=48, embed_dim=32, num_group=16, group_size=8,
                  encoder_dim=24, depth=2, num_heads=4,
                  dtype=jnp.bfloat16)
    rng = np.random.default_rng(5)
    pc = jnp.asarray(rng.standard_normal((2, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = sp.make_sp_forward_uni3d(model, mesh)
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_sp_train_step_matches_single_device():
    """One SP train step == one single-device train_step (same loss, same
    updated params): jax.grad rides through the ring's ppermutes.  SGD for
    the same conditioning reasons as test_pp_train_step_matches_single
    (Adam's first step amplifies float-noise-scale q_norm grads)."""
    import optax

    from uni_adapter_tpu import train as tr

    mesh = _mesh(4)
    model = _uni3d(4)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-2))
    rng = np.random.default_rng(9)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    state0 = tr.init_train_state(model, jax.random.PRNGKey(0), pc, tx)
    state1, metrics1 = tr.train_step(model, tx, state0, pc, text, image)

    prepare, step = sp.make_sp_train_step_uni3d(model, tx, mesh)
    sstate0 = pp.init_pp_train_state(model, jax.random.PRNGKey(0), pc, tx,
                                     prepare)
    sstate1, smetrics = step(sstate0, pc, text, image)

    np.testing.assert_allclose(float(smetrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(sstate1.logit_scale),
                               float(state1.logit_scale), rtol=1e-6)

    upd_pe = state1.params["point_encoder"]
    got_stacked, got_rest = sstate1.params
    for i in range(4):
        got_b = jax.tree.map(lambda a: np.asarray(a[i]), got_stacked)
        jax.tree.map(
            lambda g, w: np.testing.assert_allclose(
                g, np.asarray(w), rtol=1e-4, atol=1e-6),
            got_b, upd_pe[f"blocks_{i}"])
    for key in got_rest:
        jax.tree.map(
            lambda g, w: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-6),
            got_rest[key], upd_pe[key])


def test_sp_engine_step_trajectory_matches():
    """The full MODE-DOTA adaptation scan runs with the trunk token-sharded
    (engine.make_scan_fn(encode_fn=sp.make_sp_encode_fn(...))) and
    reproduces the replicated trajectory — TTA for clouds whose token count
    outgrows one chip, mirroring the PP/TP engine twins."""
    from uni_adapter_tpu import engine
    from uni_adapter_tpu.config import (CacheConfig, Config, DotaConfig,
                                        ModelConfig)

    mesh = _mesh(4)
    model = _uni3d(4)
    K, N, T = 5, 64, 4
    rng = np.random.default_rng(29)
    pc0 = jnp.asarray(rng.standard_normal((1, N, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    text = jnp.asarray(text)
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=True, residual_steps=2),
                 cache=CacheConfig(cg_max_iter=10))
    pcs = jnp.asarray(rng.standard_normal((T, 1, N, 3)), jnp.float32)
    rgbs = jnp.ones_like(pcs)
    tgts = jnp.asarray(rng.integers(0, K, (T, 1)), jnp.int32)

    scan_rep = jax.jit(engine.make_scan_fn(cfg, model))
    state0 = engine.init_state(cfg, text, jax.random.PRNGKey(7))
    _, outs_rep = scan_rep(params, text, state0, pcs, rgbs, tgts)

    prepare, encode = sp.make_sp_encode_fn(model, mesh, "uni3d")
    scan_sp = jax.jit(engine.make_scan_fn(cfg, model, encode_fn=encode))
    _, outs_sp = scan_sp(prepare(params), text, state0, pcs, rgbs, tgts)

    np.testing.assert_allclose(np.asarray(outs_sp.final_logits),
                               np.asarray(outs_rep.final_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(outs_sp.correct),
                                  np.asarray(outs_rep.correct))


def test_sp_rejects_int8_trunk():
    mesh = _mesh(2)
    model = Uni3D(trans_dim=48, embed_dim=32, num_group=16, group_size=8,
                  encoder_dim=24, depth=2, num_heads=4, quantize=True,
                  dtype=jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        sp.make_sp_forward_uni3d(model, mesh)


def test_sp_encode_rejects_openshape():
    mesh = _mesh(2)
    with pytest.raises(ValueError, match="uni3d"):
        sp.make_sp_encode_fn(_uni3d(2), mesh, "openshape")
