"""Pipeline parallelism (parallel/pp.py): the GPipe-scheduled forward must
equal the plain single-device forward for both trunk families, across stage
counts and microbatch factors (bubble schedules included).

Runs on the virtual 8-device CPU mesh (conftest pins JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count=8).  No reference analogue — the
reference has no pipeline parallelism (SURVEY.md §2.4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from uni_adapter_tpu.models.pointbert import ULIP
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import pp


def _mesh(n, axis="stage"):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _uni3d(depth):
    return Uni3D(trans_dim=48, embed_dim=32, num_group=16, group_size=8,
                 encoder_dim=24, depth=depth, num_heads=4,
                 dtype=jnp.float32)


def _ulip(depth):
    return ULIP(trans_dim=48, depth=depth, num_heads=4, num_group=16,
                group_size=8, encoder_dim=24, embed_dim=32,
                dtype=jnp.float32)


@pytest.mark.parametrize("n_stages,depth,n_micro", [
    (2, 4, 2),    # 2 blocks/stage, no extra microbatching
    (4, 4, 2),    # 1 block/stage, bubble = 3/5 of ticks
    (4, 8, 4),
    (8, 8, 2),    # full virtual mesh
])
def test_pp_uni3d_matches_plain_forward(n_stages, depth, n_micro):
    mesh = _mesh(n_stages)
    model = _uni3d(depth)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=n_micro)
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_stages,depth,n_micro", [
    (2, 4, 2),
    (4, 4, 4),
])
def test_pp_ulip_matches_plain_forward(n_stages, depth, n_micro):
    mesh = _mesh(n_stages)
    model = _ulip(depth)
    rng = np.random.default_rng(1)
    pc = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_ulip(model, mesh, n_micro=n_micro)
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pp_dp_composition_matches_plain_forward():
    """PP × DP on a 2-D (stage, data) mesh: trunk blocks sharded over
    `stage`, the microbatch batch dimension over `data` — output equal to
    the plain forward."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("stage", "data"))
    model = _uni3d(4)
    rng = np.random.default_rng(5)
    pc = jnp.asarray(rng.standard_normal((8, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2,
                                            data_axis="data")
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pp_tp_composition_matches_plain_forward():
    """PP × TP on a 2-D (stage, model) mesh: blocks stage-sharded AND
    Megatron-sharded over `model` (partial-manual shard_map — GSPMD
    inserts the per-block all-reduces inside the pipeline body).  Output
    equal to the plain forward."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("stage", "model"))
    # trans_dim 48 → SwiGLU hidden 128, divisible by the model-axis size
    model = _uni3d(4)
    rng = np.random.default_rng(11)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2,
                                            tp_axis="model")
    pp_params = prepare(params)
    # the block matrices really carry the TP sharding
    qk = pp_params[0]["attn"]["q_proj"]["kernel"]
    assert "model" in str(qk.sharding.spec)
    got = np.asarray(fwd(pp_params, pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pp_tp_dp_3d_composition_matches_plain_forward():
    """The full trifecta on a 3-D (stage, model, data) mesh: depth over
    `stage`, block matrices over `model`, microbatch batch over `data` —
    one program, output equal to the plain forward."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("stage", "model", "data"))
    model = _uni3d(4)
    rng = np.random.default_rng(13)
    pc = jnp.asarray(rng.standard_normal((8, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2,
                                            tp_axis="model",
                                            data_axis="data")
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rel_pe", [False, True])
def test_pp_openshape_matches_plain_forward(rel_pe):
    from uni_adapter_tpu.models.ppta import PPTAPreset, Projected

    mesh = _mesh(2)
    preset = PPTAPreset(dim=48, depth=4, heads=4, mlp_dim=96, sa_dim=24,
                        patches=16, prad=0.4, nsamp=8)
    model = Projected(preset=preset, out_channel=32, rel_pe=rel_pe,
                      dtype=jnp.float32)
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    features = jnp.concatenate([xyz, jnp.ones_like(xyz)], axis=-1)
    params = model.init(jax.random.PRNGKey(0), xyz, features)
    want = np.asarray(jax.jit(model.apply)(params, xyz, features))

    from uni_adapter_tpu.parallel.pp import make_pp_forward_openshape
    prepare, fwd = make_pp_forward_openshape(model, mesh, n_micro=2)
    got = np.asarray(fwd(prepare(params), xyz, features))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pp_bf16_matches_plain_forward():
    """PP under the production compute dtype (bf16 compute / fp32 state):
    the pipeline must match the plain bf16 forward within bf16 tolerance —
    catches layout- or schedule-dependent precision drift the fp32 tests
    cannot see."""
    mesh = _mesh(2)
    model = Uni3D(trans_dim=48, embed_dim=32, num_group=16, group_size=8,
                  encoder_dim=24, depth=4, num_heads=4,
                  dtype=jnp.bfloat16)
    rng = np.random.default_rng(31)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2)
    got = np.asarray(fwd(prepare(params), pc))
    # identical op order per block; only the (replicated) pre/post and the
    # ring transport differ — bf16-scale tolerance
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pp_stage_shards_hold_distinct_blocks():
    """Each stage's local stack must be that stage's blocks, in order —
    stacking + resharding must not permute layers (a wrong order would
    still produce the right shapes, so assert on values)."""
    mesh = _mesh(2)
    model = _uni3d(4)
    pc = jnp.zeros((1, 64, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    pe = params["params"]["point_encoder"]
    stacked = pp.stack_trunk_params(pe, 4, 2)
    k = stacked["attn"]["q_proj"]["kernel"]
    assert k.shape[:2] == (2, 2)
    for s in range(2):
        for j in range(2):
            np.testing.assert_array_equal(
                np.asarray(k[s, j]),
                np.asarray(pe[f"blocks_{2 * s + j}"]["attn"]["q_proj"]
                           ["kernel"]))


def test_pp_rejects_indivisible_depth():
    mesh = _mesh(4)
    model = _uni3d(6)   # 6 blocks over 4 stages
    pc = jnp.zeros((1, 64, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    prepare, _ = pp.make_pp_forward_uni3d(model, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        prepare(params)


def test_pp_grad_matches_plain_forward():
    """jax.grad through the GPipe schedule must equal the plain forward's
    gradients — block grads (transposed ppermute ring) AND the replicated
    pre/post params.  This is what makes PP training-capable."""
    mesh = _mesh(2)
    model = _uni3d(4)
    rng = np.random.default_rng(7)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    ct = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    want = jax.grad(lambda p: jnp.sum(model.apply(p, pc) * ct))(params)
    want_pe = want["params"]["point_encoder"]

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2)
    got_stacked, got_rest = jax.grad(
        lambda pp_p: jnp.sum(fwd(pp_p, pc) * ct))(prepare(params))

    # block grads: stage s, local j  ==  plain blocks_{2s+j}
    for s in range(2):
        for j in range(2):
            got_b = jax.tree.map(lambda a: np.asarray(a[s, j]), got_stacked)
            jax.tree.map(
                lambda g, w: np.testing.assert_allclose(
                    g, np.asarray(w), rtol=1e-4, atol=1e-5),
                got_b, want_pe[f"blocks_{2 * s + j}"])
    # replicated pre/post params
    for key in got_rest:
        jax.tree.map(
            lambda g, w: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-5),
            got_rest[key], want_pe[key])


def test_pp_train_step_matches_single_device():
    """One PP train step == one single-device train_step: same metrics and
    the same updated parameters (optimizer moments live stage-sharded).

    SGD, not AdamW, for the param-parity assertion: Adam's first step is
    ~lr·g/(|g|+eps), which amplifies float-noise-scale gradients (the tiny
    random model has q_norm grads ~1e-8) into ±lr/2 sign flips — an
    ill-conditioned comparison that says nothing about the PP machinery.
    SGD inherits the grad parity proven above linearly.  The AdamW-specific
    piece (the decay mask) is covered by
    test_decay_mask_stacking_invariant."""
    import optax

    from uni_adapter_tpu import train as tr

    mesh = _mesh(2)
    model = _uni3d(4)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-2))
    rng = np.random.default_rng(9)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    state0 = tr.init_train_state(model, jax.random.PRNGKey(0), pc, tx)
    state1, metrics1 = tr.train_step(model, tx, state0, pc, text, image)

    prepare, step = pp.make_pp_train_step_uni3d(model, tx, mesh, n_micro=2)
    pstate0 = pp.init_pp_train_state(model, jax.random.PRNGKey(0), pc, tx,
                                     prepare)
    pstate1, pmetrics = step(pstate0, pc, text, image)

    np.testing.assert_allclose(float(pmetrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(pstate1.logit_scale),
                               float(state1.logit_scale), rtol=1e-6)

    # updated params equal: unstack the PP blocks against the plain tree
    upd_pe = state1.params["point_encoder"]
    got_stacked, got_rest = pstate1.params
    for s in range(2):
        for j in range(2):
            got_b = jax.tree.map(lambda a: np.asarray(a[s, j]), got_stacked)
            jax.tree.map(
                lambda g, w: np.testing.assert_allclose(
                    g, np.asarray(w), rtol=1e-4, atol=1e-6),
                got_b, upd_pe[f"blocks_{2 * s + j}"])
    for key in got_rest:
        jax.tree.map(
            lambda g, w: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-6),
            got_rest[key], upd_pe[key])


def test_pp_train_step_ulip_matches_single_device():
    """The ULIP PP train step equals train.train_step (same loss, same
    updated params) — single-input convention, carry (x, pos)."""
    import optax

    from uni_adapter_tpu import train as tr

    mesh = _mesh(2)
    model = _ulip(4)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-2))
    rng = np.random.default_rng(17)
    pts = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    state0 = tr.init_train_state(model, jax.random.PRNGKey(0), pts, tx)
    state1, metrics1 = tr.train_step(model, tx, state0, pts, text, image)

    prepare, step = pp.make_pp_train_step_ulip(model, tx, mesh, n_micro=2)
    pstate0 = pp.init_pp_train_state(model, jax.random.PRNGKey(0), pts, tx,
                                     prepare)
    pstate1, pmetrics = step(pstate0, pts, text, image)

    np.testing.assert_allclose(float(pmetrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-5)
    upd_pe = state1.params["point_encoder"]
    got_stacked, got_rest = pstate1.params
    for s in range(2):
        for j in range(2):
            got_b = jax.tree.map(lambda a: np.asarray(a[s, j]), got_stacked)
            jax.tree.map(
                lambda g, w: np.testing.assert_allclose(
                    g, np.asarray(w), rtol=1e-4, atol=1e-6),
                got_b, upd_pe[f"blocks_{2 * s + j}"])


def test_pp_train_step_openshape_matches_manual():
    """The OpenShape PP train step ((xyz, features) convention) equals a
    manually assembled single-device SGD step on the same loss."""
    import optax

    from uni_adapter_tpu.models.losses import uni3d_text_image_loss
    from uni_adapter_tpu.models.ppta import PPTAPreset, Projected
    from uni_adapter_tpu.train import TrainState, _apply_grads

    mesh = _mesh(2)
    preset = PPTAPreset(dim=48, depth=4, heads=4, mlp_dim=96, sa_dim=24,
                        patches=16, prad=0.4, nsamp=8)
    model = Projected(preset=preset, out_channel=32, rel_pe=False,
                      dtype=jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-2))
    rng = np.random.default_rng(19)
    xyz = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    features = jnp.concatenate([xyz, jnp.ones_like(xyz)], axis=-1)
    text = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    mask = jnp.ones((4,), jnp.float32)

    params = model.init(jax.random.PRNGKey(0), xyz, features)["params"]
    logit_scale = jnp.float32(np.log(1 / 0.07))
    opt_state = tx.init((params, logit_scale))
    state0 = TrainState(params, logit_scale, opt_state, jnp.int32(0))

    def loss_fn(p, ls):
        emb = model.apply({"params": p}, xyz, features)
        out = uni3d_text_image_loss(emb, text, image, jnp.exp(ls),
                                    mask=mask, axis_name=None)
        return out["loss"], out

    (_, metrics1), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, logit_scale)
    state1 = _apply_grads(state0, tx, grads)

    prepare, step = pp.make_pp_train_step_openshape(model, tx, mesh,
                                                    n_micro=2)
    pstate0 = pp.init_pp_train_state(model, jax.random.PRNGKey(0),
                                     (xyz, features), tx, prepare)
    pstate1, pmetrics = step(pstate0, xyz, features, text, image, mask)

    np.testing.assert_allclose(float(pmetrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-5)
    got_stacked, got_rest = pstate1.params
    upd = state1.params
    for s in range(2):
        for j in range(2):
            got_b = jax.tree.map(lambda a: np.asarray(a[s, j]), got_stacked)
            jax.tree.map(
                lambda g, w: np.testing.assert_allclose(
                    g, np.asarray(w), rtol=1e-4, atol=1e-6),
                got_b, upd["ppat"][f"layers_{2 * s + j}"])
    jax.tree.map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-6),
        got_rest["proj"], upd["proj"])


def test_pp_tp_train_step_matches_single_device():
    """PP × TP TRAINING on a (stage, model) mesh: one step equals the
    single-device step — block grads and moments shard over both axes."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import optax

    from uni_adapter_tpu import train as tr

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("stage", "model"))
    model = _uni3d(4)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-2))
    rng = np.random.default_rng(23)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    state0 = tr.init_train_state(model, jax.random.PRNGKey(0), pc, tx)
    state1, metrics1 = tr.train_step(model, tx, state0, pc, text, image)

    prepare, step = pp.make_pp_train_step_uni3d(model, tx, mesh, n_micro=2,
                                                tp_axis="model")
    pstate0 = pp.init_pp_train_state(model, jax.random.PRNGKey(0), pc, tx,
                                     prepare)
    pstate1, pmetrics = step(pstate0, pc, text, image)

    np.testing.assert_allclose(float(pmetrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-5)
    # updated block params keep the 2-axis sharding and equal the plain step
    got_stacked, _ = pstate1.params
    assert "model" in str(got_stacked["attn"]["q_proj"]["kernel"]
                          .sharding.spec)
    upd_pe = state1.params["point_encoder"]
    for s in range(2):
        for j in range(2):
            got_b = jax.tree.map(lambda a: np.asarray(a[s, j]), got_stacked)
            jax.tree.map(
                lambda g, w: np.testing.assert_allclose(
                    g, np.asarray(w), rtol=1e-4, atol=1e-6),
                got_b, upd_pe[f"blocks_{2 * s + j}"])


def test_pp_engine_step_trajectory_matches():
    """The full MODE-DOTA adaptation scan runs with the trunk as a GPipe
    pipeline (engine.make_scan_fn(encode_fn=pp.make_pp_encode_fn(...)))
    and reproduces the replicated trajectory — TTA for trunks larger than
    one chip's HBM, mirroring tests/test_tp.py's TP twin."""
    from uni_adapter_tpu import engine
    from uni_adapter_tpu.config import (CacheConfig, Config, DotaConfig,
                                        ModelConfig)

    mesh = _mesh(2)
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

    prepare, encode = pp.make_pp_encode_fn(model, mesh, "uni3d")
    scan_pp = jax.jit(engine.make_scan_fn(cfg, model, encode_fn=encode))
    _, outs_pp = scan_pp(prepare(params), text, state0, pcs, rgbs, tgts)

    np.testing.assert_allclose(np.asarray(outs_pp.final_logits),
                               np.asarray(outs_rep.final_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(outs_pp.correct),
                                  np.asarray(outs_rep.correct))


def test_pp_engine_step_trajectory_matches_ulip():
    """ULIP twin of the engine-trajectory test: the pipelined trunk's
    extras path (pos re-taken locally per microbatch instead of riding the
    ring) must reproduce the replicated MODE-DOTA trajectory inside the
    full adaptation scan, noise-aug double fit included."""
    from uni_adapter_tpu import engine
    from uni_adapter_tpu.config import (CacheConfig, Config, DotaConfig,
                                        ModelConfig)

    mesh = _mesh(2)
    model = _ulip(4)
    K, N, T = 5, 64, 4
    rng = np.random.default_rng(31)
    pc0 = jnp.asarray(rng.standard_normal((1, N, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    text = jnp.asarray(text)
    cfg = Config(model=ModelConfig(vlm3d="ulip", compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=True, residual_steps=2),
                 cache=CacheConfig(cg_max_iter=10))
    pcs = jnp.asarray(rng.standard_normal((T, 1, N, 3)), jnp.float32)
    rgbs = jnp.ones_like(pcs)
    tgts = jnp.asarray(rng.integers(0, K, (T, 1)), jnp.int32)

    scan_rep = jax.jit(engine.make_scan_fn(cfg, model))
    state0 = engine.init_state(cfg, text, jax.random.PRNGKey(7))
    _, outs_rep = scan_rep(params, text, state0, pcs, rgbs, tgts)

    prepare, encode = pp.make_pp_encode_fn(model, mesh, "ulip")
    scan_pp = jax.jit(engine.make_scan_fn(cfg, model, encode_fn=encode))
    _, outs_pp = scan_pp(prepare(params), text, state0, pcs, rgbs, tgts)

    np.testing.assert_allclose(np.asarray(outs_pp.final_logits),
                               np.asarray(outs_rep.final_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(outs_pp.correct),
                                  np.asarray(outs_rep.correct))


def test_decay_mask_stacking_invariant():
    """train.decay_mask must mark the SAME leaves (kernels yes;
    biases/norm gains/cls tokens no) whether the block params are plain
    or PP-stacked to (S, L/S, ...) — a rank-based mask would not."""
    from uni_adapter_tpu import train as tr

    model = _uni3d(4)
    pc = jnp.zeros((1, 64, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)["params"]
    mask_plain, ls_plain = tr.decay_mask((params, jnp.float32(0.0)))
    assert ls_plain is False

    pe = params["point_encoder"]
    stacked = pp.stack_trunk_params(pe, 4, 2)
    mask_stacked, _ = tr.decay_mask(((stacked,), jnp.float32(0.0)))

    # stacked mask for block leaf == plain mask for the same leaf name
    plain_b0 = jax.tree_util.tree_leaves_with_path(
        tr.decay_mask((pe["blocks_0"], jnp.float32(0.0)))[0])
    stacked_leaves = jax.tree_util.tree_leaves_with_path(mask_stacked[0])
    assert [m for _, m in plain_b0] == [m for _, m in stacked_leaves]

    # spot-check semantics on the plain tree
    flat = {jax.tree_util.keystr(p): m
            for p, m in jax.tree_util.tree_leaves_with_path(mask_plain)}
    assert any(k.endswith("['kernel']") and m for k, m in flat.items())
    assert not any(m for k, m in flat.items() if k.endswith("['bias']"))
    assert not any(m for k, m in flat.items() if "cls_token" in k)
    assert not any(m for k, m in flat.items() if k.endswith("['scale']"))


def test_pp_rejects_indivisible_batch():
    mesh = _mesh(2)
    model = _uni3d(4)
    rng = np.random.default_rng(2)
    pc = jnp.asarray(rng.standard_normal((3, 64, 6)), jnp.float32)  # B=3
    params = model.init(jax.random.PRNGKey(0), pc)
    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2)
    with pytest.raises(ValueError, match="not divisible"):
        fwd(prepare(params), pc)


# ---------------------------------------------------------------------------
# ring payload: per-microbatch constants must not rotate
# ---------------------------------------------------------------------------

def _count_ppermutes(jaxpr):
    """Recursively count ppermute eqns in a (Closed)Jaxpr."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "ppermute":
            n += 1
        for v in eqn.params.values():
            for sub in (v if isinstance(v, (tuple, list)) else (v,)):
                if hasattr(sub, "eqns") or hasattr(sub, "jaxpr"):
                    n += _count_ppermutes(sub)
    return n


@pytest.mark.parametrize("interleave", [1, 2])
def test_ulip_ring_rotates_activations_only(interleave):
    """ULIP's pos embedding is a per-microbatch constant: stages re-take it
    locally from the replicated store (extras path), so the traced program
    must contain exactly ONE ppermute — the activation rotation — not two.
    Rotating (x, pos) would double the ring payload for no information."""
    mesh = _mesh(2)
    model = _ulip(4)
    rng = np.random.default_rng(3)
    pc = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    prepare, fwd = pp.make_pp_forward_ulip(model, mesh, n_micro=2,
                                           jit=False, interleave=interleave)
    jaxpr = jax.make_jaxpr(fwd)(prepare(params), pc)
    assert _count_ppermutes(jaxpr) == 1


@pytest.mark.parametrize("rel_pe", [False, True])
def test_openshape_ring_rotates_activations_only(rel_pe):
    """With rel_pe, the (B, S+1, S+1, 3) centroid-delta tensor dwarfs the
    activations at scale — it must be re-taken locally, never ppermuted."""
    from uni_adapter_tpu.models.ppta import PPTAPreset, Projected

    mesh = _mesh(2)
    preset = PPTAPreset(dim=48, depth=4, heads=4, mlp_dim=96, sa_dim=24,
                        patches=16, prad=0.4, nsamp=8)
    model = Projected(preset=preset, out_channel=32, rel_pe=rel_pe,
                      dtype=jnp.float32)
    rng = np.random.default_rng(4)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    features = jnp.concatenate([xyz, jnp.ones_like(xyz)], axis=-1)
    params = model.init(jax.random.PRNGKey(0), xyz, features)
    prepare, fwd = pp.make_pp_forward_openshape(model, mesh, n_micro=2,
                                                jit=False)
    jaxpr = jax.make_jaxpr(fwd)(prepare(params), xyz, features)
    assert _count_ppermutes(jaxpr) == 1
