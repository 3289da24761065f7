"""Interleaved virtual-stage pipeline schedule (parallel/pp_interleave.py):
schedule-table invariants, bubble reduction vs GPipe in chunk-tick units,
and forward/grad/train equality with the plain single-device forward for
all three trunk families.

Runs on the virtual 8-device CPU mesh (conftest).  No reference analogue —
the reference has no pipeline parallelism (SURVEY.md §2.4); this is the
1F1B-interleaving follow-up ROADMAP.md lists for deep trunks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from uni_adapter_tpu.models.pointbert import ULIP
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import pp
from uni_adapter_tpu.parallel.pp_interleave import (
    build_interleaved_schedule, stack_trunk_params_interleaved)


def _mesh(n, axes=("stage",)):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    shape = (n,) if len(axes) == 1 else (n // 2, 2)
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), axes)


def _uni3d(depth):
    return Uni3D(trans_dim=48, embed_dim=32, num_group=16, group_size=8,
                 encoder_dim=24, depth=depth, num_heads=4,
                 dtype=jnp.float32)


def _ulip(depth):
    return ULIP(trans_dim=48, depth=depth, num_heads=4, num_group=16,
                group_size=8, encoder_dim=24, embed_dim=32,
                dtype=jnp.float32)


# ---------------------------------------------------------------------------
# schedule tables
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("S,V,M", [
    (2, 2, 2), (2, 2, 4), (4, 2, 8), (2, 4, 8), (4, 4, 8), (3, 2, 5),
])
def test_schedule_invariants(S, V, M):
    """Work conservation, injection order, output completeness, and a
    legal queue-slot lifecycle (never write an occupied slot, never read a
    free one — compute reads before the tick's arrival lands)."""
    sched = build_interleaved_schedule(S, V, M)
    trash = V * sched.queue

    # every device performs exactly V*M chunk computes
    np.testing.assert_array_equal(sched.busy, np.full(S, V * M))

    # injections: device 0 only, each microbatch once, ascending
    inj = sched.inj_m
    assert (inj[:, 1:] == -1).all()
    got = [m for m in inj[:, 0] if m >= 0]
    assert got == list(range(M))

    # outputs: device 0 only, each microbatch exactly once
    outs = sched.out_m
    assert (outs[:, 1:] == -1).all()
    assert sorted(m for m in outs[:, 0] if m >= 0) == list(range(M))

    # queue-slot lifecycle per device
    for s in range(S):
        occupied = np.zeros(trash, bool)
        for t in range(sched.ticks):
            cs = sched.cmp_slot[t, s]
            if cs != trash:
                assert occupied[cs], f"read of free slot {cs} at t={t}"
                occupied[cs] = False
            rs = sched.rcv_slot[t, s]
            if rs != trash:
                assert not occupied[rs], f"write to busy slot {rs} at t={t}"
                occupied[rs] = True
        assert not occupied.any(), "slots left occupied at drain"

    # cmp_m (drives the local extras re-take): active exactly on busy
    # ticks, and each device computes every (chunk, microbatch) pair once
    for s in range(S):
        active = (sched.inj_m[:, s] >= 0) | (sched.cmp_slot[:, s] != trash)
        np.testing.assert_array_equal(sched.cmp_m[:, s] >= 0, active)
        pairs = sorted(
            (int(sched.cmp_chunk[t, s]), int(sched.cmp_m[t, s]))
            for t in range(sched.ticks) if sched.cmp_m[t, s] >= 0)
        assert pairs == sorted((v, m) for v in range(V) for m in range(M))


def test_schedule_property_sweep():
    """Randomized sweep over (S, V, M) including the S=1 / V=1 / M=1 edges:
    the invariants of test_schedule_invariants must hold everywhere, and
    on a single device (S=1, strictly sequential) the makespan must be
    exactly the V*M work lower bound."""
    rng = np.random.default_rng(71)
    combos = {(1, 1, 1), (1, 4, 3), (8, 1, 1), (1, 1, 7), (8, 4, 1)}
    while len(combos) < 160:
        combos.add((int(rng.integers(1, 9)), int(rng.integers(1, 5)),
                    int(rng.integers(1, 17))))
    for S, V, M in sorted(combos):
        sched = build_interleaved_schedule(S, V, M)
        trash = V * sched.queue
        np.testing.assert_array_equal(sched.busy, np.full(S, V * M),
                                      err_msg=f"S={S} V={V} M={M}")
        assert sorted(m for m in sched.out_m[:, 0] if m >= 0) == \
            list(range(M)), (S, V, M)
        assert [m for m in sched.inj_m[:, 0] if m >= 0] == list(range(M))
        for s in range(S):
            occupied = np.zeros(trash, bool)
            for t in range(sched.ticks):
                cs = sched.cmp_slot[t, s]
                if cs != trash:
                    assert occupied[cs], (S, V, M, s, t)
                    occupied[cs] = False
                rs = sched.rcv_slot[t, s]
                if rs != trash:
                    assert not occupied[rs], (S, V, M, s, t)
                    occupied[rs] = True
            assert not occupied.any(), (S, V, M, s)
        if S == 1:
            # strictly sequential: no bubble on either schedule
            assert sched.ticks == V * M, (S, V, M, sched.ticks)
        elif V > 1 and M >= S:
            assert sched.ticks < sched.gpipe_chunk_ticks, (S, V, M)
            if M >= S * V:
                # steady-state regime: fill-then-drain keeps the overhead
                # near the ring latency (the Megatron bound assumes
                # microbatches >= pipeline depth; below it the schedule is
                # latency-bound and only the GPipe comparison holds)
                assert sched.ticks <= V * M + S + V, (S, V, M, sched.ticks)


@pytest.mark.parametrize("S,V,M", [(4, 2, 8), (2, 4, 8), (4, 4, 16)])
def test_schedule_beats_gpipe_bubble(S, V, M):
    """The whole point: makespan (in chunk-tick units) strictly below the
    GPipe schedule's V*(M+S-1), and within a small constant of the V*M
    per-device work lower bound."""
    sched = build_interleaved_schedule(S, V, M)
    assert sched.ticks < sched.gpipe_chunk_ticks
    assert sched.ticks >= V * M          # device 0 does V*M chunk computes
    # fill-then-drain keeps the overhead near the S-1 ring latency
    assert sched.ticks <= V * M + S * V


def test_interleaved_stacking_order():
    """stack_trunk_params_interleaved[s, v, c] must be block
    (v*S + s)*Lc + c — logical stages are contiguous block runs assigned
    round-robin over devices."""
    model = _uni3d(8)
    pc = jnp.zeros((1, 64, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    pe = params["params"]["point_encoder"]
    S, V = 2, 2
    Lc = 8 // (S * V)
    stacked = stack_trunk_params_interleaved(pe, 8, S, V)
    k = stacked["attn"]["q_proj"]["kernel"]
    assert k.shape[:3] == (S, V, Lc)
    for s in range(S):
        for v in range(V):
            for c in range(Lc):
                blk = (v * S + s) * Lc + c
                np.testing.assert_array_equal(
                    np.asarray(k[s, v, c]),
                    np.asarray(pe[f"blocks_{blk}"]["attn"]["q_proj"]
                               ["kernel"]))


def test_interleaved_rejects_indivisible_depth():
    mesh = _mesh(2)
    model = _uni3d(6)    # 6 blocks over 2 stages x 2 chunks
    pc = jnp.zeros((1, 64, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    prepare, _ = pp.make_pp_forward_uni3d(model, mesh, interleave=2)
    with pytest.raises(ValueError, match="not divisible"):
        prepare(params)


# ---------------------------------------------------------------------------
# forward equality
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_stages,interleave,depth,n_micro", [
    (2, 2, 8, 2),
    (2, 2, 8, 4),
    (4, 2, 8, 4),    # 8 logical stages on 4 devices, 1 block each
    (2, 4, 8, 4),    # deep interleave
])
def test_interleaved_uni3d_matches_plain_forward(n_stages, interleave,
                                                 depth, n_micro):
    mesh = _mesh(n_stages)
    model = _uni3d(depth)
    rng = np.random.default_rng(41)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=n_micro,
                                            interleave=interleave)
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interleaved_ulip_matches_plain_forward():
    """The extras path through the interleaved ring: pos is re-taken
    locally per tick from the cmp_m table, never rotated."""
    mesh = _mesh(2)
    model = _ulip(8)
    rng = np.random.default_rng(43)
    pc = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_ulip(model, mesh, n_micro=2,
                                           interleave=2)
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rel_pe", [False, True])
def test_interleaved_openshape_matches_plain_forward(rel_pe):
    from uni_adapter_tpu.models.ppta import PPTAPreset, Projected

    mesh = _mesh(2)
    preset = PPTAPreset(dim=48, depth=4, heads=4, mlp_dim=96, sa_dim=24,
                        patches=16, prad=0.4, nsamp=8)
    model = Projected(preset=preset, out_channel=32, rel_pe=rel_pe,
                      dtype=jnp.float32)
    rng = np.random.default_rng(47)
    xyz = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    features = jnp.concatenate([xyz, jnp.ones_like(xyz)], axis=-1)
    params = model.init(jax.random.PRNGKey(0), xyz, features)
    want = np.asarray(jax.jit(model.apply)(params, xyz, features))

    prepare, fwd = pp.make_pp_forward_openshape(model, mesh, n_micro=2,
                                                interleave=2)
    got = np.asarray(fwd(prepare(params), xyz, features))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interleaved_dp_composition_matches_plain_forward():
    """Interleaved PP × DP on a (stage, data) mesh."""
    mesh = _mesh(8, axes=("stage", "data"))
    model = _uni3d(8)
    rng = np.random.default_rng(53)
    pc = jnp.asarray(rng.standard_normal((8, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2,
                                            data_axis="data", interleave=2)
    got = np.asarray(fwd(prepare(params), pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interleaved_tp_composition_matches_plain_forward():
    """Interleaved PP × TP on a (stage, model) mesh: the (S, V, Lc, ...)
    stacks carry Megatron shardings shifted by THREE leading axes."""
    mesh = _mesh(4, axes=("stage", "model"))
    model = _uni3d(8)
    rng = np.random.default_rng(59)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2,
                                            tp_axis="model", interleave=2)
    pp_params = prepare(params)
    qk = pp_params[0]["attn"]["q_proj"]["kernel"]
    assert "model" in str(qk.sharding.spec)
    got = np.asarray(fwd(pp_params, pc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# training through the interleaved schedule
# ---------------------------------------------------------------------------

def test_interleaved_grad_matches_plain_forward():
    """jax.grad through the interleaved tick scan equals the plain
    forward's gradients — the scheduled ring transposes correctly."""
    mesh = _mesh(2)
    model = _uni3d(4)
    S, V, Lc = 2, 2, 1
    rng = np.random.default_rng(61)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    ct = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    want = jax.grad(lambda p: jnp.sum(model.apply(p, pc) * ct))(params)
    want_pe = want["params"]["point_encoder"]

    prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2,
                                            interleave=V)
    got_stacked, got_rest = jax.grad(
        lambda pp_p: jnp.sum(fwd(pp_p, pc) * ct))(prepare(params))

    for s in range(S):
        for v in range(V):
            for c in range(Lc):
                blk = (v * S + s) * Lc + c
                got_b = jax.tree.map(lambda a: np.asarray(a[s, v, c]),
                                     got_stacked)
                jax.tree.map(
                    lambda g, w: np.testing.assert_allclose(
                        g, np.asarray(w), rtol=1e-4, atol=1e-5),
                    got_b, want_pe[f"blocks_{blk}"])
    for key in got_rest:
        jax.tree.map(
            lambda g, w: np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-5),
            got_rest[key], want_pe[key])


def test_interleaved_train_step_matches_single_device():
    """One interleaved-PP train step == one single-device train step
    (SGD, for the same conditioning reasons as the GPipe twin test)."""
    import optax

    from uni_adapter_tpu import train as tr

    mesh = _mesh(2)
    model = _uni3d(4)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-2))
    rng = np.random.default_rng(67)
    pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)

    state0 = tr.init_train_state(model, jax.random.PRNGKey(0), pc, tx)
    state1, metrics1 = tr.train_step(model, tx, state0, pc, text, image)

    prepare, step = pp.make_pp_train_step_uni3d(model, tx, mesh, n_micro=2,
                                                interleave=2)
    pstate0 = pp.init_pp_train_state(model, jax.random.PRNGKey(0), pc, tx,
                                     prepare)
    pstate1, pmetrics = step(pstate0, pc, text, image)

    np.testing.assert_allclose(float(pmetrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-5)
    upd_pe = state1.params["point_encoder"]
    got_stacked, _ = pstate1.params
    for s in range(2):
        for v in range(2):
            blk = v * 2 + s
            got_b = jax.tree.map(lambda a: np.asarray(a[s, v, 0]),
                                 got_stacked)
            jax.tree.map(
                lambda g, w: np.testing.assert_allclose(
                    g, np.asarray(w), rtol=1e-4, atol=1e-6),
                got_b, upd_pe[f"blocks_{blk}"])


def test_interleaved_engine_step_trajectory_matches():
    """The full MODE-DOTA adaptation scan with the trunk as an INTERLEAVED
    pipeline (engine encode_fn injection) reproduces the replicated
    trajectory — mirrors test_pp.py's GPipe twin."""
    from uni_adapter_tpu import engine
    from uni_adapter_tpu.config import (CacheConfig, Config, DotaConfig,
                                        ModelConfig)

    mesh = _mesh(2)
    model = _uni3d(4)
    K, N, T = 5, 64, 4
    rng = np.random.default_rng(73)
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

    prepare, encode = pp.make_pp_encode_fn(model, mesh, "uni3d",
                                           interleave=2)
    scan_pp = jax.jit(engine.make_scan_fn(cfg, model, encode_fn=encode))
    _, outs_pp = scan_pp(prepare(params), text, state0, pcs, rgbs, tgts)

    np.testing.assert_allclose(np.asarray(outs_pp.final_logits),
                               np.asarray(outs_rep.final_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(outs_pp.correct),
                                  np.asarray(outs_rep.correct))


# ---------------------------------------------------------------------------
# toy-executor equality sweep (configs no model test compiles)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("S,V,M,Lc", [
    (1, 1, 1, 1),    # degenerate: strictly sequential
    (2, 2, 3, 1),    # M not a multiple of S
    (2, 4, 8, 1),    # deep interleave
    (4, 2, 5, 2),    # multi-block chunks, M < S*V
    (8, 1, 4, 1),    # V=1 (pure ring) on the full mesh
])
def test_toy_executor_equality_with_extras(S, V, M, Lc):
    """Both ring executors on a toy affine block with per-microbatch
    extras (y = x @ W_l + e_m) must equal plain sequential application.
    The toy block makes the sweep cheap, so it covers schedule shapes
    (M % S != 0, M < pipeline depth, V=1) the flax-model tests don't."""
    from jax.sharding import PartitionSpec as P
    from uni_adapter_tpu.parallel.pp import _pipeline
    from uni_adapter_tpu.parallel.pp_interleave import pipeline_interleaved

    mesh = _mesh(S)
    d, Bm = 8, 2
    depth = S * V * Lc
    rng = np.random.default_rng(10_000 * S + 100 * V + 10 * M + Lc)
    W = (np.eye(d)[None] + 0.05 * rng.standard_normal((depth, d, d))
         ).astype(np.float32)
    xs = rng.standard_normal((M, Bm, d)).astype(np.float32)
    ex = rng.standard_normal((M, Bm, d)).astype(np.float32)

    # ground truth: logical blocks 0..depth-1 in order, per microbatch
    want = np.empty_like(xs)
    for m in range(M):
        h = jnp.asarray(xs[m])
        for l in range(depth):
            h = h @ jnp.asarray(W[l]) + jnp.asarray(ex[m])
        want[m] = np.asarray(h)

    def block_fn(p, c, e):
        return c @ p + e

    # interleaved executor: stacked [s, v, c] = block (v*S + s)*Lc + c
    sched = build_interleaved_schedule(S, V, M)
    stacked_il = jnp.asarray(
        W.reshape(V, S, Lc, d, d).swapaxes(0, 1))

    def body_il(local, mc, me):
        return pipeline_interleaved(block_fn, local[0], mc, sched, "stage",
                                    micro_extras=me)

    got_il = jax.shard_map(
        body_il, mesh=mesh, in_specs=(P("stage"), P(), P()),
        out_specs=P(), check_vma=False)(
        stacked_il, jnp.asarray(xs), jnp.asarray(ex))
    np.testing.assert_allclose(np.asarray(got_il), want,
                               rtol=1e-5, atol=1e-5)

    # GPipe executor: stacked [s, c] = block s*(depth/S) + c
    stacked_g = jnp.asarray(W.reshape(S, depth // S, d, d))

    def body_g(local, mc, me):
        return _pipeline(block_fn, local[0], mc, S, "stage",
                         micro_extras=me)

    got_g = jax.shard_map(
        body_g, mesh=mesh, in_specs=(P("stage"), P(), P()),
        out_specs=P(), check_vma=False)(
        stacked_g, jnp.asarray(xs), jnp.asarray(ex))
    np.testing.assert_allclose(np.asarray(got_g), want,
                               rtol=1e-5, atol=1e-5)
