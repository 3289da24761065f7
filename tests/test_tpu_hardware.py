"""On-hardware validation of the Pallas kernels and the kernel-enabled
engine trajectories — REAL TPU lowering, not interpret mode.

The committed CPU suite exercises every kernel in interpret mode
(test_knn_pallas.py etc.); this file is the repeatable hardware-correctness
artifact (the role the CUDA kernel plays in the reference at
models/point_encoder.py:12-13).  Run it alone on the TPU host:

    UNI_ADAPTER_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 1800 python -m pytest tests/test_tpu_hardware.py -q

Under the default CPU suite every test here skips (conftest pins the
virtual CPU mesh unless UNI_ADAPTER_TPU_TESTS=1).  Expect multi-minute
runtimes: each engine-trajectory case compiles a full-size encoder twice
(kernels on / off) — full dims are deliberate, tiny point-transformer
configs trip a known XLA TPU fusion-pass CHECK (see BASELINE.md 04:17).

Measured contracts these tests pin (BASELINE.md round-2, 23:00):
  * FPS / ball-query: index-exact vs the XLA twins on hardware;
  * kNN: identical neighbour sets, except at fp32 rounding-degenerate
    k-th boundaries where the two paths' distance computations may order a
    near-tied pair differently — such swaps must be fp64-distance-justified
    (see test_knn_kernel_matches_xla_on_hw);
  * fused attention: fp32-softmax kernel vs fp32 XLA reference within
    bf16 input-rounding tolerance;
  * engine trajectories (12 TTA steps, batch 2): identical correctness
    vectors and 100 % prediction agreement with the index-exact kernels
    (FPS/kNN/ball-query) on vs off.  The attention kernel is deliberately
    OFF here: its fp32 softmax is a legitimate numerics difference vs the
    bf16-storage XLA path, and chaotic TTA state amplifies it on
    random-weight degenerate margins (BASELINE.md 23:00) — its correctness
    is pinned by the direct tolerance test above instead.

Tunnel flakiness note (2026-08-17): identical comparisons that fail inside
a long multi-test process have repeatedly passed standalone (12/12 clean
repetitions of the exact failing seed).  The twin comparisons therefore
recompute both sides once on mismatch before failing — a transient
transfer corruption does not repeat, a real kernel bug does.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import Config, DotaConfig, ModelConfig
from uni_adapter_tpu.ops import geometry as G
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads
from uni_adapter_tpu.ops.ballquery_pallas import query_ball_pallas
from uni_adapter_tpu.ops.fps_pallas import fps_pallas, fps_pallas_batched
from uni_adapter_tpu.ops.knn_pallas import knn_pallas

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"),
    reason="requires a TPU backend (run with UNI_ADAPTER_TPU_TESTS=1 on "
           "the TPU host)")


def _rand(shape, seed=0, dtype=np.float32):
    return np.random.default_rng(seed).standard_normal(shape).astype(dtype)


def _assert_twins_equal(compute_want, compute_got):
    """Equality with one retry AFTER clearing the jit cache.  Observed
    failure mode on the tunneled device: a compiled-program upload that
    lands during heavy tunnel traffic is corrupted, so every execution of
    that cached program is wrong while a fresh compile is clean (the same
    comparison passes 12/12 standalone).  Re-executing the cached program
    cannot recover that — the retry recompiles both sides.  A real kernel
    divergence survives the recompile and still fails."""
    want, got = np.asarray(compute_want()), np.asarray(compute_got())
    if np.array_equal(want, got):
        return
    jax.clear_caches()
    want2, got2 = np.asarray(compute_want()), np.asarray(compute_got())
    np.testing.assert_array_equal(got2, want2)


def test_fps_kernels_match_xla_on_hw():
    xyz = jnp.asarray(_rand((30, 1024, 3), seed=1))
    _assert_twins_equal(lambda: G.farthest_point_sample(xyz, 512),
                        lambda: fps_pallas(xyz, 512))
    _assert_twins_equal(lambda: G.farthest_point_sample(xyz, 512),
                        lambda: fps_pallas_batched(xyz, 512))


@pytest.mark.parametrize("B,S,N,k", [(30, 512, 1024, 32),   # ULIP shape
                                     (30, 512, 1024, 64),   # Uni3D shape
                                     (2, 100, 1000, 16)])   # odd shapes
def test_knn_kernel_matches_xla_on_hw(B, S, N, k):
    xyz = jnp.asarray(_rand((B, N, 3), seed=B + k))
    q = jnp.asarray(_rand((B, S, 3), seed=B + k + 1))
    want = np.sort(np.asarray(G.knn_point(k, xyz, q)), axis=-1)
    got = np.sort(np.asarray(knn_pallas(k, xyz, q)), axis=-1)
    if np.array_equal(want, got):
        return
    # Neighbour sets may legitimately differ where the k-th boundary is a
    # rounding-level tie: the two paths compute fp32 distances in different
    # orders (XLA's |x|²+|q|²−2x·q expansion vs the kernel's MXU form), so
    # candidates whose true distances differ by ≲1 ulp of the boundary can
    # swap.  Observed live at (30,512,1024,64): 1 row of 15360, candidate
    # fp64 distances 0.642008943 vs 0.642009657 — the kernel's pick was the
    # genuinely closer point.  Assert every swapped pair is such a
    # boundary tie in fp64 (a real selection bug yields far-apart swaps).
    xyz_np = np.asarray(xyz, np.float64)
    q_np = np.asarray(q, np.float64)
    rows = np.argwhere((want != got).any(-1))
    assert len(rows) <= max(1, B * S // 1000), (
        f"{len(rows)} mismatching rows — beyond rounding-tie territory")
    for b, s in rows:
        only_w = sorted(set(want[b, s]) - set(got[b, s]))
        only_g = sorted(set(got[b, s]) - set(want[b, s]))
        d = ((xyz_np[b] - q_np[b, s]) ** 2).sum(-1)
        kth = np.sort(d)[k - 1]
        for i in only_w + only_g:
            np.testing.assert_allclose(d[i], kth, rtol=1e-5)


@pytest.mark.parametrize("B,S,N,k", [(30, 512, 1024, 32),   # ULIP shape
                                     (30, 512, 1024, 64)])  # Uni3D shape
def test_knn_gather_kernel_on_hw(B, S, N, k):
    """Real-lowering coverage for the fused kNN+gather kernel (opt-in in
    the configs, but its Mosaic lowering — strided rank-4 writes, k-scaled
    VMEM tiling — must be validated on hardware like the other kernels).
    The gather contract is exact against the kernel's OWN indices; the
    selection contract is the same tie-aware set check as the kNN test."""
    from uni_adapter_tpu.ops.knn_pallas import knn_gather_pallas

    xyz = jnp.asarray(_rand((B, N, 3), seed=B + k))
    q = jnp.asarray(_rand((B, S, 3), seed=B + k + 1))
    vals = jnp.asarray(_rand((B, N, 6), seed=B + k + 2))
    idx, gathered = knn_gather_pallas(k, xyz, q, vals)
    idx_np = np.asarray(idx)
    # gather is exact w.r.t. the selected indices
    want_g = np.take_along_axis(np.asarray(vals)[:, None],
                                idx_np[..., None].repeat(6, -1), axis=2)
    np.testing.assert_array_equal(np.asarray(gathered), want_g)
    # selection: identical sets vs the XLA twin, modulo fp32
    # rounding-degenerate k-th boundaries (see the kNN test above)
    want = np.sort(np.asarray(G.knn_point(k, xyz, q)), axis=-1)
    got = np.sort(idx_np, axis=-1)
    if np.array_equal(want, got):
        return
    xyz64, q64 = np.asarray(xyz, np.float64), np.asarray(q, np.float64)
    rows = np.argwhere((want != got).any(-1))
    assert len(rows) <= max(1, B * S // 1000)
    for b, s in rows:
        only = (sorted(set(want[b, s]) - set(got[b, s]))
                + sorted(set(got[b, s]) - set(want[b, s])))
        d = ((xyz64[b] - q64[b, s]) ** 2).sum(-1)
        kth = np.sort(d)[k - 1]
        for i in only:
            np.testing.assert_allclose(d[i], kth, rtol=1e-5)


@pytest.mark.parametrize("B,S,N,k,r", [(60, 384, 1024, 64, 0.2),  # OpenShape
                                       (2, 100, 1000, 32, 0.3)])
def test_ballquery_kernel_matches_xla_on_hw(B, S, N, k, r):
    rng = np.random.default_rng(B + k)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (B, S, 3)).astype(np.float32))
    _assert_twins_equal(lambda: G.query_ball_point(r, k, xyz, q),
                        lambda: query_ball_pallas(r, k, xyz, q))


@pytest.mark.parametrize("B,H,Nt,hd", [(2, 6, 513, 64),    # ULIP
                                       (2, 16, 513, 64)])  # EVA02-L
def test_attention_kernel_close_to_fp32_on_hw(B, H, Nt, hd):
    q32 = jnp.asarray(_rand((B, H, Nt, hd), seed=3))
    k32 = jnp.asarray(_rand((B, H, Nt, hd), seed=4))
    v32 = jnp.asarray(_rand((B, H, Nt, hd), seed=5))
    scale = hd ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q32, k32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    want = np.asarray(jnp.einsum("bhqk,bhkd->bhqd",
                                 jax.nn.softmax(s, axis=-1), v32,
                                 precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(attention_pallas_heads(
        q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16))).astype(np.float32)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)


def _run_engine(backbone, pallas):
    """12-step MODE-DOTA trajectory, full-size encoder, random weights."""
    cfg = Config(model=ModelConfig(
        vlm3d=backbone, use_pallas_fps=pallas, use_pallas_knn=pallas,
        use_pallas_ballq=pallas,
        # index-exact kernels only — see module docstring for why the
        # attention kernel is excluded from trajectory equality
        use_pallas_attention=False),
        dota=DotaConfig(use_mode_dota=True, mode_M=4, res_learning=True))
    rng = np.random.default_rng(0)
    if backbone == "ulip":
        from uni_adapter_tpu.models.pointbert import create_ulip
        model, D = create_ulip(cfg.model), 512
        init_args = (jnp.zeros((1, 1024, 3), jnp.float32),)
    elif backbone == "openshape":
        from uni_adapter_tpu.models.ppta import create_openshape
        model, D = create_openshape(cfg.model), 1280
        init_args = (jnp.zeros((1, 1024, 3), jnp.float32),
                     jnp.zeros((1, 1024, 6), jnp.float32))
    else:
        from uni_adapter_tpu.models.uni3d import create_uni3d
        model, D = create_uni3d(cfg.model), 1024
        init_args = (jnp.zeros((1, 1024, 6), jnp.float32),)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    t = rng.standard_normal((40, D)).astype(np.float32)
    text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))
    T = 12
    pcs = jnp.asarray(rng.standard_normal((T, 2, 1024, 3)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 40, (T, 2)), jnp.int32)
    scan_fn = jax.jit(engine.make_scan_fn(cfg, model))
    state = engine.init_state(cfg, text, jax.random.PRNGKey(0))
    _, out = scan_fn(params, text, state, pcs, jnp.ones_like(pcs), tgt)
    return np.asarray(out.final_logits), np.asarray(out.correct)


@pytest.mark.parametrize("backbone", ["uni3d", "ulip", "openshape"])
def test_engine_trajectory_kernels_on_vs_off_on_hw(backbone):
    logits_p, correct_p = _run_engine(backbone, True)
    logits_x, correct_x = _run_engine(backbone, False)
    np.testing.assert_array_equal(correct_p, correct_x)
    pred_agreement = (logits_p.argmax(-1) == logits_x.argmax(-1)).mean()
    assert pred_agreement == 1.0


def test_adaptive_split_scatter_matches_cpu_on_hw():
    """check_and_split's vectorised split protocol (cumsum ranks,
    reverse-execution child placement, out-of-bounds `mode='drop'`
    scatters) on real TPU lowering vs the CPU backend, element-exact.

    One state exercises every regime of the reference protocol
    (dota_mixture_adaptive.py:173-260, slot-exact per
    tests/test_reference_import_oracle.py): a single-mode split, a
    multi-split class (reverse-order child placement), a capacity-capped
    class (two eligible, room for one — ascending-index selection), a full
    class, and two ineligible classes (below threshold / below min count).
    All arithmetic is elementwise fp32 (add/mul/sqrt), so TPU and CPU must
    agree bitwise."""
    from uni_adapter_tpu.adapt import adaptive

    K_, M_, D_ = 6, 4, 16
    rng = np.random.default_rng(7)
    mu = rng.standard_normal((K_, M_, D_)).astype(np.float32)
    var = np.full((K_, M_, D_), 1e10, np.float32)
    pi = np.zeros((K_, M_), np.float32)
    c = np.zeros((K_, M_), np.float32)
    mask = np.zeros((K_, M_), bool)

    def activate(k, modes, var_scale, count):
        for j, (vs, ct) in enumerate(zip(var_scale, count)):
            mask[k, j] = True
            var[k, j] = np.abs(rng.standard_normal(D_)).astype(np.float32) \
                * 0.01
            var[k, j, rng.integers(0, D_)] = vs
            c[k, j] = ct
        pi[k, :modes] = 1.0 / modes

    threshold, min_count = 0.05, 5.0
    activate(0, 1, [0.2], [9.0])                 # 1 mode, splits → 2
    activate(1, 2, [0.3, 0.4], [8.0, 7.0])       # both split → 4 (reversed)
    activate(2, 3, [0.25, 0.01, 0.35], [6.0, 6.0, 6.0])  # cap 1: idx 0 wins
    activate(3, 4, [0.5, 0.5, 0.5, 0.5], [9.0] * 4)      # full: no split
    activate(4, 1, [0.01], [9.0])                # below threshold
    activate(5, 1, [0.6], [2.0])                 # below min count

    state = adaptive.AdaptiveState(
        mu=jnp.asarray(mu), var=jnp.asarray(var), pi=jnp.asarray(pi),
        c=jnp.asarray(c), mask=jnp.asarray(mask),
        class_counts=jnp.zeros((K_,), jnp.float32),
        t=jnp.zeros((), jnp.int32), fit_calls=jnp.zeros((), jnp.int32))

    fn = jax.jit(lambda s: adaptive.check_and_split(
        s, split_threshold=threshold, min_count_to_split=min_count))

    def on_tpu():
        return fn(state)

    def on_cpu():
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return jax.jit(lambda s: adaptive.check_and_split(
                s, split_threshold=threshold,
                min_count_to_split=min_count))(jax.device_put(state, cpu))

    n_got = np.asarray(adaptive.num_modes_per_class(on_tpu()))
    assert list(n_got) == [2, 4, 4, 4, 1, 1]
    for name in ("mu", "var", "pi", "c", "mask"):
        # closures recompute both sides, so the corrupted-program-upload
        # retry inside _assert_twins_equal genuinely recompiles
        _assert_twins_equal(lambda f=name: getattr(on_cpu(), f),
                            lambda f=name: getattr(on_tpu(), f))


def test_efficacy_holds_on_hw():
    """The adaptation-efficacy north star on REAL TPU lowering: the same
    calibrated structured stream the CPU efficacy tests pin
    (uni_adapter_tpu/data/synthetic_stream.py) must show the same gains
    through the on-device scan — MODE-DOTA ≥ +3, cache ≥ +5 over pure
    zero-shot (CPU-measured +12.1 / +7.7 on this seed).  Guards against a
    TPU-lowering numerics regression silently eroding the method's
    accuracy value while all throughput metrics stay green."""
    from uni_adapter_tpu.data.synthetic_stream import (
        make_problem, run_adapter, zero_shot_acc)

    pcs, targets, text, W = make_problem(17)
    zs = zero_shot_acc(pcs, targets, text, W)
    assert 60.0 < zs < 90.0, f"stream mis-calibrated: zs={zs}"
    mode_acc, _ = run_adapter("mode", text, pcs, targets, W)
    cache_acc, _ = run_adapter("cache", text, pcs, targets, W)
    assert mode_acc >= zs + 3.0, (mode_acc, zs)
    assert cache_acc >= zs + 5.0, (cache_acc, zs)


def test_ep_runs_on_hw():
    """Class-sharded (EP) evaluation on REAL TPU lowering: the shard_map'd
    MODE-DOTA step — class-block all_gathers, the psum'd fusion weight,
    and the sharded residual loop's gather/reduce_scatter gradients — must
    compile and match the replicated on-device run on a 1-device class
    mesh (the only width this host has; multi-device EP semantics are
    pinned on the virtual 8-CPU mesh, tests/test_ep*.py).  Full-size
    encoder deliberately: tiny configs trip the known fusion-pass CHECK
    (module docstring) — that crash reproduces on a PLAIN B=2 jit forward
    at toy dims, so it is the documented toolchain issue, not EP
    (bisected 2026-08-20, BASELINE.md)."""
    from uni_adapter_tpu.models.uni3d import create_uni3d
    from uni_adapter_tpu.parallel import ep

    cfg = Config(model=ModelConfig(vlm3d="uni3d"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=4,
                                 res_learning=True, residual_steps=2))
    rng = np.random.default_rng(3)
    model, D = create_uni3d(cfg.model), 1024
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1024, 6), jnp.float32))
    t = rng.standard_normal((40, D)).astype(np.float32)
    text = t / np.linalg.norm(t, axis=1, keepdims=True)
    T = 4
    pcs = rng.standard_normal((T, 1, 1024, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    tgt = rng.integers(0, 40, (T, 1)).astype(np.int32)

    state_ep, summary = ep.run_stream_ep(
        cfg, model, params, text, pcs, rgbs, tgt,
        mesh=ep.make_classes_mesh(1))
    assert summary["n_class_shards"] == 1

    scan_fn = jax.jit(engine.make_scan_fn(cfg, model))
    state0 = engine.init_state(cfg, jnp.asarray(text),
                               jax.random.PRNGKey(42))
    want_state, out = scan_fn(params, jnp.asarray(text), state0,
                              jnp.asarray(pcs), jnp.asarray(rgbs),
                              jnp.asarray(tgt))
    want_c = np.asarray(jnp.sum(out.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)
    np.testing.assert_allclose(np.asarray(state_ep.method_state.mu),
                               np.asarray(want_state.method_state.mu),
                               rtol=1e-3, atol=1e-4)
    assert np.isfinite(np.asarray(state_ep.res_state.residuals)).all()


def test_eva_fused_attention_kernel_on_hw():
    """Round-5 natural-layout fused EVA attention (in-kernel per-head LN +
    lane-sliced heads, ops/attention_pallas.eva_attention_fused) on real
    lowering at the bench shape, vs the fp32 XLA reference."""
    from uni_adapter_tpu.ops.attention_pallas import eva_attention_fused

    B, N, D, H = 4, 513, 1024, 16
    hd = D // H
    q32 = jnp.asarray(_rand((B, N, D), seed=6))
    k32 = jnp.asarray(_rand((B, N, D), seed=7))
    v32 = jnp.asarray(_rand((B, N, D), seed=8))
    gq = jnp.asarray(_rand((hd,), seed=9) * 0.1 + 1.0)
    bq = jnp.asarray(_rand((hd,), seed=10) * 0.1)
    gk = jnp.asarray(_rand((hd,), seed=11) * 0.1 + 1.0)
    bk = jnp.asarray(_rand((hd,), seed=12) * 0.1)
    scale = hd ** -0.5

    def ln(x, g, b):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    qh = ln(jnp.transpose(q32.reshape(B, N, H, hd), (0, 2, 1, 3)), gq, bq)
    kh = ln(jnp.transpose(k32.reshape(B, N, H, hd), (0, 2, 1, 3)), gk, bk)
    vh = jnp.transpose(v32.reshape(B, N, H, hd), (0, 2, 1, 3))
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   precision=jax.lax.Precision.HIGHEST) * scale
    want = np.asarray(jnp.transpose(
        jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), vh,
                   precision=jax.lax.Precision.HIGHEST),
        (0, 2, 1, 3)).reshape(B, N, D))
    got = np.asarray(eva_attention_fused(
        q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16), gq, bq, gk, bk, num_heads=H,
        scale=scale)).astype(np.float32)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)


def test_eva_block_kernel_on_hw():
    """Round-5 cont. whole-span kernel (eva_attn_block_fused: q/k/v/out
    projections + per-head LN + attention in one pallas call) on real
    lowering at the bench shape, vs the flax EvaAttention module fed the
    SAME params.  Trunk-8 A/B measured 41.96 -> 29.19 ms (-30%/block)."""
    from uni_adapter_tpu.models.common import EvaAttention
    from uni_adapter_tpu.ops.attention_pallas import eva_attn_block_fused

    B, N, D, H = 4, 513, 1024, 16
    x = jnp.asarray(_rand((B, N, D), seed=13)).astype(jnp.bfloat16)
    mod = EvaAttention(D, H)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    want = np.asarray(mod.apply(params, x), np.float32)
    pp = params["params"]
    got = np.asarray(eva_attn_block_fused(
        x, pp["q_proj"]["kernel"], pp["q_proj"]["bias"],
        pp["k_proj"]["kernel"], pp["v_proj"]["kernel"],
        pp["v_proj"]["bias"], pp["q_norm"]["scale"], pp["q_norm"]["bias"],
        pp["k_norm"]["scale"], pp["k_norm"]["bias"],
        pp["proj"]["kernel"], pp["proj"]["bias"], num_heads=H), np.float32)
    assert np.isfinite(got).all()
    # both sides are bf16 pipelines differing only in rounding points
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
