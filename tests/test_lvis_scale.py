"""Large-label-space (Objaverse-LVIS, K=1156) scaling coverage.

VERDICT r1 weak #4 / missing #5: the dense cache graph cannot scale past
~100 classes (N = K·shot_capacity nodes, per-step N²·D adjacency build).
These tests cover the scalable class-prototype graph mode at the real LVIS
K, plus a synthetic K=1156 stream through ALL five adaptation methods
(engine plumbing: anchors → logits → fit → fusion at scale).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.adapt import cache as cache_mod
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D

K_LVIS = 1156


def _filled_cache(K, C, D, n_classes_filled, rng):
    """Cache with n_classes_filled classes holding C valid shots each."""
    state = cache_mod.init(K, C, D)
    feats = rng.standard_normal((K, C, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    valid = np.zeros((K, C), bool)
    valid[:n_classes_filled] = True
    probs = np.zeros((K, C, K), np.float32)
    for k in range(n_classes_filled):
        probs[k, :, k] = 0.8
        probs[k, :, (k + 1) % K] = 0.2
    return cache_mod.CacheState(
        feats=jnp.asarray(feats), conf=jnp.asarray(valid * 0.9, jnp.float32),
        probs=jnp.asarray(probs), counts=jnp.asarray(valid, jnp.float32),
        valid=jnp.asarray(valid))


def test_prototype_graph_runs_at_lvis_scale():
    """K=1156 × shot 30: prototype mode computes logits in (K,·) memory —
    the dense mode's 34,680² adjacency (4.8 GB + PFLOPs) never exists."""
    rng = np.random.default_rng(0)
    D = 64
    state = _filled_cache(K_LVIS, 30, D, n_classes_filled=50, rng=rng)
    q = jnp.asarray(rng.standard_normal((1, D)), jnp.float32)
    logits = np.asarray(cache_mod.compute_cache_logits(
        q, state, threshold=0.5, lambda_reg=0.11, cg_max_iter=20,
        graph_mode="prototype"))
    assert logits.shape == (1, K_LVIS)
    assert np.isfinite(logits).all()
    # empty classes receive no mass: refined labels stay within the filled
    # classes, so their logit columns are exactly zero
    assert (logits[:, 50:] == 0.0).all()
    # a query equal to class 3's prototype scores class 3 highest
    proto3 = np.asarray(state.feats[3]).mean(axis=0)
    proto3 /= np.linalg.norm(proto3)
    l3 = np.asarray(cache_mod.compute_cache_logits(
        jnp.asarray(proto3[None]), state, 0.5, 0.11, cg_max_iter=20,
        graph_mode="prototype"))
    assert l3[0].argmax() == 3


def test_prototype_graph_small_k_agrees_with_dense_labels():
    """With well-separated classes both graphs refine to the same labels, so
    the two modes' argmax logits agree (values differ — different node
    granularity)."""
    rng = np.random.default_rng(1)
    K, C, D = 8, 4, 32
    base = rng.standard_normal((K, D)).astype(np.float32) * 4.0
    feats = base[:, None, :] + 0.05 * rng.standard_normal((K, C, D))
    feats = (feats / np.linalg.norm(feats, axis=-1, keepdims=True))
    probs = np.zeros((K, C, K), np.float32)
    for k in range(K):
        probs[k, :, k] = 1.0
    state = cache_mod.CacheState(
        feats=jnp.asarray(feats, jnp.float32),
        conf=jnp.full((K, C), 0.9, jnp.float32),
        probs=jnp.asarray(probs),
        counts=jnp.ones((K, C), jnp.float32),
        valid=jnp.ones((K, C), bool))
    q = jnp.asarray(feats[:, 0, :], jnp.float32)       # one query per class
    dense = np.asarray(cache_mod.compute_cache_logits(
        q, state, 0.5, 0.11, cg_max_iter=50, graph_mode="dense"))
    proto = np.asarray(cache_mod.compute_cache_logits(
        q, state, 0.5, 0.11, cg_max_iter=50, graph_mode="prototype"))
    np.testing.assert_array_equal(dense.argmax(axis=1), proto.argmax(axis=1))
    np.testing.assert_array_equal(proto.argmax(axis=1), np.arange(K))


@pytest.mark.parametrize("method", ["dota", "mode", "gmm", "adaptive",
                                    "cache"])
def test_all_methods_run_at_k1156(method):
    """Synthetic K=1156 stream through every adaptation method (VERDICT r1
    next-step #10): anchors, engine carry, fit, fusion all shape-correct at
    LVIS label-space scale."""
    dc = {
        "dota": DotaConfig(use_dota=True, use_mode_dota=False),
        "mode": DotaConfig(use_mode_dota=True, mode_M=2, res_learning=True,
                           residual_steps=1),
        "gmm": DotaConfig(use_mode_dota=False, use_gmm_dota=True, mode_M=2),
        "adaptive": DotaConfig(use_mode_dota=False, use_adaptive_dota=True,
                               mode_M=2),
        "cache": DotaConfig(use_dota=False, use_mode_dota=False),
    }[method]
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(shot_capacity=2, cg_max_iter=5,
                                   graph_mode="prototype"))
    D, N, T = 48, 32, 3
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 6)))
    text = rng.standard_normal((K_LVIS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = jnp.asarray(rng.standard_normal((T, 1, N, 3)), jnp.float32)
    tgts = jnp.asarray(rng.integers(0, K_LVIS, (T, 1)), jnp.int32)
    _, outs = engine.run_stream_scan(cfg, model, params, jnp.asarray(text),
                                     pcs, jnp.ones_like(pcs), tgts)
    logits = np.asarray(outs.final_logits)
    assert logits.shape == (T, 1, K_LVIS)
    assert np.isfinite(logits).all()


def test_graph_mode_auto_resolution():
    """'auto' == dense at benchmark scale; == prototype at LVIS scale
    (the Config default must not OOM at K=1156)."""
    from uni_adapter_tpu.adapt.cache import CacheState, compute_cache_logits
    from uni_adapter_tpu.adapt.cache import init as init_cache
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    K, C, D = 12, 4, 16
    state = init_cache(K, C, D)
    feats = rng.standard_normal((K, C, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    state = state._replace(
        feats=jnp.asarray(feats),
        probs=jnp.asarray(rng.dirichlet(np.ones(K), (K, C)).astype(np.float32)),
        valid=jnp.ones((K, C), bool),
        conf=jnp.asarray(rng.uniform(0.1, 1.0, (K, C)).astype(np.float32)))
    q = jnp.asarray(rng.standard_normal((2, D)).astype(np.float32))
    dense = np.asarray(compute_cache_logits(q, state, 0.5, 0.11,
                                            cg_max_iter=25,
                                            graph_mode="dense"))
    auto = np.asarray(compute_cache_logits(q, state, 0.5, 0.11,
                                           cg_max_iter=25,
                                           graph_mode="auto"))
    np.testing.assert_array_equal(dense, auto)   # K·C=48 ≤ 4096 ⇒ dense

    K2 = 1156
    s2 = init_cache(K2, 4, D)
    proto = np.asarray(compute_cache_logits(q, s2, 0.5, 0.11,
                                            cg_max_iter=5,
                                            graph_mode="prototype"))
    auto2 = np.asarray(compute_cache_logits(q, s2, 0.5, 0.11,
                                            cg_max_iter=5,
                                            graph_mode="auto"))
    np.testing.assert_array_equal(proto, auto2)  # K·C=4624 > 4096 ⇒ proto


def test_prototype_graph_conf_underflow_fallback():
    """Classes whose confidences are exactly zero (fp32 underflow) OR
    tiny-but-nonzero must still produce a meaningful prototype — a query
    aligned with that class's shots must be classified as that class
    (cache.py _prototype_graph_logits weight normalisation + fallback)."""
    from uni_adapter_tpu.adapt.cache import compute_cache_logits
    from uni_adapter_tpu.adapt.cache import init as init_cache
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    K, C, D = 6, 3, 32
    # clustered shots per class: base direction + small noise
    base = rng.standard_normal((K, 1, D)).astype(np.float32)
    feats = base + 0.05 * rng.standard_normal((K, C, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    # each class's shots believe in their own class
    probs = np.full((K, C, K), 0.01, np.float32)
    for k in range(K):
        probs[k, :, k] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    conf = rng.uniform(0.1, 1.0, (K, C)).astype(np.float32)
    conf[2] = 0.0       # class 2: all confidences underflowed to zero
    conf[3] = 1e-26     # class 3: tiny-but-nonzero (subnormal band)
    state = init_cache(K, C, D)._replace(
        feats=jnp.asarray(feats), probs=jnp.asarray(probs),
        valid=jnp.ones((K, C), bool), conf=jnp.asarray(conf))
    for cls in (2, 3):
        q = jnp.asarray(feats[cls, 0][None])   # one of the class's shots
        logits = np.asarray(compute_cache_logits(q, state, 0.5, 0.11,
                                                 cg_max_iter=10,
                                                 graph_mode="prototype"))
        assert np.all(np.isfinite(logits))
        assert int(np.argmax(logits[0])) == cls, (cls, logits[0])


def test_ep_runs_at_k1156():
    """Class-sharded (EP) MODE-DOTA at the real LVIS K: 1156 pads to 1160
    over 8 shards (145/device), residual loop on — the deployment
    parallel/ep.py exists for.  Trajectory parity with the replicated
    engine is covered at small K in tests/test_ep.py; this pins the
    at-scale plumbing (padding, gathers, sharded residual gradient)."""
    from uni_adapter_tpu.parallel import ep

    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=True, residual_steps=1),
                 cache=CacheConfig())
    D, N, T = 48, 32, 3
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 6)))
    text = rng.standard_normal((K_LVIS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    tgts = rng.integers(0, K_LVIS, (T, 1)).astype(np.int32)

    state, summary = ep.run_stream_ep(
        cfg, model, params, text, pcs, np.ones_like(pcs), tgts,
        mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == 4          # 1160 - 1156
    assert summary["n_class_shards"] == 8
    assert np.isfinite(summary["acc1"])
    # full-K state back on the host, pads stripped
    assert np.asarray(state.method_state.mu).shape == (K_LVIS, 2, D)
    assert np.asarray(state.res_state.residuals).shape == (K_LVIS, D)
    assert np.isfinite(np.asarray(state.res_state.residuals)).all()


def test_ep_cache_runs_at_k1156():
    """Class-sharded cache at the real LVIS K with the prototype graph
    (the deployment whose (K, C, K) probs state — ~160 MB/stream at the
    real D — motivated the round-4 cache EP): the gathered-matvec CG
    refines the 1160-node padded class graph, only 1156 rows live."""
    from uni_adapter_tpu.parallel import ep

    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_dota=False, use_mode_dota=False),
                 cache=CacheConfig(shot_capacity=4, cg_max_iter=10,
                                   graph_mode="prototype"))
    D, N, T = 48, 32, 3
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 6)))
    text = rng.standard_normal((K_LVIS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    tgts = rng.integers(0, K_LVIS, (T, 1)).astype(np.int32)

    state, summary = ep.run_stream_ep(
        cfg, model, params, text, pcs, np.ones_like(pcs), tgts,
        mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == 4
    assert np.isfinite(summary["acc1"])
    ms = state.method_state
    assert np.asarray(ms.probs).shape == (K_LVIS, 4, K_LVIS)
    assert int(np.asarray(ms.valid).sum()) == T   # one insert per step
    assert np.isfinite(np.asarray(ms.feats)).all()


def test_ep_dota_runs_at_k1156():
    """Class-sharded plain DOTA at the real LVIS K: the (K, D, D) Σ —
    the state EP exists to divide — lives as 145 rows/device."""
    from uni_adapter_tpu.parallel import ep

    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_dota=True, use_mode_dota=False),
                 cache=CacheConfig())
    D, N, T = 48, 32, 3
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 6)))
    text = rng.standard_normal((K_LVIS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    tgts = rng.integers(0, K_LVIS, (T, 1)).astype(np.int32)

    state, summary = ep.run_stream_ep(
        cfg, model, params, text, pcs, np.ones_like(pcs), tgts,
        mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == 4
    assert np.isfinite(summary["acc1"])
    ms = state.method_state
    assert np.asarray(ms.sigma).shape == (K_LVIS, D, D)
    assert np.asarray(ms.cum_soft_labels).shape == (1, K_LVIS)
    assert np.isfinite(np.asarray(ms.lam)).all()


def test_ep_gmm_runs_at_k1156():
    """Class-sharded GMM-DOTA at the real LVIS K: the (K, M, D) mixture
    splits 145 rows/device and the real-K QR init (a (1156, D, M) batched
    QR) stays tractable inside the splice path."""
    from uni_adapter_tpu.parallel import ep

    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_dota=False, use_mode_dota=False,
                                 use_gmm_dota=True, mode_M=2),
                 cache=CacheConfig())
    D, N, T = 48, 32, 3
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 6)))
    text = rng.standard_normal((K_LVIS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    tgts = rng.integers(0, K_LVIS, (T, 1)).astype(np.int32)

    state, summary = ep.run_stream_ep(
        cfg, model, params, text, pcs, np.ones_like(pcs), tgts,
        mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == 4
    assert np.isfinite(summary["acc1"])
    ms = state.method_state
    assert np.asarray(ms.mu).shape == (K_LVIS, 2, D)
    assert int(ms.total_samples) == T
    assert np.isfinite(np.asarray(ms.mu)).all()


def test_ep_adaptive_runs_at_k1156():
    """Class-sharded adaptive-modes at the real LVIS K: the (K, Mmax, D)
    padded slots split 145 rows/device; the masked scatter compiles at
    scale."""
    from uni_adapter_tpu.parallel import ep

    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_dota=False, use_mode_dota=False,
                                 use_adaptive_dota=True),
                 cache=CacheConfig())
    D, N, T = 48, 32, 3
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 6)))
    text = rng.standard_normal((K_LVIS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    tgts = rng.integers(0, K_LVIS, (T, 1)).astype(np.int32)

    state, summary = ep.run_stream_ep(
        cfg, model, params, text, pcs, np.ones_like(pcs), tgts,
        mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == 4
    assert np.isfinite(summary["acc1"])
    ms = state.method_state
    assert np.asarray(ms.mask).shape[0] == K_LVIS
    assert np.asarray(ms.mask)[:, 0].all()
    assert np.isfinite(np.asarray(ms.mu)).all()


def test_ep_serving_runs_at_k1156(tmp_path):
    """EP serving at the real LVIS K: register (the (1156, D, M) padded
    init + splice), two online submits through the shard_map'd step, and
    a full-K snapshot that restores onto a replicated server."""
    from uni_adapter_tpu.parallel import ep
    from uni_adapter_tpu.serve import TTAServer

    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=False),
                 cache=CacheConfig())
    D, N = 48, 32
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 6)))
    text = rng.standard_normal((K_LVIS, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)

    srv = TTAServer(cfg, model, params, text, seed=42, dist_mode="ep",
                    mesh=ep.make_classes_mesh(8))
    srv.register("edge-0")
    pcs = rng.standard_normal((2, 1, N, 3)).astype(np.float32)
    out0 = srv.submit([("edge-0", pcs[0], None)])["edge-0"]
    out1 = srv.submit([("edge-0", pcs[1], None)])["edge-0"]
    assert out0.shape == (1, K_LVIS) and np.isfinite(out1).all()

    path = str(tmp_path / "lvis_snap")
    srv.snapshot("edge-0", path)
    srv_rep = TTAServer(cfg, model, params, text, seed=42)
    srv_rep.restore("edge-0", path)
    assert int(srv_rep.states["edge-0"].step) == 2
    assert np.asarray(srv_rep.states["edge-0"].method_state.mu).shape[0] \
        == K_LVIS
