"""GMM-DOTA and adaptive-modes variant tests (numpy oracles + split
mechanics), plus engine integration of both."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.adapt import adaptive, gmm

K, D, M, B = 4, 12, 3, 5


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def clipw(rng):
    w = rng.standard_normal((D, K)).astype(np.float32)
    return jnp.array(w / np.linalg.norm(w, axis=0))


def _probs(rng, b=B, k=K):
    y = rng.random((b, k)).astype(np.float32)
    return y / y.sum(1, keepdims=True)


# ---------------- GMM-DOTA ----------------

def test_gmm_init_orthonormal_perturbations(clipw):
    st = gmm.init(1e-3, 0.004, D, K, clipw, num_modes=M,
                  perturbation_scale=0.01)
    base = np.asarray(clipw).T
    mu = np.asarray(st.mu)
    offs = (mu - base[:, None]) / 0.01          # (K, M, D) orthonormal rows
    for k in range(K):
        gram = offs[k] @ offs[k].T
        np.testing.assert_allclose(gram, np.eye(M), atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.C), 1.0 / (K * M))


def test_gmm_fit_uses_old_mu(rng, clipw):
    st = gmm.init(1e-3, 0.004, D, K, clipw, num_modes=M)
    x = rng.standard_normal((B, D)).astype(np.float32)
    y = _probs(rng)
    st2 = gmm.fit(st, jnp.array(x), jnp.array(y))

    # numpy oracle with OLD-mu covariance update
    mu, sg, pi, C = (np.asarray(a) for a in (st.mu, st.sigma, st.pi, st.C))
    s = np.clip(sg, 1e-8, None)
    ll = -0.5 * ((((x[:, None, None] - mu[None]) ** 2) / s[None]).sum(-1)
                 + np.log(s).sum(-1))
    lj = np.log(np.clip(pi, 1e-10, None))[None] + ll
    r = np.exp(lj - lj.max(2, keepdims=True))
    r /= r.sum(2, keepdims=True)
    gam = y[:, :, None] * r
    sgam = gam.sum(0)
    newC = C + sgam
    wx = np.einsum("bkm,bd->kmd", gam, x)
    mu_new = (C[..., None] * mu + wx) / np.clip(newC[..., None], 1e-10, None)
    diff = x[:, None, None] - mu[None]                     # OLD mu
    wdsq = np.einsum("bkm,bkmd->kmd", gam, diff * diff)
    sig_new = np.clip((C[..., None] * sg + wdsq)
                      / np.clip(newC[..., None], 1e-10, None), 1e-8, None)
    np.testing.assert_allclose(np.asarray(st2.mu), mu_new, rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.sigma), sig_new, rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.C), newC, rtol=1e-4)


def test_gmm_update_shrinks_toward_ones(rng, clipw):
    st = gmm.init(1e-3, 0.004, D, K, clipw, num_modes=M)
    st = gmm.fit(st, jnp.array(rng.standard_normal((B, D)).astype(np.float32)),
                 jnp.array(_probs(rng)))
    eps = 0.1
    st = gmm.update(st, eps)
    want = (1 - eps) * np.asarray(st.sigma) + eps
    np.testing.assert_allclose(np.asarray(st.sigma_reg), want, rtol=1e-5)


def test_gmm_predict_blends_prior(rng, clipw):
    st = gmm.init(1e-3, 0.004, D, K, clipw, num_modes=M)
    x = jnp.array(rng.standard_normal((2, D)).astype(np.float32))
    s0 = gmm.predict(st, x)                      # t=0 → uniform prior
    assert s0.shape == (2, K) and np.all(np.isfinite(np.asarray(s0)))
    st = gmm.fit(st, x, jnp.array(_probs(rng, 2)))
    st = gmm.update(st, 1e-3)
    s1 = gmm.predict(st, x)
    assert np.all(np.isfinite(np.asarray(s1)))


# ---------------- adaptive modes ----------------

def test_adaptive_init_single_mode(clipw):
    st = adaptive.init(1e-3, 0.004, D, K, clipw, max_modes=4)
    assert np.array_equal(np.asarray(adaptive.num_modes_per_class(st)),
                          np.ones(K, np.int32))
    np.testing.assert_allclose(np.asarray(st.mu[:, 0]), np.asarray(clipw).T,
                               atol=1e-6)
    assert np.all(np.asarray(st.var[:, 1:]) >= 1e9)       # padded slots


def test_adaptive_fit_matches_mode_dota_while_single_mode(rng, clipw):
    """With M=1 and no split triggered, adaptive == a 1-mode DOTA_mix."""
    from uni_adapter_tpu.adapt import mode_dota
    eps = 1e-3
    st_a = adaptive.init(eps, 0.004, D, K, clipw, max_modes=4)
    st_m = mode_dota.init(eps, 0.004, D, K, clipw, num_modes=1)
    # align the 1-mode init exactly (mode_dota adds a tiny offset + 1.0 var
    # scale; mode 0 offset is delta·1 on axis 0)
    st_m = st_m._replace(mu=st_a.mu[:, :1], var=st_a.var[:, :1],
                         c=jnp.ones((K, 1)), pi=jnp.ones((K, 1)))
    st_a = st_a._replace(c=st_a.c.at[:, 0].set(1.0))
    x = rng.standard_normal((B, D)).astype(np.float32)
    y = _probs(rng)
    st_a = adaptive.fit(st_a, jnp.array(x), jnp.array(y), eps,
                        split_threshold=1e9, split_check_interval=1000)
    st_m = mode_dota.fit(st_m, jnp.array(x), jnp.array(y), eps)
    np.testing.assert_allclose(np.asarray(st_a.mu[:, 0]),
                               np.asarray(st_m.mu[:, 0]), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a.var[:, 0]),
                               np.asarray(st_m.var[:, 0]), rtol=1e-4,
                               atol=1e-8)


def test_adaptive_split_mechanics(clipw):
    st = adaptive.init(1e-3, 0.004, D, K, clipw, max_modes=4)
    # inflate class 0 mode 0: high variance on dim 3, enough count
    var = st.var.at[0, 0, 3].set(1.0)
    st = st._replace(var=var, c=st.c.at[0, 0].set(10.0))
    st2 = adaptive.check_and_split(st, split_threshold=0.5, min_count_to_split=5.0)
    n = np.asarray(adaptive.num_modes_per_class(st2))
    assert n[0] == 2 and np.all(n[1:] == 1)
    # children offset ±½σ along dim 3, variance halved there
    std = np.sqrt(1.0)
    mu0 = np.asarray(st.mu[0, 0])
    np.testing.assert_allclose(np.asarray(st2.mu[0, 0]),
                               mu0 + 0.5 * std * np.eye(D)[3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.mu[0, 1]),
                               mu0 - 0.5 * std * np.eye(D)[3], atol=1e-5)
    assert np.asarray(st2.var)[0, 0, 3] == pytest.approx(0.5)
    assert np.asarray(st2.c)[0, 0] == pytest.approx(5.0)
    assert np.asarray(st2.c)[0, 1] == pytest.approx(5.0)


def test_adaptive_split_respects_max_modes(clipw):
    st = adaptive.init(1e-3, 0.004, D, K, clipw, max_modes=2)
    var = st.var.at[0, 0, 1].set(5.0)
    st = st._replace(var=var, c=st.c.at[0, 0].set(100.0))
    st2 = adaptive.check_and_split(st, split_threshold=0.1,
                                   min_count_to_split=5.0)
    assert int(adaptive.num_modes_per_class(st2)[0]) == 2  # capped


def test_adaptive_predict_masked(rng, clipw):
    st = adaptive.init(1e-3, 0.004, D, K, clipw, max_modes=4)
    x = jnp.array(rng.standard_normal((2, D)).astype(np.float32))
    s = adaptive.predict(st, x, 1e-3)
    assert s.shape == (2, K) and np.all(np.isfinite(np.asarray(s)))
    stats = adaptive.get_mode_stats(st)
    assert stats["total"] == K and stats["max"] == 1


# ---------------- engine integration ----------------

@pytest.mark.parametrize("flag", ["use_gmm_dota", "use_adaptive_dota"])
def test_engine_runs_variants(flag):
    from uni_adapter_tpu import engine
    from uni_adapter_tpu.config import (CacheConfig, Config, DotaConfig,
                                        ModelConfig)
    from uni_adapter_tpu.models.uni3d import Uni3D

    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc0 = jnp.array(rng.standard_normal((1, 32, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    dc = DotaConfig(use_dota=False, use_mode_dota=False, mode_M=2)
    setattr(dc, flag, True)
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(cg_max_iter=5))
    T = 4
    pcs = jnp.array(rng.standard_normal((T, 1, 32, 3)).astype(np.float32))
    state, outs = engine.run_stream_scan(
        cfg, model, params, jnp.array(text), pcs, jnp.ones_like(pcs),
        jnp.array(rng.integers(0, K, (T, 1)).astype(np.int32)))
    assert np.all(np.isfinite(np.asarray(outs.final_logits)))
    assert int(state.step) == T


def test_engine_adaptive_splits_fire_inside_scan():
    """The vectorised collect/execute split scatter must compile and FIRE
    inside the jitted stream scan (test_engine_runs_variants stops at 4
    steps — below the 50-fit split-check interval, so it never exercises
    check_and_split under the real carry).  60 steps with a low split
    threshold: mode counts must grow past 1/class, valid slots must stay a
    contiguous prefix (the invariant the ascending-index selection relies
    on), and the stream must stay finite through the split boundary."""
    from uni_adapter_tpu import engine
    from uni_adapter_tpu.adapt import adaptive
    from uni_adapter_tpu.config import (CacheConfig, Config, DotaConfig,
                                        ModelConfig)
    from uni_adapter_tpu.models.uni3d import Uni3D

    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    pc0 = jnp.array(rng.standard_normal((1, 32, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    # sigma 5e-4 → split threshold 5e-3, far below the ~1/D variance the
    # fitted components reach on unit-norm features: splits are certain for
    # every class whose count clears min_count_to_split by fit call 50
    dc = DotaConfig(use_dota=False, use_mode_dota=False,
                    use_adaptive_dota=True, sigma=5e-4)
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(cg_max_iter=5))
    T = 60
    pcs = jnp.array(rng.standard_normal((T, 1, 32, 3)).astype(np.float32))
    state, outs = engine.run_stream_scan(
        cfg, model, params, jnp.array(text), pcs, jnp.ones_like(pcs),
        jnp.array(rng.integers(0, K, (T, 1)).astype(np.int32)))
    assert np.all(np.isfinite(np.asarray(outs.final_logits)))

    n = np.asarray(adaptive.num_modes_per_class(state.method_state))
    assert n.sum() > K, "no split fired inside the scan"
    mask = np.asarray(state.method_state.mask)
    for k in range(mask.shape[0]):
        nk = int(mask[k].sum())
        assert mask[k, :nk].all() and not mask[k, nk:].any(), \
            f"class {k}: valid slots not a contiguous prefix"
    # split bookkeeping: class pi still sums to 1 over valid slots after
    # the post-split fit steps renormalise
    pi = np.asarray(state.method_state.pi)
    np.testing.assert_allclose((pi * mask).sum(1), 1.0, atol=1e-5)
