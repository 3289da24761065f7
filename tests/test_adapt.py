"""Adaptation-model tests: numpy oracles + property tests straight from the
streaming update equations (SURVEY.md §4 test-strategy layer 2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.adapt import cache as cache_mod
from uni_adapter_tpu.adapt import dota, fusion, mode_dota, residual
from uni_adapter_tpu.utils import math as um

K, D, M, B = 5, 16, 3, 4


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def clipw(rng):
    w = rng.standard_normal((D, K)).astype(np.float32)
    return jnp.array(w / np.linalg.norm(w, axis=0))


def _soft_labels(rng, b=B):
    y = rng.random((b, K)).astype(np.float32)
    return y / y.sum(1, keepdims=True)


# ---------------- DOTA ----------------

def test_dota_fit_oracle(rng, clipw):
    st = dota.init(1e-4, 1e-4, D, K, clipw)
    x = rng.standard_normal((B, D)).astype(np.float32)
    y = _soft_labels(rng)
    st2 = dota.fit(st, jnp.array(x), jnp.array(y))

    # numpy oracle of the streaming update equations
    mu0, c0 = np.asarray(st.mu), np.asarray(st.c)
    sum_w = y.sum(0)
    want_mu = (y.T @ x + c0[:, None] * mu0) / (sum_w[:, None] + c0[:, None])
    np.testing.assert_allclose(np.asarray(st2.mu), want_mu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.c), c0 + sum_w, atol=1e-6)
    xm = x[:, None, :] - mu0[None]                      # (B, K, D)
    delta = np.einsum("bji,bjk->jik", y[:, :, None] * xm, xm)
    want_sig = (c0[:, None, None] * np.asarray(st.sigma) + delta) / (
        c0 + sum_w)[:, None, None]
    np.testing.assert_allclose(np.asarray(st2.sigma), want_sig, atol=1e-5)


def test_dota_update_predict(rng, clipw):
    st = dota.init(1e-4, 1e-4, D, K, clipw)
    x = rng.standard_normal((B, D)).astype(np.float32)
    st = dota.fit(st, jnp.array(x), jnp.array(_soft_labels(rng)))
    st = dota.update(st, epsilon=1e-4)
    overall = np.asarray(st.sigma).mean(0)
    # fp32 inverses of an ill-conditioned (σ=1e-4) matrix differ between XLA
    # and LAPACK element-wise; assert the defining property Λ·A ≈ I instead.
    reg = (1 - 1e-4) * overall + 1e-4 * np.eye(D)
    # κ(A) ≈ 1/σ = 1e4 ⇒ fp32 inverse residual up to κ·eps ≈ 1e-3–1e-2
    np.testing.assert_allclose(np.asarray(st.lam) @ reg, np.eye(D), atol=2e-2)

    scores = np.asarray(dota.predict(st, jnp.array(x)))
    Mmat = np.asarray(st.mu).T
    W = np.asarray(st.lam) @ Mmat
    want = x @ W - 0.5 * np.sum(Mmat * W, axis=0)
    np.testing.assert_allclose(scores, want, rtol=1e-3, atol=1e-2)


def test_dota_prior(rng, clipw):
    st = dota.init(1e-4, 1e-4, D, K, clipw)
    x = rng.standard_normal((B, D)).astype(np.float32)
    y = _soft_labels(rng)
    st = dota.fit(st, jnp.array(x), jnp.array(y))
    st = dota.update(st, 1e-4)
    base = np.asarray(dota.predict(st, jnp.array(x)))
    with_prior = np.asarray(dota.predict(st, jnp.array(x), prior_pre_steps=10))
    # prior_step counts SAMPLES consumed (B per fit), so the cumulative
    # soft-label mass (B per fit) and the denominator grow together — the
    # prior stays a true average at any batch size (see dota.fit)
    prior = (y.sum(0, keepdims=True) + 10 / K) / (10 + B)
    # scores are O(1e3) with σ=1e-4, so the fp32 difference carries ~1e-2
    # absolute rounding noise
    np.testing.assert_allclose(
        with_prior - base,
        np.broadcast_to(np.log(prior + 1e-10), with_prior.shape),
        rtol=1e-3, atol=2e-2)


# ---------------- MODE-DOTA ----------------

def test_mode_dota_sigma_autocorrect():
    assert mode_dota.resolve_sigma_init(1.0, 512) == 1.0 / 512
    assert mode_dota.resolve_sigma_init(0.004, 512) == 0.004


def test_mode_dota_init_structure(clipw):
    st = mode_dota.init(1e-3, 0.004, D, K, clipw, num_modes=M)
    assert st.mu.shape == (K, M, D)
    # mode m offset: delta*(m+1) along axis m%D
    delta = 0.004 * 0.1
    centers = np.asarray(clipw).T
    mu = np.asarray(st.mu)
    for m in range(M):
        off = np.zeros(D); off[m % D] = delta * (m + 1)
        np.testing.assert_allclose(mu[:, m], centers + off, atol=1e-7)
    var = np.asarray(st.var)
    for m in range(M):
        np.testing.assert_allclose(var[:, m], 0.004 * (1 + 0.05 * m), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.pi), 1 / M)
    np.testing.assert_allclose(np.asarray(st.c), 1 / M)


def test_log_likelihood_vs_naive(rng, clipw):
    st = mode_dota.init(1e-3, 0.004, D, K, clipw, num_modes=M)
    x = rng.standard_normal((B, D)).astype(np.float32)
    got = np.asarray(mode_dota.log_likelihood(jnp.array(x), st.mu, st.var))
    mu, var = np.asarray(st.mu), np.asarray(st.var)
    diff = x[:, None, None, :] - mu[None]
    maha = np.sum(diff**2 / var[None], -1)
    logdet = np.sum(np.log(var), -1)
    want = -0.5 * (logdet[None] + maha)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mode_dota_fit_oracle(rng, clipw):
    eps = 1e-3
    st = mode_dota.init(eps, 0.004, D, K, clipw, num_modes=M)
    x = rng.standard_normal((B, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    g = _soft_labels(rng)
    st2 = mode_dota.fit(st, jnp.array(x), jnp.array(g), epsilon=eps)

    # numpy EM oracle
    mu, var, pi, c = (np.asarray(a) for a in (st.mu, st.var, st.pi, st.c))
    cv = np.clip(var + eps, 1e-8, None)
    diff = x[:, None, None, :] - mu[None]
    ll = -0.5 * (np.sum(np.log(cv), -1)[None] + np.sum(diff**2 / cv[None], -1))
    lj = np.log(pi + 1e-10)[None] + ll
    r = np.exp(lj - np.max(lj, 2, keepdims=True))
    r = r / r.sum(2, keepdims=True)
    gamma = g[:, :, None] * r
    sg = gamma.sum(0)
    c_new = c + sg
    wx = np.einsum("bkm,bd->kmd", gamma, x)
    mu_new = (c[..., None] * mu + wx) / (c_new[..., None] + 1e-10)
    wx2 = np.einsum("bkm,bd->kmd", gamma, x**2)
    wsq = wx2 - 2 * mu * wx + sg[..., None] * mu**2
    var_new = np.clip((c[..., None] * var + wsq) / (c_new[..., None] + 1e-10),
                      1e-8, None)
    np.testing.assert_allclose(np.asarray(st2.c), c_new, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.mu), mu_new, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.var), var_new, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.pi),
                               c_new / c_new.sum(1, keepdims=True), rtol=1e-4)


def test_mode_dota_invariants(rng, clipw):
    st = mode_dota.init(1e-3, 0.004, D, K, clipw, num_modes=M)
    for i in range(5):
        x = rng.standard_normal((B, D)).astype(np.float32)
        prev_c = np.asarray(st.c)
        st = mode_dota.fit(st, jnp.array(x), jnp.array(_soft_labels(rng)), 1e-3)
        assert np.all(np.asarray(st.c) >= prev_c - 1e-6)          # counts monotone
        np.testing.assert_allclose(np.asarray(st.pi).sum(1), 1.0, atol=1e-5)
        assert np.all(np.asarray(st.var) >= 1e-8)                 # variance floor
    assert int(st.t) == 5 * B


def test_mode_dota_predict_prior(rng, clipw):
    st = mode_dota.init(1e-3, 0.004, D, K, clipw, num_modes=M)
    x = jnp.array(rng.standard_normal((B, D)).astype(np.float32))
    st = mode_dota.fit(st, x, jnp.array(_soft_labels(rng)), 1e-3)
    s0 = mode_dota.predict(st, x, 1e-3)
    assert s0.shape == (B, K) and np.all(np.isfinite(np.asarray(s0)))
    s1 = mode_dota.predict(st, x, 1e-3, source_priors=jnp.full((K,), 1 / K))
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


# ---------------- math utils ----------------

def test_conjugate_gradient(rng):
    A = rng.standard_normal((20, 20)).astype(np.float32)
    A = A @ A.T + 20 * np.eye(20, dtype=np.float32)
    b = rng.standard_normal((20, 3)).astype(np.float32)
    x = np.asarray(um.conjugate_gradient(jnp.array(A), jnp.array(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-3, atol=1e-4)


def test_conjugate_gradient_tiny_b_runs_one_iteration(rng):
    """Do-while parity: the torch reference always runs one CG iteration
    (the break tests rz_new AFTER the update, math_utils.py:30-38), so for
    b small enough that the initial residual is already under tol the
    solver must return the first-iteration x = alpha*b, not zero — the
    early near-uniform cache at LVIS scale hits exactly this, and a zero
    x row-normalises to an all-zero probability matrix."""
    A = rng.standard_normal((8, 8)).astype(np.float32)
    A = A @ A.T + 8 * np.eye(8, dtype=np.float32)
    b = 1e-4 * rng.standard_normal((8, 2)).astype(np.float32)
    assert np.all(np.sum(b * b, axis=0) < 1e-5)           # initial rz < tol
    x = np.asarray(um.conjugate_gradient(jnp.array(A), jnp.array(b)))
    assert np.any(x != 0.0)
    # torch-reference first iteration: x = (rz/(p·Ap + 1e-8)) * b
    rz = np.sum(b * b, axis=0)
    alpha = rz / (np.sum(b * (A @ b), axis=0) + 1e-8)
    np.testing.assert_allclose(x, alpha[None] * b, rtol=1e-5, atol=1e-9)


def test_refinement_masked_equals_dense_subset(rng):
    n_valid, n_total = 12, 20
    keys = rng.standard_normal((n_total, D)).astype(np.float32)
    probs = _soft_labels(rng, n_total)
    valid = np.zeros(n_total, bool); valid[:n_valid] = True
    got = np.asarray(um.online_value_refinement_new(
        jnp.array(keys), jnp.array(probs), jnp.array(valid), 0.3, 0.11))
    dense = np.asarray(um.online_value_refinement_new(
        jnp.array(keys[:n_valid]), jnp.array(probs[:n_valid]),
        jnp.ones(n_valid, bool), 0.3, 0.11))
    np.testing.assert_allclose(got[:n_valid], dense, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[n_valid:], 0.0)


def test_refinement_old_matches_new_fixed_point(rng):
    keys = rng.standard_normal((10, D)).astype(np.float32)
    probs = _soft_labels(rng, 10)
    valid = np.ones(10, bool)
    new = np.asarray(um.online_value_refinement_new(
        jnp.array(keys), jnp.array(probs), jnp.array(valid), 0.3, 0.11,
        max_iter=200))
    old = np.asarray(um.online_value_refinement_old(
        jnp.array(keys), jnp.array(probs), jnp.array(valid), 0.3, 0.11))
    # CG stops at the reference's residual tolerance (1e-5 on squared
    # residuals, math_utils.py:21), which leaves ~5e-3 gap to the exact solve
    np.testing.assert_allclose(new, old, atol=1e-2)


# ---------------- cache ----------------

def _feat(rng):
    f = rng.standard_normal((1, D)).astype(np.float32)
    return jnp.array(f / np.linalg.norm(f))


def test_cache_insert_then_merge(rng, clipw):
    st = cache_mod.init(K, shot_capacity=2, feat_dim=D)
    logits = 100.0 * jnp.matmul(_feat(rng), clipw)
    prob = jax.nn.softmax(logits, 1)
    ent = um.normalized_entropy(um.softmax_entropy(logits), K)[0]

    st, new0 = cache_mod.update_cache(st, jnp.int32(2), _feat(rng), ent, prob, clipw)
    st, new1 = cache_mod.update_cache(st, jnp.int32(2), _feat(rng), ent, prob, clipw)
    assert bool(new0) and bool(new1)
    assert int(st.valid[2].sum()) == 2
    st2, new2 = cache_mod.update_cache(st, jnp.int32(2), _feat(rng), ent, prob, clipw)
    assert not bool(new2)                         # merged, not inserted
    assert int(st2.valid[2].sum()) == 2
    assert float(st2.counts[2].max()) == 2.0      # one prototype absorbed it
    # merged prototype stays unit-norm
    norms = np.linalg.norm(np.asarray(st2.feats[2]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_cache_merge_zero_confidence_stays_finite(rng, clipw):
    """conf = exp(-150·normalized-entropy) underflows to exact fp32 zero for
    near-uniform shots; a merge where BOTH the stored and incoming
    confidences underflowed was 0/0 → a NaN prototype that poisoned every
    later cache logit.  The merge must fall back to the count-weighted mean
    and keep the whole pipeline finite."""
    st = cache_mod.init(K, shot_capacity=1, feat_dim=D)
    ent = jnp.float32(1.0)                        # conf = exp(-150) == 0.0
    assert float(jnp.exp(-150.0 * ent)) == 0.0
    prob = jnp.full((1, K), 1.0 / K, jnp.float32)
    f0, f1 = _feat(rng), _feat(rng)
    st, ins = cache_mod.update_cache(st, jnp.int32(2), f0, ent, prob, clipw)
    st, merged = cache_mod.update_cache(st, jnp.int32(2), f1, ent, prob, clipw)
    assert bool(ins) and not bool(merged)
    proto = np.asarray(st.feats[2, 0])
    assert np.all(np.isfinite(proto))
    # count-weighted fallback mean, re-normalised
    want = np.asarray((f0[0] + f1[0]) / 2.0)
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(proto, want, atol=1e-5)
    out = np.asarray(cache_mod.compute_cache_logits(_feat(rng), st, 0.3, 0.11))
    assert np.all(np.isfinite(out))


def test_cache_merge_respects_logit_scale(rng, clipw):
    """The merge re-derives a prototype's probs/entropy at the engine's
    logit scale, not a hardcoded 100 — with scale 40 the recomputed probs
    must equal softmax(40·sim) (the documented older-loop scale,
    Uni_Adapter copy.py:57)."""
    scale = 40.0
    st = cache_mod.init(K, shot_capacity=1, feat_dim=D)
    logits = scale * jnp.matmul(_feat(rng), clipw)
    prob = jax.nn.softmax(logits, 1)
    ent = um.normalized_entropy(um.softmax_entropy(logits), K)[0]
    st, _ = cache_mod.update_cache(st, jnp.int32(1), _feat(rng), ent, prob,
                                   clipw, logit_scale=scale)
    st2, merged = cache_mod.update_cache(st, jnp.int32(1), _feat(rng), ent,
                                         prob, clipw, logit_scale=scale)
    assert not bool(merged)
    proto = np.asarray(st2.feats[1, 0])
    want = jax.nn.softmax(scale * jnp.matmul(jnp.asarray(proto)[None], clipw),
                          axis=1)
    np.testing.assert_allclose(np.asarray(st2.probs[1, 0]),
                               np.asarray(want[0]), atol=1e-6)


def test_fuse_cache_scale_divisor():
    """fuse_cache undoes the clip logits' similarity scaling with the SAME
    scale that produced them."""
    from uni_adapter_tpu.adapt import fusion

    rng_ = np.random.default_rng(0)
    sims = jnp.asarray(rng_.standard_normal((2, K)), jnp.float32)
    cachel = jnp.asarray(rng_.standard_normal((2, K)), jnp.float32)
    out40 = fusion.fuse_cache(40.0 * sims, cachel, logit_scale=40.0)
    out100 = fusion.fuse_cache(100.0 * sims, cachel, logit_scale=100.0)
    np.testing.assert_allclose(np.asarray(out40), np.asarray(out100),
                               rtol=1e-5, atol=1e-6)


def test_cache_logits_empty_is_zero(clipw):
    st = cache_mod.init(K, 2, D)
    out = cache_mod.compute_cache_logits(jnp.ones((1, D)), st, 0.5, 0.11)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_cache_logits_shape_and_finite(rng, clipw):
    st = cache_mod.init(K, 3, D)
    for i in range(7):
        f = _feat(rng)
        logits = 100.0 * jnp.matmul(f, clipw)
        prob = jax.nn.softmax(logits, 1)
        ent = um.normalized_entropy(um.softmax_entropy(logits), K)[0]
        st, _ = cache_mod.update_cache(st, jnp.int32(i % K), f, ent, prob, clipw)
    out = np.asarray(cache_mod.compute_cache_logits(_feat(rng), st, 0.3, 0.11))
    assert out.shape == (1, K) and np.all(np.isfinite(out))


# ---------------- fusion ----------------

def test_fusion_paths(rng):
    clip_l = jnp.array(rng.standard_normal((1, K)).astype(np.float32))
    dota_l = jnp.array(rng.standard_normal((1, K)).astype(np.float32))
    w = fusion.dota_fusion_weight(0.02, 0.1, jnp.float32(100.0), 1)
    assert np.isclose(float(w), 0.1)              # clamped at eta
    f1 = fusion.fuse_dota(clip_l, dota_l, w)
    np.testing.assert_allclose(np.asarray(f1),
                               np.asarray(clip_l) + 0.1 * np.asarray(dota_l),
                               rtol=1e-5)
    f2 = fusion.fuse_mode_dota(clip_l, dota_l, w)
    f2_fixed = fusion.fuse_mode_dota(clip_l, dota_l, w, fix_normalization=True)
    assert np.all(np.isfinite(np.asarray(f2)))
    assert not np.allclose(np.asarray(f2), np.asarray(f2_fixed))
    f3 = fusion.fuse_cache(clip_l, dota_l)
    assert np.all(np.isfinite(np.asarray(f3)))


# ---------------- residual learning ----------------

def test_residual_optimization_reduces_loss(rng, clipw):
    eps = 1e-3
    mix = mode_dota.init(eps, 0.004, D, K, clipw, num_modes=M)
    x = jnp.array(rng.standard_normal((B, D)).astype(np.float32))
    mix = mode_dota.fit(mix, x, jnp.array(_soft_labels(rng)), eps)
    text_init = clipw.T  # (K, D)
    opt = residual.make_optimizer(1e-2)
    rs = residual.init(text_init, opt)

    def loss_at(rs):
        t = text_init + rs.residuals
        t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
        return float(residual.alignment_loss(t, mix, eps))

    l0 = loss_at(rs)
    rs2 = residual.optimize_residuals(rs, text_init, mix, opt, eps, num_steps=20)
    l1 = loss_at(rs2)
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 <= l0 + 1e-6
    assert not np.allclose(np.asarray(rs2.residuals), 0.0)
    w = residual.adapted_text_weights(rs2, text_init)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=0), 1.0,
                               atol=1e-5)


def test_residual_precision_tiers_agree():
    """The 3-pass 'high' tier must track the fp32-exact 'highest' residual
    trajectory to well under the EM noise floor at benchmark dims."""
    import jax
    from uni_adapter_tpu.adapt import mode_dota, residual

    rng = np.random.default_rng(11)
    K, M, D = 10, 2, 64
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    state = mode_dota.init(1e-3, 0.004, D, K, jnp.asarray(text.T),
                           num_modes=M)
    x = rng.standard_normal((8, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    gamma = rng.dirichlet(np.ones(K), 8).astype(np.float32)
    state = mode_dota.fit(state, jnp.asarray(x), jnp.asarray(gamma), 1e-3)

    opt = residual.make_optimizer(1e-3)
    rs = residual.init(jnp.asarray(text), opt)
    out_hi = residual.optimize_residuals(
        rs, jnp.asarray(text), state, opt, 1e-3, num_steps=10,
        precision=jax.lax.Precision.HIGHEST)
    out_h3 = residual.optimize_residuals(
        rs, jnp.asarray(text), state, opt, 1e-3, num_steps=10,
        precision=jax.lax.Precision.HIGH)
    np.testing.assert_allclose(np.asarray(out_hi.residuals),
                               np.asarray(out_h3.residuals),
                               rtol=0, atol=5e-4)


def test_optimize_residuals_unroll_equivalent():
    """unroll=True is the same math as the fori_loop form (fusion-order
    differences at ulp level only)."""
    from uni_adapter_tpu.adapt import mode_dota, residual

    K, D, M = 12, 16, 2
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))
    ms = mode_dota.init(1e-3, 0.004, D, K, text.T, num_modes=M)
    x = jnp.asarray(rng.standard_normal((4, D)).astype(np.float32))
    ms = mode_dota.fit(ms, x, jax.nn.softmax(x @ text.T), 1e-3)
    opt = residual.make_optimizer()
    rs = residual.init(text, opt)
    a = residual.optimize_residuals(rs, text, ms, opt, 1e-3, unroll=False)
    b = residual.optimize_residuals(rs, text, ms, opt, 1e-3, unroll=True)
    np.testing.assert_allclose(np.asarray(a.residuals),
                               np.asarray(b.residuals), rtol=1e-5, atol=1e-7)
