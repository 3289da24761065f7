"""Trajectory-level parity: our engine vs a torch oracle of the reference
semantics.

The strongest accuracy-parity evidence available without the pretrained
checkpoints (SURVEY.md §4): both sides consume IDENTICAL encoder features
(a deterministic toy featurizer implemented twice, flax + torch), run the
full online adaptation trajectory — MODE-DOTA EM + fusion (+ residual
learning), DOTA + fusion, and the prototype-cache path with its *growing*
dict-of-lists + growing-graph CG refinement — and the per-step final logits
must agree to fp32 tolerance.

The torch oracle transcribes the reference equations independently
(dota_mixture.py:162-267, dota.py:40-88, Uni_Adapter.py:78-189,443-521,
554-574, utils/math_utils.py:21-110); notably the cache oracle keeps the
reference's VARIABLE-SIZE structures, so agreement here validates the
fixed-capacity masked re-encoding exactly.
"""
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig

K, D, M, N, T = 5, 16, 2, 32, 8
EPS, SIGMA, RHO, ETA = 1e-3, 0.004, 0.02, 0.1


# ---------------------------------------------------------------------------
# Deterministic toy featurizer, implemented twice
# ---------------------------------------------------------------------------

def make_projection():
    rng = np.random.default_rng(7)
    return rng.standard_normal((3, D)).astype(np.float32)


class ToyEncoder:
    """flax-model stand-in with the engine's model.apply contract."""

    def __init__(self, W):
        self.W = jnp.asarray(W)

    def apply(self, params, pc):
        # (B, N, 6) → (B, D): mean of sin(xyz) @ W  (deterministic, smooth)
        f = jnp.mean(jnp.sin(pc[:, :, :3]), axis=1) @ self.W
        return f.astype(jnp.float32)


def torch_features(pc_np, W):
    f = torch.sin(torch.tensor(pc_np[:, :, :3])).mean(1) @ torch.tensor(W)
    return torch.nn.functional.normalize(f, dim=-1)


# ---------------------------------------------------------------------------
# Torch oracle of the reference semantics
# ---------------------------------------------------------------------------

def softmax_entropy_t(x):
    p = torch.softmax(x, dim=1)
    return -(p * torch.log(p + 1e-10)).sum(1)


class TorchModeDota:
    """dota_mixture.py:58-267 equations."""

    def __init__(self, clip_weights_dk):
        centers = clip_weights_dk.T.float()                 # (K, D)
        delta = SIGMA * 0.1
        offsets = torch.zeros(M, D)
        for m in range(M):
            offsets[m, m % D] = delta * (m + 1)
        self.mu = centers[:, None, :] + offsets[None]
        scale = 1.0 + 0.05 * torch.arange(M).float()
        self.var = (torch.full((K, M, D), SIGMA)
                    * scale[None, :, None]).clamp(min=1e-8)
        self.pi = torch.full((K, M), 1.0 / M)
        self.c = torch.full((K, M), 1.0 / M)

    def _ll(self, x, mu, var):
        diff = x[:, None, None, :] - mu[None]
        maha = (diff ** 2 / var[None]).sum(-1)
        return -0.5 * (var[None].log().sum(-1) + maha)

    def cur_var(self):
        return (self.var + EPS).clamp(min=1e-8)

    def predict(self, x):
        ll = self._ll(x, self.mu, self.cur_var())
        return torch.logsumexp((self.pi + 1e-10).log()[None] + ll, dim=2)

    def fit(self, x, g):
        ll = self._ll(x, self.mu, self.cur_var())
        lj = (self.pi + 1e-10).log()[None] + ll
        r = (lj - lj.logsumexp(2, keepdim=True)).exp()
        gamma = g[:, :, None] * r
        sg = gamma.sum(0)
        c_new = self.c + sg
        gp = gamma.permute(1, 2, 0)
        wx = gp @ x
        mu_new = (self.c[..., None] * self.mu + wx) / (c_new[..., None] + 1e-10)
        wx2 = gp @ (x ** 2)
        wsq = wx2 - 2 * self.mu * wx + sg[..., None] * self.mu ** 2
        self.var = ((self.c[..., None] * self.var + wsq)
                    / (c_new[..., None] + 1e-10)).clamp(min=1e-8)
        self.mu, self.c = mu_new, c_new
        self.pi = self.c / (self.c.sum(1, keepdim=True) + 1e-10)


class TorchDota:
    """dota.py:20-88 equations; μ init from the constant 0.001 matrix
    (Uni_Adapter.py:329-330)."""

    def __init__(self):
        self.mu = torch.full((K, D), 0.001)
        self.c = torch.ones(K)
        self.sigma = 1e-4 * torch.eye(D).repeat(K, 1, 1)
        self.lam = torch.linalg.pinv(self.sigma.mean(0))

    def fit(self, x, y):
        sw = y.sum(0)
        wx = y.T @ x
        new_mu = (wx + self.c[:, None] * self.mu) / (sw[:, None]
                                                     + self.c[:, None])
        xm = x[:, None, :] - self.mu[None]
        delta = torch.einsum("bji,bjk->jik", y[:, :, None] * xm, xm)
        self.sigma = (self.c[:, None, None] * self.sigma + delta) / (
            self.c + sw)[:, None, None]
        self.mu, self.c = new_mu, self.c + sw

    def update(self):
        self.lam = torch.linalg.inv(
            (1 - 1e-4) * self.sigma.mean(0) + 1e-4 * torch.eye(D))

    def predict(self, x):
        Mm = self.mu.T
        W = self.lam @ Mm
        return x @ W - 0.5 * (Mm * W).sum(0)


def torch_residual_loss(class_emb, mix: TorchModeDota):
    """Uni_Adapter.py:191-270."""
    ll = mix._ll(class_emb, mix.mu, mix.cur_var())
    lm = torch.logsumexp((mix.pi + 1e-10).log()[None] + ll, dim=2)
    lmn = lm / lm.max()
    e = torch.exp(torch.exp(lmn))
    diag = torch.diag(e)
    return -(diag / e.sum(1)).mean() - (diag / e.sum(0)).mean()


def torch_cg(A, b, max_iter=100, tol=1e-5):
    """utils/math_utils.py:21-45."""
    x = torch.zeros_like(b)
    r = b - A @ x
    p = r.clone()
    rz = (r * r).sum(0)
    for _ in range(max_iter):
        Ap = A @ p
        alpha = (rz / ((p * Ap).sum(0) + 1e-8)).view(1, -1)
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = (r * r).sum(0)
        if torch.all(rz_new < tol):
            break
        beta = (rz_new / (rz + 1e-8)).view(1, -1)
        p = r + beta * p
        rz = rz_new
    return x


def torch_refine(keys, probs, threshold, lam):
    """utils/math_utils.py:48-98 (growing graph)."""
    nk = torch.nn.functional.normalize(keys, dim=1)
    Wm = nk @ nk.T
    Wm[Wm < threshold] = 0
    dis = 1.0 / (Wm.sum(1).sqrt() + 1e-8)
    I = torch.eye(Wm.size(0))
    L = I - dis[:, None] * Wm * dis[None, :] + 2 * lam * I
    out = torch_cg(L, 2 * lam * probs)
    return out / out.sum(1, keepdim=True)


def run_torch_oracle(method, feats, targets, clip_w_dk, hp):
    """Full reference trajectory on precomputed features.

    feats: (T, 1, D) torch; returns list of final_logits per step.
    """
    finals = []
    if method == "mode":
        mix = TorchModeDota(clip_w_dk)
        text_init = clip_w_dk.T.clone()
        residuals = torch.zeros(K, D, requires_grad=True)
        opt = torch.optim.Adam([residuals], lr=1e-3)
    elif method == "dota":
        model = TorchDota()
    else:
        cache = {}

    for i in range(feats.shape[0]):
        if method == "mode":
            tcur = torch.nn.functional.normalize(
                text_init + residuals.detach(), dim=1)
            w = tcur.t()
        else:
            w = clip_w_dk
        f = feats[i]
        logits = 100.0 * f @ w
        prob = torch.softmax(logits, 1)

        if method == "mode":
            d = mix.predict(f.mean(0, keepdim=True))
            mix.fit(f, prob)
            mix.fit(f, prob)         # noise_std=0 ⇒ aug features == clean
            if i > 0:
                for _ in range(10):
                    opt.zero_grad()
                    t = torch.nn.functional.normalize(text_init + residuals,
                                                      dim=1)
                    loss = torch_residual_loss(t, mix)
                    loss.backward()
                    opt.step()
            wv = torch.clamp(RHO * mix.c.mean() / f.size(0), max=ETA)
            dl = wv * d
            ec, ed = softmax_entropy_t(logits), softmax_entropy_t(dl)
            wc, wd = 1 / (ec + 1e-3), 1 / (ed + 1e-3)
            wc = wc / (wc + wd)
            wd = wd / (wc + wd)      # reference double-normalisation
            finals.append(wc * logits + wd * dl)
        elif method == "dota":
            d = model.predict(f.mean(0, keepdim=True))
            model.fit(f, prob)
            model.update()
            wv = torch.clamp(RHO * model.c.mean() / f.size(0), max=ETA)
            finals.append(logits + wv * d)
        else:
            ent = softmax_entropy_t(logits)
            prop = float(ent / math.log2(K))
            conf = torch.exp(torch.tensor(-hp["beta"] * prop))
            pred = int(logits.argmax(1))
            item = [f.clone(), conf, prob.clone()]
            if pred in cache:
                if len(cache[pred]) < hp["shot_capacity"]:
                    cache[pred].append(item + [1])
                else:
                    sims = torch.stack([f @ it[0].T for it in cache[pred]])
                    mi = int(sims.argmax())
                    fc, cc, pc_, nc = cache[pred][mi]
                    nf = (cc * nc * fc + conf * f) / (nc * cc + conf)
                    nf = nf / nf.norm(dim=-1, keepdim=True)
                    nl = 100 * nf @ w
                    np_ = torch.softmax(nl, 1)
                    ne = float(softmax_entropy_t(nl) / math.log2(K))
                    cache[pred][mi] = [nf, torch.exp(torch.tensor(
                        -hp["beta"] * ne)), np_, nc + 1]
            else:
                cache[pred] = [item + [1]]

            keys, probs_l = [], []
            for ci in sorted(cache):
                for it in cache[ci]:
                    keys.append(it[0])
                    probs_l.append(it[2])
            keys = torch.cat(keys, 0)
            probs_c = torch.cat(probs_l, 0)
            refined = torch_refine(keys, probs_c, hp["threshold"],
                                   hp["lambda_reg"])
            classes = refined.argmax(1)
            vals = torch.nn.functional.one_hot(classes, K).float()
            vals = vals / (vals.sum(0) + 1e-6)
            affinity = torch.nn.functional.normalize(f, dim=-1) @ keys.T
            cache_logits = affinity @ vals
            p1 = torch.softmax(logits / 100.0, 1)
            e1 = -(p1 * (p1 + 1e-10).log()).sum(1)
            p2 = torch.softmax(cache_logits, 1)
            e2 = -(p2 * (p2 + 1e-10).log()).sum(1)
            finals.append((1 / e1)[:, None] * p1 + (1 / e2)[:, None] * p2)
    return torch.stack(finals)


# ---------------------------------------------------------------------------
# The comparison
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(3)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    targets = rng.integers(0, K, (T, 1)).astype(np.int32)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    return pcs, targets, text


def cfg_for(method):
    dc = {
        "mode": DotaConfig(use_mode_dota=True, mode_M=M, res_learning=True,
                           epsilon=EPS, sigma=SIGMA, rho=RHO, eta=ETA,
                           noise_std=0.0),
        "dota": DotaConfig(use_dota=True, use_mode_dota=False, epsilon=1e-4,
                           sigma=1e-4, rho=RHO, eta=ETA),
        "cache": DotaConfig(use_dota=False, use_mode_dota=False),
    }[method]
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig(shot_capacity=3, threshold=0.3,
                                    lambda_reg=0.11, beta=150.0))


@pytest.mark.parametrize("method", ["dota", "mode", "cache"])
def test_trajectory_matches_reference_oracle(stream, method):
    pcs, targets, text = stream
    W = make_projection()
    cfg = cfg_for(method)

    model = ToyEncoder(W)
    rgbs = np.ones_like(pcs)
    _, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets))
    ours = np.asarray(outs.final_logits)[:, 0]          # (T, K)

    feats = torch.stack([torch_features(pcs[i], W) for i in range(T)])
    hp = {"shot_capacity": 3, "threshold": 0.3, "lambda_reg": 0.11,
          "beta": 150.0}
    theirs = run_torch_oracle(method, feats, targets,
                              torch.tensor(text).T, hp).detach().numpy()[:, 0]

    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_long_trajectory_drift(stream):
    """64-step MODE-DOTA stream: quantify accumulated divergence from the
    torch oracle (EM state feeds back into every subsequent step, so drift
    compounds if any update term is wrong)."""
    rng = np.random.default_rng(9)
    T_long = 64
    pcs = rng.standard_normal((T_long, 1, N, 3)).astype(np.float32)
    targets = rng.integers(0, K, (T_long, 1)).astype(np.int32)
    _, _, text = stream
    W = make_projection()
    cfg = cfg_for("mode")

    model = ToyEncoder(W)
    _, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(np.ones_like(pcs)), jnp.asarray(targets))
    ours = np.asarray(outs.final_logits)[:, 0]

    feats = torch.stack([torch_features(pcs[i], W) for i in range(T_long)])
    hp = {"shot_capacity": 3, "threshold": 0.3, "lambda_reg": 0.11,
          "beta": 150.0}
    theirs = run_torch_oracle("mode", feats, targets,
                              torch.tensor(text).T, hp).detach().numpy()[:, 0]

    # last-quarter steps carry 48+ steps of accumulated state
    np.testing.assert_allclose(ours[-16:], theirs[-16:], rtol=5e-3, atol=5e-3)
    # and the predictions agree everywhere
    np.testing.assert_array_equal(ours.argmax(-1), theirs.argmax(-1))


class TorchGMMDota:
    """gmm_dota_adaptation_model.py:25-256 equations (old-μ covariance,
    shrinkage toward ones, always-blended prior)."""

    def __init__(self, mu_init):
        # mu_init: (K, M, D) — injected so both sides share the QR init
        self.mu = mu_init.clone()
        # sigma auto-correct only when cfg sigma >= 0.1 (gmm model :36-40);
        # SIGMA=0.004 stays as-is
        self.sigma = torch.full((K, M, D), SIGMA)
        self.sigma_reg = self.sigma.clone()
        self.pi = torch.full((K, M), 1.0 / M)
        self.C = torch.full((K, M), 1.0 / (K * M))
        self.class_counts = torch.zeros(K)
        self.t = 0

    def _lg(self, x, mu, s):
        s = s.clamp(min=1e-8)
        d = x[:, None, None] - mu[None]
        return -0.5 * ((d * d / s[None]).sum(-1) + s[None].log().sum(-1))

    def fit(self, x, y):
        ll = self._lg(x, self.mu, self.sigma)
        r = torch.softmax(self.pi.clamp(min=1e-10).log()[None] + ll, dim=2)
        gamma = y[:, :, None] * r
        sg = gamma.sum(0)
        newC = self.C + sg
        wx = torch.einsum("bkm,bd->kmd", gamma, x)
        mu_old = self.mu.clone()
        self.mu = (self.C[..., None] * self.mu + wx) / newC[..., None].clamp(min=1e-10)
        d = x[:, None, None] - mu_old[None]
        wdsq = torch.einsum("bkm,bkmd->kmd", gamma, d * d)
        self.sigma = ((self.C[..., None] * self.sigma + wdsq)
                      / newC[..., None].clamp(min=1e-10)).clamp(min=1e-8)
        self.C = newC
        self.pi = self.C / self.C.sum(1, keepdim=True).clamp(min=1e-10)
        self.class_counts += y.sum(0)
        self.t += x.shape[0]

    def update(self):
        self.sigma_reg = ((1 - EPS) * self.sigma
                          + EPS * torch.ones_like(self.sigma)).clamp(min=1e-8)

    def predict(self, x, alpha_max=0.5):
        ll = self._lg(x, self.mu, self.sigma_reg)
        lcl = torch.logsumexp(self.pi.clamp(min=1e-10).log()[None] + ll, -1)
        uniform = torch.full((K,), 1.0 / K)
        if self.t > 0:
            est = self.class_counts / self.class_counts.sum().clamp(min=1e-10)
            a = min(alpha_max, self.t / (self.t + 100.0))
            p = (1 - a) * uniform + a * est
        else:
            p = uniform
        return lcl + p.clamp(min=1e-10).log()[None]


def test_gmm_trajectory_matches_oracle(stream):
    """Engine GMM-DOTA trajectory vs torch oracle, sharing the QR init."""
    from uni_adapter_tpu.adapt import gmm

    pcs, targets, text = stream
    W = make_projection()
    cfg = cfg_for("mode")
    import dataclasses
    cfg = dataclasses.replace(cfg, dota=DotaConfig(
        use_dota=False, use_mode_dota=False, use_gmm_dota=True, mode_M=M,
        epsilon=EPS, sigma=SIGMA, rho=RHO, eta=ETA, alpha_max=0.5))

    model = ToyEncoder(W)
    state_f, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(np.ones_like(pcs)), jnp.asarray(targets), seed=42)
    ours = np.asarray(outs.final_logits)[:, 0]

    # recover the engine's QR-seeded mu init for the oracle
    init_rng = jax.random.split(jax.random.PRNGKey(42))[1]
    ms0 = gmm.init(EPS, SIGMA, D, K, jnp.asarray(text).T, num_modes=M,
                   rng=init_rng)
    mu0 = torch.tensor(np.asarray(ms0.mu))

    feats = torch.stack([torch_features(pcs[i], W) for i in range(T)])
    g = TorchGMMDota(mu0)
    finals = []
    for i in range(T):
        f = feats[i]
        logits = 100.0 * f @ torch.tensor(text).T
        prob = torch.softmax(logits, 1)
        d = g.predict(f.mean(0, keepdim=True))
        g.fit(f, prob)
        g.update()
        wv = torch.clamp(RHO * g.C.sum(1).mean() / f.size(0), max=ETA)
        dl = wv * d
        ec, ed = softmax_entropy_t(logits), softmax_entropy_t(dl)
        wc, wd = 1 / (ec + 1e-3), 1 / (ed + 1e-3)
        wc = wc / (wc + wd)
        wd = wd / (wc + wd)
        finals.append(wc * logits + wd * dl)
    theirs = torch.stack(finals).detach().numpy()[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
