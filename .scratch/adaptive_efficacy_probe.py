"""Probe: is there a regime where the ADAPTIVE variant beats zero-shot
(and ideally the fixed-M adapters)?  Idea: a FRACTURE corruption makes
each class bimodal — half its samples drift toward each neighbour."""
import numpy as np
import jax.numpy as jnp
from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.data.synthetic_stream import ToyEncoder, K, D, N, DELTA, JITTER, TAU

T = 480

def make_fracture(seed, rot=0.45, steps=T):
    rng = np.random.default_rng(seed)
    e0 = np.array([1.0, 0.0, 0.0], np.float32)
    spacing = 2 * np.pi / K
    ang = spacing * np.arange(K)
    def ring_points(angles):
        r = np.stack([np.zeros(len(angles)), np.cos(angles), np.sin(angles)], 1).astype(np.float32)
        m = e0[None] + DELTA * r
        return m / np.linalg.norm(m, axis=1, keepdims=True)
    m_clean = ring_points(ang)
    m_up = ring_points(ang + rot * spacing)
    m_dn = ring_points(ang - rot * spacing)
    W = rng.standard_normal((3, D)).astype(np.float32)
    text = np.sin(m_clean) @ W
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    y = rng.integers(0, K, (steps, 1)).astype(np.int64)
    side = rng.integers(0, 2, steps)
    base = np.where(side[:, None] == 0, m_up[y[:, 0]], m_dn[y[:, 0]])
    centers = base + JITTER * DELTA * rng.standard_normal((steps, 3)).astype(np.float32)
    pcs = centers[:, None, None, :] + TAU * rng.standard_normal((steps, 1, N, 3)).astype(np.float32)
    return pcs.astype(np.float32), y, text.astype(np.float32), W

def zs(pcs, targets, text, W):
    feat = np.sin(pcs[:, 0]).mean(axis=1) @ W
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    return float(100.0 * np.mean((feat @ text.T).argmax(1) == targets[:, 0]))

def run(method, text, pcs, targets, W, **kw):
    dc = {
        "mode": DotaConfig(use_mode_dota=True, mode_M=4, res_learning=False,
                           epsilon=1e-4, sigma=1e-4, rho=0.02, eta=0.1,
                           noise_std=0.0, fp16_predict_input=True),
        "gmm": DotaConfig(use_dota=False, use_mode_dota=False, use_gmm_dota=True,
                          mode_M=4, epsilon=1e-4, sigma=1e-4, rho=0.02, eta=0.1),
        "adaptive": DotaConfig(use_dota=False, use_mode_dota=False,
                               use_adaptive_dota=True, mode_M=8,
                               epsilon=1e-4, sigma=1e-4, rho=0.02, eta=0.1),
    }[method]
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(shot_capacity=30, threshold=0.5,
                                   lambda_reg=0.11, beta=150.0))
    model = ToyEncoder(W)
    _, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(np.ones_like(pcs)), jnp.asarray(targets.astype(np.int32)))
    final = np.asarray(outs.final_logits)[:, 0]
    return float(100.0 * np.mean(final.argmax(-1) == targets[:, 0]))

for rot in (0.38, 0.45):
    for seed in (5, 17, 23):
        pcs, y, text, W = make_fracture(seed, rot=rot)
        z = zs(pcs, y, text, W)
        accs = {m: run(m, text, pcs, y, W) for m in ("mode", "gmm", "adaptive")}
        print(f"rot={rot} seed={seed}: zs={z:.1f} " +
              " ".join(f"{m}={a:.1f}({a-z:+.1f})" for m, a in accs.items()), flush=True)
