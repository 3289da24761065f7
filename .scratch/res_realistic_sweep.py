"""Sweep: does text-residual learning help at realistic embedding dims?

Round-5 verdict item 1.  Scaled stream: K class means on a Fibonacci
sphere in the toy encoder's 3-d input space (each class has ~6 nearest
neighbours — the crowded-confusion geometry of a real K=40 label set,
unlike the 1-D ring which degenerates at K>8), corruption = one coherent
global rotation by THETA_FRAC x the nearest-neighbour spacing
(systematic, recoverable anchor misalignment), per-sample jitter.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.data.synthetic_stream import ToyEncoder


def fib_sphere(K):
    i = np.arange(K, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / K)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], 1).astype(np.float32)


def rot_matrix(axis, angle):
    axis = axis / np.linalg.norm(axis)
    a, b, c = axis
    Kx = np.array([[0, -c, b], [c, 0, -a], [-b, a, 0]], np.float64)
    return (np.eye(3) + np.sin(angle) * Kx
            + (1 - np.cos(angle)) * (Kx @ Kx)).astype(np.float32)


def nn_spacing(means):
    G = means @ means.T
    np.fill_diagonal(G, -2.0)
    return float(np.mean(np.arccos(np.clip(G.max(1), -1, 1))))


def make_problem_scaled(seed, K=40, D=512, N=64, T=480,
                        THETA_FRAC=0.45, JITTER=0.10, TAU=0.03):
    rng = np.random.default_rng(seed)
    m_clean = fib_sphere(K)
    sp = nn_spacing(m_clean)
    R = rot_matrix(rng.standard_normal(3), THETA_FRAC * sp)
    m_corrupt = m_clean @ R.T
    W = rng.standard_normal((3, D)).astype(np.float32)
    text = np.sin(m_clean) @ W
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    y = rng.integers(0, K, (T, 1)).astype(np.int64)
    centers = m_corrupt[y[:, 0]] \
        + JITTER * sp * rng.standard_normal((T, 3)).astype(np.float32)
    pcs = centers[:, None, None, :] + TAU * rng.standard_normal(
        (T, 1, N, 3)).astype(np.float32)
    return pcs.astype(np.float32), y, text.astype(np.float32), W


def zero_shot_acc(pcs, targets, text, W):
    feat = np.sin(pcs[:, 0]).mean(axis=1) @ W
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    pred = (feat @ text.T).argmax(axis=1)
    return float(100.0 * np.mean(pred == targets[:, 0]))


def mode_config(res_learning, lr=1e-3):
    dc = DotaConfig(use_mode_dota=True, mode_M=4, res_learning=res_learning,
                    residual_lr=lr, epsilon=1e-4, sigma=1e-4, rho=0.02,
                    eta=0.1, noise_std=0.0, fp16_predict_input=True)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig(shot_capacity=30, threshold=0.5,
                                    lambda_reg=0.11, beta=150.0))


def run(cfg, text, pcs, targets, W):
    model = ToyEncoder(W)
    rgbs = np.ones_like(pcs)
    _, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets.astype(np.int32)))
    final = np.asarray(outs.final_logits)[:, 0]
    return float(100.0 * np.mean(final.argmax(-1) == targets[:, 0]))


def calibrate():
    for tf in [0.35, 0.45, 0.55]:
        for jit in [0.08, 0.12]:
            for seed in [17, 5]:
                pcs, targets, text, W = make_problem_scaled(
                    seed, THETA_FRAC=tf, JITTER=jit)
                zs = zero_shot_acc(pcs, targets, text, W)
                off = run(mode_config(False), text, pcs, targets, W)
                print(f"tf={tf} jit={jit} seed={seed}: "
                      f"zs={zs:.1f} off={off:.1f}", flush=True)


def sweep(tf, jit):
    for K, D in [(40, 512), (40, 1024), (64, 512)]:
        for seed in [17, 5]:
            pcs, targets, text, W = make_problem_scaled(
                seed, K=K, D=D, THETA_FRAC=tf, JITTER=jit)
            zs = zero_shot_acc(pcs, targets, text, W)
            off = run(mode_config(False), text, pcs, targets, W)
            row = [f"K={K} D={D} seed={seed}: zs={zs:.1f} off={off:.1f}"]
            for lr in [1e-3, 3e-4, 1e-4, 3e-5]:
                on = run(mode_config(True, lr), text, pcs, targets, W)
                row.append(f"on@{lr:g}={on:.1f}")
            print("  ".join(row), flush=True)


def seeds_check():
    for seed in [17, 5, 23, 41, 3]:
        pcs, targets, text, W = make_problem_scaled(
            seed, K=40, D=1024, THETA_FRAC=0.55, JITTER=0.12)
        zs = zero_shot_acc(pcs, targets, text, W)
        off = run(mode_config(False), text, pcs, targets, W)
        hi = run(mode_config(True, 1e-3), text, pcs, targets, W)
        lo = run(mode_config(True, 3e-5), text, pcs, targets, W)
        print(f"seed={seed}: zs={zs:.1f} off={off:.1f} "
              f"on@1e-3={hi:.1f} on@3e-5={lo:.1f}", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "seeds":
        seeds_check()
    elif sys.argv[1] == "cal":
        calibrate()
    else:
        sweep(float(sys.argv[1]), float(sys.argv[2]))
