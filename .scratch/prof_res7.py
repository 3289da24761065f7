"""Slope-timed comparison: thread ResidualState through chained calls."""
import time
import jax, jax.numpy as jnp
import numpy as np
import optax

from uni_adapter_tpu.adapt import mode_dota, residual
import importlib.util
spec = importlib.util.spec_from_file_location("p6", "/root/repo/.scratch/prof_res6.py")

S, K, M, D = 15, 1156, 4, 1024
STEPS = 10
rng = np.random.default_rng(0)
t = rng.standard_normal((K, D)).astype(np.float32)
text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))

def mk_state(key):
    w = jax.random.normal(key, (D, K)) * 0.03
    return mode_dota.init(1e-4, 1e-4, D, K, (text.T + w), num_modes=M)

states = jax.vmap(mk_state)(jax.random.split(jax.random.PRNGKey(0), S))
opt = residual.make_optimizer()
res0 = jax.vmap(lambda _: residual.init(text, opt))(jnp.arange(S))
PREC = jax.lax.Precision.HIGH

# --- import the optimized pieces from prof_res6 by exec of its defs ---
src = open("/root/repo/.scratch/prof_res6.py").read()
# extract only the function defs we need
import re
ns = {"jax": jax, "jnp": jnp, "np": np, "mode_dota": mode_dota,
      "residual": residual, "S": S, "K": K, "M": M, "D": D, "KM": K*M,
      "STEPS": STEPS, "text": text, "opt": opt, "PREC": PREC,
      "partial": __import__("functools").partial}
for name in ["terms_opt", "make_lm_fn", "loss_from_lm"]:
    m = re.search(rf"\ndef {name}.*?(?=\n\ndef |\n\n# )", src, re.S)
    exec(m.group(0), ns)
terms_opt, make_lm_fn, loss_from_lm = ns["terms_opt"], ns["make_lm_fn"], ns["loss_from_lm"]

def step_cur(res, states):
    def one(rs, st):
        return residual.optimize_residuals(rs, text, st, opt, 1e-4,
                                           num_steps=STEPS, precision=PREC)
    return jax.vmap(one)(res, states)

def step_opt(res, states):
    def one(rs, st):
        A, At, base_mm = terms_opt(st, 1e-4)
        lm_fn = make_lm_fn(A, At, base_mm, PREC)
        def loss_fn(r):
            x = text + r
            x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
            X = jnp.concatenate([x * x, x], axis=1)
            return loss_from_lm(lm_fn(X))
        gf = jax.grad(loss_fn)
        def body(i, rs):
            g = gf(rs.residuals)
            updates, os = opt.update(g, rs.opt_state, rs.residuals)
            return residual.ResidualState(optax.apply_updates(rs.residuals, updates), os)
        return jax.lax.fori_loop(0, STEPS, body, rs)
    return jax.vmap(one)(res, states)

def slope(step, label):
    def chain(R):
        @jax.jit
        def f(res, states):
            def body(i, rs):
                return step(rs, states)
            return jax.lax.fori_loop(0, R, body, res).residuals.sum()
        return f
    f1, f3 = chain(1), chain(3)
    np.asarray(f1(res0, states)); np.asarray(f3(res0, states))
    t0 = time.perf_counter(); np.asarray(f1(res0, states)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(f3(res0, states)); d3 = time.perf_counter() - t0
    per = (d3 - d1) / 2
    print(f"{label}: {per*1e3:.1f} ms/call ({per/STEPS*1e3:.2f} ms/step)", flush=True)

slope(step_cur, "current  ")
slope(step_opt, "optimized")
