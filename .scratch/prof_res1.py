"""Isolated LVIS-scale residual-loop profile (round 3 slope probe).

Times optimize_residuals alone (vmapped over S=15 streams, K=1156, M=4,
D=1024, 10 Adam steps) with scan-chained fetch-synced timing, and controls:
  - matmul-only body (fwd+VJP matmuls, no elementwise chain)
  - elementwise-only body (no matmuls: maha_x faked)
to decompose the ~211 ms/step non-matmul overhead seen end-to-end.
"""
import time
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from uni_adapter_tpu.adapt import mode_dota, residual

S, K, M, D = 15, 1156, 4, 1024
STEPS = 10
rng = np.random.default_rng(0)

t = rng.standard_normal((K, D)).astype(np.float32)
text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))

# per-stream mixture states (vmapped init)
def mk_state(key):
    w = jax.random.normal(key, (D, K)) * 0.03
    st = mode_dota.init(1e-4, 1e-4, D, K, (text.T + w), num_modes=M)
    # perturb so states differ per stream
    return st._replace(var=st.var * (1.0 + 0.01 * jax.random.uniform(key)))

keys = jax.random.split(jax.random.PRNGKey(0), S)
states = jax.vmap(mk_state)(keys)

opt = residual.make_optimizer()
res0 = jax.vmap(lambda _: residual.init(text, opt))(jnp.arange(S))

PREC = jax.lax.Precision.HIGH


def timeit(name, fn, *args, reps=8):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # warm + sync
    t0 = time.perf_counter()
    out = f(*args)
    s = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


# --- A. the real thing (fori_loop, HIGH) ---
def run_real(res, states):
    def one(rs, st):
        return residual.optimize_residuals(rs, text, st, opt, 1e-4,
                                           num_steps=STEPS, precision=PREC)
    out = jax.vmap(one)(res, states)
    return out.residuals.sum()

# --- B. matmul-only control: 10 steps of fwd+VJP matmuls, minimal epilogue ---
def run_matmul_only(res, states):
    def one(rs, st):
        terms = residual.frozen_mixture_terms(st, 1e-4)
        def body(i, r):
            x = text + r
            X = jnp.concatenate([x * x, x], axis=1)
            maha = jnp.matmul(X, terms.proj_t, precision=PREC)      # (K, KM)
            g = maha * 1e-6                                          # fake dmaha
            dX = jnp.matmul(g, terms.proj_t.T, precision=PREC)       # (K, 2D)
            return r + 1e-3 * (dX[:, D:] + 2 * x * dX[:, :D])
        return jax.lax.fori_loop(0, STEPS, body, rs.residuals)
    return jax.vmap(one)(res, states).sum()

# --- C. elementwise-only control: full loss chain + grad but tiny matmul ---
def run_elem_only(res, states):
    def one(rs, st):
        terms = residual.frozen_mixture_terms(st, 1e-4)
        base = terms.base
        fake_proj = terms.proj_t[:2]                 # (2, KM): tiny contraction
        def loss_fn(r):
            x = text + r
            x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
            X = jnp.concatenate([x * x, x], axis=1)[:, :2]
            maha = jnp.matmul(X, fake_proj, precision=PREC)
            lj = base[None] - 0.5 * maha.reshape(-1, K, M)
            lm = jax.scipy.special.logsumexp(lj, axis=2)
            lmn = lm / jnp.max(lm)
            e = jnp.exp(jnp.exp(lmn))
            diag = jnp.diagonal(e)
            return -(diag / e.sum(axis=1)).mean() - (diag / e.sum(axis=0)).mean()
        gf = jax.grad(loss_fn)
        def body(i, r):
            return r - 1e-3 * gf(r)
        return jax.lax.fori_loop(0, STEPS, body, rs.residuals)
    return jax.vmap(one)(res, states).sum()

# --- D. frozen_mixture_terms alone (is the hoisted part cheap?) ---
def run_terms_only(res, states):
    def one(rs, st):
        terms = residual.frozen_mixture_terms(st, 1e-4)
        return terms.proj_t.sum() + terms.base.sum()
    return jax.vmap(one)(res, states).sum()


timeit("terms_only (once)", run_terms_only, res0, states)
timeit("matmul_only (10 steps)", run_matmul_only, res0, states)
timeit("elem_only  (10 steps)", run_elem_only, res0, states)
timeit("real HIGH  (10 steps)", run_real, res0, states)
