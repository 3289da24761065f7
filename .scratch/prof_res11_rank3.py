"""Variant E: rank-3 (B,M,K) dots with NO reshape — fwd dot_general outputs
(B,M,K) directly, bwd contracts {M,K} in ONE dot (vs M-split's 4 chained
partial accumulations, 3 extra 135MB writes per step).
Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/prof_res11_rank3.py [high|default|highest]
"""
import sys
import time
import jax, jax.numpy as jnp
import numpy as np
import optax

from uni_adapter_tpu.adapt import mode_dota, residual

S, K, M, D = 15, 1156, 4, 1024
STEPS = 10
prec_name = sys.argv[1] if len(sys.argv) > 1 else "high"
PREC = {"highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT}[prec_name]
rng = np.random.default_rng(0)
t = rng.standard_normal((K, D)).astype(np.float32)
text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))

def mk_state(key):
    w = jax.random.normal(key, (D, K)) * 0.03
    return mode_dota.init(1e-4, 1e-4, D, K, (text.T + w), num_modes=M)

states = jax.vmap(mk_state)(jax.random.split(jax.random.PRNGKey(0), S))
opt = residual.make_optimizer()
res0 = jax.vmap(lambda _: residual.init(text, opt))(jnp.arange(S))


def make_loss_rank3(proj3, base):
    # proj3: (M, K, 2D); base: (M, K)
    eye = jnp.eye(K, dtype=jnp.float32)
    dn_fwd = (((1,), (2,)), ((), ()))     # X(B,2D)·proj3(M,K,2D) → (B,M,K)
    dn_bwd = (((1, 2), (0, 1)), ((), ())) # dmaha(B,M,K)·proj3 → (B,2D)

    def _fwd(X):
        maha = jax.lax.dot_general(X, proj3, dn_fwd, precision=PREC)
        lj = base[None] - 0.5 * maha
        lm = jax.scipy.special.logsumexp(lj, axis=1)
        return lm, (maha, lm)

    @jax.custom_vjp
    def lm_fn(X):
        return _fwd(X)[0]

    def _bwd(resid, dlm):
        maha, lm = resid
        lj = base[None] - 0.5 * maha
        p = jnp.exp(lj - lm[:, None, :])
        dmaha = (-0.5) * (p * dlm[:, None, :])
        dX = jax.lax.dot_general(dmaha, proj3, dn_bwd, precision=PREC)
        return (dX,)

    lm_fn.defvjp(_fwd, _bwd)

    def loss_fn(r):
        x = text + r
        x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        X = jnp.concatenate([x * x, x], axis=1)
        lm = lm_fn(X)
        lmn = lm / jnp.max(lm)
        e = jnp.exp(jnp.exp(lmn))
        d = (e * eye).sum(axis=1)
        return -(d / e.sum(axis=1)).mean() - (d / e.sum(axis=0)).mean()
    return loss_fn


def step_rank3(res, states):
    def one(rs, st):
        terms = residual.frozen_mixture_terms(st, 1e-4)
        gf = jax.grad(make_loss_rank3(terms.proj, terms.base))
        def body(i, rs):
            g = gf(rs.residuals)
            updates, os = opt.update(g, rs.opt_state, rs.residuals)
            return residual.ResidualState(
                optax.apply_updates(rs.residuals, updates), os)
        return jax.lax.fori_loop(0, STEPS, body, rs)
    return jax.vmap(one)(res, states)


def step_current(res, states):
    def one(rs, st):
        return residual.optimize_residuals(rs, text, st, opt, 1e-4,
                                           num_steps=STEPS, precision=PREC)
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
    print(f"{label} [{prec_name}]: {per*1e3:.1f} ms/call ({per/STEPS*1e3:.2f} ms/step)",
          flush=True)


r_cur = jax.jit(step_current)(res0, states)
r_new = jax.jit(step_rank3)(res0, states)
print(f"max |diff| rank3-vs-msplit: "
      f"{float(jnp.max(jnp.abs(r_cur.residuals - r_new.residuals))):.3e}",
      flush=True)
slope(step_current, "M-split (current)")
slope(step_rank3,  "rank-3 single dots")
