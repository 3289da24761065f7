"""Optimized residual-loop variants vs current, isolated, slope-timed."""
import time
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

from uni_adapter_tpu.adapt import mode_dota, residual

S, K, M, D = 15, 1156, 4, 1024
KM = K * M
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


# ---------- optimized terms: mode-major columns, both needed layouts ----------
def terms_opt(st, epsilon):
    var = mode_dota.regularized_var(st, epsilon)          # (K, M, D)
    inv_v = 1.0 / var
    mu_over_v = st.mu / var
    quad_const = jnp.sum(st.mu * st.mu / var, axis=-1)    # (K, M)
    log_det = jnp.sum(jnp.log(var), axis=-1)              # (K, M)
    # mode-major: column index = m*K + j  -> (M, K, D) -> (MK, D)
    A = jnp.concatenate([jnp.transpose(inv_v, (1, 0, 2)).reshape(M * K, D),
                         jnp.transpose(-2.0 * mu_over_v, (1, 0, 2)).reshape(M * K, D)],
                        axis=1)                            # (MK, 2D)
    base_mm = (jnp.log(st.pi + 1e-10) - 0.5 * (log_det + quad_const)).T  # (M, K)
    return A, A.T, base_mm   # A for bwd (MK,2D), A.T materialized for fwd (2D,MK)


def make_lm_fn(A, At, base_mm, precision):
    """lm(X): (K,2D) -> (K,K) log-marginal, custom VJP, no in-loop transposes."""
    @jax.custom_vjp
    def lm_fn(X):
        maha = jnp.matmul(X, At, precision=precision)      # (K, MK)
        lj = base_mm[None].reshape(1, M, K) - 0.5 * maha.reshape(K, M, K)
        return jax.scipy.special.logsumexp(lj, axis=1)     # (K, K)

    def fwd(X):
        maha = jnp.matmul(X, At, precision=precision)
        lj = base_mm[None].reshape(1, M, K) - 0.5 * maha.reshape(K, M, K)
        lm = jax.scipy.special.logsumexp(lj, axis=1)
        return lm, (maha, lm)

    def bwd(resid, dlm):
        maha, lm = resid
        lj = base_mm[None].reshape(1, M, K) - 0.5 * maha.reshape(K, M, K)
        p = jnp.exp(lj - lm[:, None, :])                   # (K, M, K)
        dmaha = (-0.5) * (p * dlm[:, None, :]).reshape(K, M * K)
        dX = jnp.matmul(dmaha, A, precision=precision)     # (K, 2D)
        return (dX,)

    lm_fn.defvjp(fwd, bwd)
    return lm_fn


def loss_from_lm(lm):
    eye = jnp.eye(K, dtype=lm.dtype)
    lmn = lm / jnp.max(lm)
    e = jnp.exp(jnp.exp(lmn))
    d = (e * eye).sum(axis=1)
    return -(d / e.sum(axis=1)).mean() - (d / e.sum(axis=0)).mean()


def opt_variant(res, states):
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
            import optax
            return residual.ResidualState(optax.apply_updates(rs.residuals, updates), os)
        return jax.lax.fori_loop(0, STEPS, body, rs)
    out = jax.vmap(one)(res, states)
    return out.residuals.sum()


def cur_variant(res, states):
    def one(rs, st):
        return residual.optimize_residuals(rs, text, st, opt, 1e-4,
                                           num_steps=STEPS, precision=PREC)
    return jax.vmap(one)(res, states).residuals.sum()


def slope(fn):
    def chain(R):
        def f(res, states):
            def one_wrap(rs_st):
                pass
            def body(i, r):
                # note: fn itself consumes (res, states); to chain we must
                # re-run on same inputs — returns scalar; carry scalar sum
                return r + fn(res, states)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0))
        return jax.jit(f)
    f1, f3 = chain(1), chain(3)
    np.asarray(f1(res0, states)); np.asarray(f3(res0, states))
    t0 = time.perf_counter(); np.asarray(f1(res0, states)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(f3(res0, states)); d3 = time.perf_counter() - t0
    return (d3 - d1) / 2


# numerics check first (sequential application parity)
r_cur = jax.jit(lambda r, s: jax.vmap(
    lambda rs, st: residual.optimize_residuals(rs, text, st, opt, 1e-4,
                                               num_steps=STEPS, precision=jax.lax.Precision.HIGHEST))(r, s))(res0, states)
def opt_state_variant(res, states):
    def one(rs, st):
        A, At, base_mm = terms_opt(st, 1e-4)
        lm_fn = make_lm_fn(A, At, base_mm, jax.lax.Precision.HIGHEST)
        def loss_fn(r):
            x = text + r
            x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
            X = jnp.concatenate([x * x, x], axis=1)
            return loss_from_lm(lm_fn(X))
        gf = jax.grad(loss_fn)
        import optax
        def body(i, rs):
            g = gf(rs.residuals)
            updates, os = opt.update(g, rs.opt_state, rs.residuals)
            return residual.ResidualState(optax.apply_updates(rs.residuals, updates), os)
        return jax.lax.fori_loop(0, STEPS, body, rs)
    return jax.vmap(one)(res, states)
r_opt = jax.jit(opt_state_variant)(res0, states)
diff = np.abs(np.asarray(r_cur.residuals) - np.asarray(r_opt.residuals)).max()
scale = np.abs(np.asarray(r_cur.residuals)).max()
print(f"residuals max|diff| {diff:.3e} (max|r| {scale:.3e})", flush=True)

print(f"current  : {slope(cur_variant)*1e3:.1f} ms/call", flush=True)
print(f"optimized: {slope(opt_variant)*1e3:.1f} ms/call", flush=True)
