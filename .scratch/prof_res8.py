"""Single-operand variants: store only one projection layout, use dot_general
for both fwd and bwd. (a)=both layouts 22.1ms baseline, (b)=At only, (c)=A only."""
import time
import jax, jax.numpy as jnp
import numpy as np
import optax

from uni_adapter_tpu.adapt import mode_dota, residual

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


def base_terms(st, epsilon):
    var = mode_dota.regularized_var(st, epsilon)
    inv_v = 1.0 / var
    mu_over_v = st.mu / var
    quad_const = jnp.sum(st.mu * st.mu / var, axis=-1)
    log_det = jnp.sum(jnp.log(var), axis=-1)
    A = jnp.concatenate([jnp.transpose(inv_v, (1, 0, 2)).reshape(M * K, D),
                         jnp.transpose(-2.0 * mu_over_v, (1, 0, 2)).reshape(M * K, D)], axis=1)
    base_mm = (jnp.log(st.pi + 1e-10) - 0.5 * (log_det + quad_const)).T
    return A, base_mm


def make_loss(which, A_or_At, base_mm):
    eye = jnp.eye(K, dtype=jnp.float32)
    dn_fwd_At = (((1,), (0,)), ((), ()))   # X(K,2D) . At(2D,MK)
    dn_fwd_A  = (((1,), (1,)), ((), ()))   # X(K,2D) . A(MK,2D) over 2D -> (K,MK)
    dn_bwd_At = (((1,), (1,)), ((), ()))   # dmaha(K,MK) . At(2D,MK) over MK -> (K,2D)
    dn_bwd_A  = (((1,), (0,)), ((), ()))   # dmaha(K,MK) . A(MK,2D) -> (K,2D)

    @jax.custom_vjp
    def lm_fn(X):
        return _fwd(X)[0]

    def _fwd(X):
        if which == "At":
            maha = jax.lax.dot_general(X, A_or_At, dn_fwd_At, precision=PREC)
        else:
            maha = jax.lax.dot_general(X, A_or_At, dn_fwd_A, precision=PREC)
        lj = base_mm[None].reshape(1, M, K) - 0.5 * maha.reshape(K, M, K)
        lm = jax.scipy.special.logsumexp(lj, axis=1)
        return lm, (maha, lm)

    def _bwd(resid, dlm):
        maha, lm = resid
        lj = base_mm[None].reshape(1, M, K) - 0.5 * maha.reshape(K, M, K)
        p = jnp.exp(lj - lm[:, None, :])
        dmaha = (-0.5) * (p * dlm[:, None, :]).reshape(K, M * K)
        if which == "At":
            dX = jax.lax.dot_general(dmaha, A_or_At, dn_bwd_At, precision=PREC)
        else:
            dX = jax.lax.dot_general(dmaha, A_or_At, dn_bwd_A, precision=PREC)
        return (dX,)

    lm_fn.defvjp(lambda X: _fwd(X), _bwd)

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


def mk_step(which):
    def step(res, states):
        def one(rs, st):
            A, base_mm = base_terms(st, 1e-4)
            op = A.T if which == "At" else A
            loss_fn = make_loss(which, op, base_mm)
            gf = jax.grad(loss_fn)
            def body(i, rs):
                g = gf(rs.residuals)
                updates, os = opt.update(g, rs.opt_state, rs.residuals)
                return residual.ResidualState(optax.apply_updates(rs.residuals, updates), os)
            return jax.lax.fori_loop(0, STEPS, body, rs)
        return jax.vmap(one)(res, states)
    return step


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

slope(mk_step("At"), "At-only (2D,MK)")
slope(mk_step("A"),  "A-only  (MK,2D)")
