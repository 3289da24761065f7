"""M-split residual loop probe: M separate (B,2D)@(2D,K) dots + (B,K)-only
elementwise lse, vs the current single (B,MK) dot whose (B,M,K) view forces
T(4,128)<->T(8,128) relayouts and materialised broadcasts (see prof_res9 HLO).
Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/prof_res10_msplit.py [high|default|highest]
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


def msplit_terms(st, epsilon):
    var = mode_dota.regularized_var(st, epsilon)           # (K, M, D)
    inv_v = 1.0 / var
    mu_over_v = st.mu / var
    quad_const = jnp.sum(st.mu * st.mu / var, axis=-1)     # (K, M)
    log_det = jnp.sum(jnp.log(var), axis=-1)
    # per-mode projection (M, K, 2D) and base (M, K)
    proj = jnp.concatenate([inv_v, -2.0 * mu_over_v], axis=-1)  # (K, M, 2D)
    proj = jnp.transpose(proj, (1, 0, 2))                  # (M, K, 2D)
    base = (jnp.log(st.pi + 1e-10) - 0.5 * (log_det + quad_const)).T  # (M, K)
    return proj, base


def make_loss_msplit(proj, base):
    eye = jnp.eye(K, dtype=jnp.float32)
    dn_fwd = (((1,), (1,)), ((), ()))    # X(B,2D) . proj_m(K,2D) over 2D
    dn_bwd = (((1,), (0,)), ((), ()))    # dmaha(B,K) . proj_m(K,2D) over K

    def _fwd(X):
        mahas = tuple(
            jax.lax.dot_general(X, proj[m], dn_fwd, precision=PREC)
            for m in range(M))                              # M x (B, K)
        ljs = tuple(base[m][None] - 0.5 * mahas[m] for m in range(M))
        mx = ljs[0]
        for m in range(1, M):
            mx = jnp.maximum(mx, ljs[m])
        sm = sum(jnp.exp(lj - mx) for lj in ljs)
        lm = mx + jnp.log(sm)
        return lm, (mahas, lm)

    @jax.custom_vjp
    def lm_fn(X):
        return _fwd(X)[0]

    def _bwd(resid, dlm):
        mahas, lm = resid
        dX = None
        for m in range(M):
            lj = base[m][None] - 0.5 * mahas[m]
            dmaha = (-0.5) * jnp.exp(lj - lm) * dlm         # (B, K)
            part = jax.lax.dot_general(dmaha, proj[m], dn_bwd, precision=PREC)
            dX = part if dX is None else dX + part
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


def step_msplit(res, states):
    def one(rs, st):
        proj, base = msplit_terms(st, 1e-4)
        gf = jax.grad(make_loss_msplit(proj, base))
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


# numeric check vs current implementation first (fp32-exact tier)
r_cur = jax.jit(step_current)(res0, states)
r_new = jax.jit(step_msplit)(res0, states)
diff = float(jnp.max(jnp.abs(r_cur.residuals - r_new.residuals)))
print(f"max |residual diff| current-vs-msplit after {STEPS} steps: {diff:.3e}",
      flush=True)


def make_loss_msplit2(proj, base):
    eye = jnp.eye(K, dtype=jnp.float32)
    dn_fwd = (((1,), (1,)), ((), ()))
    dn_bwd = (((1,), (0,)), ((), ()))

    def _fwd(X):
        mahas = tuple(
        jax.lax.dot_general(X, proj[m], dn_fwd, precision=PREC)
            for m in range(M))
        ljs = tuple(base[m][None] - 0.5 * mahas[m] for m in range(M))
        mx = ljs[0]
        for m in range(1, M):
            mx = jnp.maximum(mx, ljs[m])
        ems = tuple(jnp.exp(lj - mx) for lj in ljs)
        sm = sum(ems)
        lm = mx + jnp.log(sm)
        return lm, (ems, sm)

    @jax.custom_vjp
    def lm_fn(X):
        return _fwd(X)[0]

    def _bwd(resid, dlm):
        ems, sm = resid
        scale = (-0.5) * dlm / sm
        dX = None
        for m in range(M):
            dmaha = ems[m] * scale
            part = jax.lax.dot_general(dmaha, proj[m], dn_bwd, precision=PREC)
            dX = part if dX is None else dX + part
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


def step_msplit2(res, states):
    def one(rs, st):
        proj, base = msplit_terms(st, 1e-4)
        gf = jax.grad(make_loss_msplit2(proj, base))
        def body(i, rs):
            g = gf(rs.residuals)
            updates, os = opt.update(g, rs.opt_state, rs.residuals)
            return residual.ResidualState(
                optax.apply_updates(rs.residuals, updates), os)
        return jax.lax.fori_loop(0, STEPS, body, rs)
    return jax.vmap(one)(res, states)

r2 = jax.jit(step_msplit2)(res0, states)
print(f"max |diff| msplit2-vs-current: {float(jnp.max(jnp.abs(r_cur.residuals - r2.residuals))):.3e}", flush=True)
slope(step_current, "current (B,MK) custom-VJP")
slope(step_msplit,  "M-split (B,K) dots")
slope(step_msplit2, "M-split + em/sm residuals")
