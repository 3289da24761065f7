"""Probe: raw elementwise BW + mode-major lse layout fix + loss-chain rewrite."""
import time
import jax, jax.numpy as jnp
import numpy as np

S, K, M, D = 15, 1156, 4, 1024
KM = K * M
STEPS = 10
rng = np.random.default_rng(0)

maha0 = jnp.asarray(rng.standard_normal((S, K, KM)).astype(np.float32))
base = jnp.asarray(rng.standard_normal((S, K, M)).astype(np.float32))
base_mm = jnp.asarray(np.moveaxis(np.asarray(base), 2, 1).copy())  # (S,M,K)
lm0 = jnp.asarray(rng.standard_normal((S, K, K)).astype(np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    np.asarray(f(*args)).ravel()[:1]
    t0 = time.perf_counter()
    np.asarray(f(*args)).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


# --- 0. raw BW: 10 passes over 320 MB ---
def p_raw(x):
    def body(i, x):
        return x * 1.0000001 + 1e-9
    return jax.lax.fori_loop(0, STEPS, body, x).sum()
timeit("raw mul 320MB x10", p_raw, maha0)

def p_raw80(x):
    def body(i, x):
        return x * 1.0000001 + 1e-9
    return jax.lax.fori_loop(0, STEPS, body, x).sum()
timeit("raw mul 80MB x10", p_raw80, lm0)

# --- 1. lse over M, mode-major layout: maha (K, M, K), reduce axis 1 ---
def p_lse_mm(maha, b):
    def one(mh, bm):
        def loss(m):
            lj = bm[None, :, :] - 0.5 * m.reshape(K, M, K)
            lm = jax.scipy.special.logsumexp(lj, axis=1)
            return lm.sum()
        g = jax.grad(loss)
        def body(i, m):
            return m - 1e-6 * g(m)
        return jax.lax.fori_loop(0, STEPS, body, mh).sum()
    return jax.vmap(one)(maha, b).sum()
timeit("lse mode-major  (10)", p_lse_mm, maha0, base_mm)

# --- 2. manual lse mode-major (max+exp+sum+log, explicit slices over M) ---
def p_lse_manual(maha, b):
    def one(mh, bm):
        def loss(m):
            lj = bm[None, :, :] - 0.5 * m.reshape(K, M, K)
            mx = jnp.max(lj, axis=1)
            s = jnp.sum(jnp.exp(lj - mx[:, None, :]), axis=1)
            lm = mx + jnp.log(s)
            return lm.sum()
        g = jax.grad(loss)
        def body(i, m):
            return m - 1e-6 * g(m)
        return jax.lax.fori_loop(0, STEPS, body, mh).sum()
    return jax.vmap(one)(maha, b).sum()
timeit("lse manual mm   (10)", p_lse_manual, maha0, base_mm)

# --- 3. loss chain rewrite: diag via iota mask, single fused reductions ---
def p_loss2(lm_in):
    eye = jnp.eye(K, dtype=jnp.float32)
    def one(lm_s):
        def loss(lm):
            mx = jnp.max(lm)
            e = jnp.exp(jnp.exp(lm / mx))
            r = e.sum(axis=1)
            c = e.sum(axis=0)
            d = (e * eye).sum(axis=1)
            return -(d / r).mean() - (d / c).mean()
        g = jax.grad(loss)
        def body(i, lm):
            return lm - 1e-6 * g(lm)
        return jax.lax.fori_loop(0, STEPS, body, lm_s).sum()
    return jax.vmap(one)(lm_in).sum()
timeit("loss iota-diag  (10)", p_loss2, lm0)

# --- 4. loss chain with custom 2-pass vjp (recompute e in bwd) ---
@jax.custom_vjp
def loss_chain(lm):
    mx = jnp.max(lm)
    e1 = jnp.exp(lm / mx)
    e = jnp.exp(e1)
    r = e.sum(axis=1)
    c = e.sum(axis=0)
    d = (e * jnp.eye(K, dtype=lm.dtype)).sum(axis=1)
    return -(d / r).mean() - (d / c).mean()

def _fwd(lm):
    mx = jnp.max(lm)
    e1 = jnp.exp(lm / mx)
    e = jnp.exp(e1)
    r = e.sum(axis=1)
    c = e.sum(axis=0)
    d = (e * jnp.eye(K, dtype=lm.dtype)).sum(axis=1)
    loss = -(d / r).mean() - (d / c).mean()
    return loss, (lm, mx, r, c, d)

def _bwd(resid, g):
    lm, mx, r, c, d = resid
    eye = jnp.eye(K, dtype=lm.dtype)
    # de_ij = g * [ -(eye_ij/r_i - d_i 1/r_i^2 [j term])... ] derive:
    # L = -(1/K) sum_i d_i/r_i - (1/K) sum_j d_j/c_j
    # dL/de_ij = -(1/K)[ eye_ij/r_i - d_i/(r_i^2) ]  (row term)
    #            -(1/K)[ eye_ij/c_j - d_j/(c_j^2) * eye? no: c_j = sum_i e_ij,
    #             d_j/c_j term: d(d_j)/de_ij = eye_ij; d(c_j)/de_ij = 1 ]
    # row: -(1/K)(eye_ij * (1/r_i + 1/c_j) - d_i/r_i^2 - d_j/c_j^2)
    e1 = jnp.exp(lm / mx)
    e = jnp.exp(e1)
    de = -(1.0 / K) * (eye * (1.0 / r[:, None] + 1.0 / c[None, :])
                       - d[:, None] / (r ** 2)[:, None]
                       - d[None, :] / (c ** 2)[None, :])
    dlmn = g * de * e * e1
    s = jnp.sum(dlmn * lm)
    dlm = dlmn / mx
    # d/dmx: lmn = lm/mx -> dmx = -s/mx^2 routed to argmax of lm
    flat = jnp.argmax(lm)
    dlm = dlm.reshape(-1).at[flat].add(-s / (mx * mx) * 0 + (-jnp.sum(dlmn * lm) / (mx * mx))).reshape(lm.shape)
    return (dlm,)

loss_chain.defvjp(_fwd, _bwd)

def p_loss3(lm_in):
    def one(lm_s):
        g = jax.grad(loss_chain)
        def body(i, lm):
            return lm - 1e-6 * g(lm)
        return jax.lax.fori_loop(0, STEPS, body, lm_s).sum()
    return jax.vmap(one)(lm_in).sum()
timeit("loss custom-vjp (10)", p_loss3, lm0)
