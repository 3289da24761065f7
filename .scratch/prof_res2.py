"""Decompose the 234 ms elementwise cost of the residual loop.

Each probe isolates one stage (fwd+VJP via jax.grad) at LVIS shapes,
vmapped over S=15 streams, 10 fori_loop steps, fetch-synced.
"""
import time
import jax, jax.numpy as jnp
import numpy as np

S, K, M, D = 15, 1156, 4, 1024
KM = K * M
STEPS = 10
rng = np.random.default_rng(0)

text = jnp.asarray(rng.standard_normal((K, D)).astype(np.float32))
base = jnp.asarray(rng.standard_normal((S, K, M)).astype(np.float32))
maha0 = jnp.asarray(rng.standard_normal((S, K, KM)).astype(np.float32))
lm0 = jnp.asarray(rng.standard_normal((S, K, K)).astype(np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    np.asarray(f(*args)).ravel()[:1]
    t0 = time.perf_counter()
    np.asarray(f(*args)).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


# --- 1. lse over M: fwd+VJP on (K,KM)->(K,K) ---
def p_lse(maha, base):
    def one(mh, b):
        def loss(m):
            lj = b[None] - 0.5 * m.reshape(-1, K, M)
            lm = jax.scipy.special.logsumexp(lj, axis=2)
            return lm.sum()
        g = jax.grad(loss)
        def body(i, m):
            return m - 1e-6 * g(m)
        return jax.lax.fori_loop(0, STEPS, body, mh).sum()
    return jax.vmap(one)(maha, base).sum()

# --- 2. double-exp loss chain: fwd+VJP on (K,K) ---
def p_loss(lm_in):
    def one(lm_s):
        def loss(lm):
            lmn = lm / jnp.max(lm)
            e = jnp.exp(jnp.exp(lmn))
            diag = jnp.diagonal(e)
            return -(diag / e.sum(axis=1)).mean() - (diag / e.sum(axis=0)).mean()
        g = jax.grad(loss)
        def body(i, lm):
            return lm - 1e-6 * g(lm)
        return jax.lax.fori_loop(0, STEPS, body, lm_s).sum()
    return jax.vmap(one)(lm_in).sum()

# --- 3. normalize+concat head: fwd+VJP on (K,D)->(K,2D) ---
def p_head(r0):
    def one(r_s):
        def loss(r):
            x = text + r
            x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
            X = jnp.concatenate([x * x, x], axis=1)
            return X.sum()
        g = jax.grad(loss)
        def body(i, r):
            return r - 1e-6 * g(r)
        return jax.lax.fori_loop(0, STEPS, body, r_s).sum()
    return jax.vmap(one)(r0).sum()

# --- 4. combined 1+2 (lse + loss chain, as in the real loss) ---
def p_lse_loss(maha, base):
    def one(mh, b):
        def loss(m):
            lj = b[None] - 0.5 * m.reshape(-1, K, M)
            lm = jax.scipy.special.logsumexp(lj, axis=2)
            lmn = lm / jnp.max(lm)
            e = jnp.exp(jnp.exp(lmn))
            diag = jnp.diagonal(e)
            return -(diag / e.sum(axis=1)).mean() - (diag / e.sum(axis=0)).mean()
        g = jax.grad(loss)
        def body(i, m):
            return m - 1e-6 * g(m)
        return jax.lax.fori_loop(0, STEPS, body, mh).sum()
    return jax.vmap(one)(maha, base).sum()


r0 = jnp.zeros((S, K, D), jnp.float32)
timeit("head norm+concat (10)", p_head, r0)
timeit("lse over M       (10)", p_lse, maha0, base)
timeit("double-exp loss  (10)", p_loss, lm0)
timeit("lse+loss combined(10)", p_lse_loss, maha0, base)
