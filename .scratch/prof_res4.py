"""Characterize per-iteration fixed overhead: fori vs scan vs unroll; 1 vs 2
fusions per iteration; size scaling."""
import time
import jax, jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
big = jnp.asarray(rng.standard_normal((15, 1156, 1156)).astype(np.float32))
sml = jnp.asarray(rng.standard_normal((15, 128, 128)).astype(np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    np.asarray(f(*args)).ravel()[:1]
    t0 = time.perf_counter()
    np.asarray(f(*args)).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


def mk_fori(n, nfuse):
    def fn(x):
        def body(i, x):
            for _ in range(nfuse):
                # force separate fusions with a reduction barrier
                s = x.sum()
                x = x * 1.0000001 + s * 1e-20
            return x
        return jax.lax.fori_loop(0, n, body, x).sum()
    return fn

def mk_unroll(n, nfuse):
    def fn(x):
        for i in range(n):
            for _ in range(nfuse):
                s = x.sum()
                x = x * 1.0000001 + s * 1e-20
        return x.sum()
    return fn

timeit("fori  n=10 f=1 80MB", mk_fori(10, 1), big)
timeit("fori  n=20 f=1 80MB", mk_fori(20, 1), big)
timeit("fori  n=10 f=3 80MB", mk_fori(10, 3), big)
timeit("unrol n=10 f=1 80MB", mk_unroll(10, 1), big)
timeit("unrol n=10 f=3 80MB", mk_unroll(10, 3), big)
timeit("fori  n=10 f=1 1MB ", mk_fori(10, 1), sml)
timeit("fori  n=40 f=1 1MB ", mk_fori(40, 1), sml)
timeit("unrol n=40 f=1 1MB ", mk_unroll(40, 1), sml)
