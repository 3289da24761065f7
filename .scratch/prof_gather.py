"""one-hot gather precision: HIGHEST vs HIGH — exactness and speed."""
import time
import numpy as np
import jax, jax.numpy as jnp

B, N, GM, C = 30, 1024, 16384, 6
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, (B, GM)), jnp.int32)

def gather(points, idx, prec):
    onehot = jax.nn.one_hot(idx, N, dtype=jnp.float32)
    return jnp.einsum("bgn,bnc->bgc", onehot, points, precision=prec)

def timed(f, *a, reps=20):
    def chain(*a):
        def body(c, _):
            r = f(a[0] + c*0, a[1])
            return jnp.sum(r).astype(jnp.float32)*1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*a)); t0=time.perf_counter(); _=np.asarray(cf(*a))
    return (time.perf_counter()-t0)/reps*1e3

want = np.asarray(jnp.take_along_axis(pts, idx[..., None], axis=1))
for prec in ["highest", "high", "default"]:
    p = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
         "default": jax.lax.Precision.DEFAULT}[prec]
    got = np.asarray(jax.jit(lambda x, i: gather(x, i, p))(pts, idx))
    print(f"{prec}: {timed(lambda x,i: gather(x,i,p), pts, idx):.2f} ms  exact={(got==want).all()}", flush=True)
print(f"take_along_axis: {timed(lambda x,i: jnp.take_along_axis(x, i[...,None], axis=1), pts, idx):.2f} ms", flush=True)
