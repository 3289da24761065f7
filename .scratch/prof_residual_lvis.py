"""Profile optimize_residuals in isolation at LVIS scale (K=1156, M=4).

Decomposes the 10-step Adam loop's cost per precision tier, fetch-synced
on a SINGLE scalar per run (uniform tunnel round-trip cost).  Serial TPU
process (memory: axon-tpu-timing); run with no other host load.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
import optax

from uni_adapter_tpu.adapt import mode_dota, residual

K, D, M = 1156, 1024, 4
STEPS = 10

rng = np.random.default_rng(0)
text = rng.standard_normal((K, D)).astype(np.float32)
text /= np.linalg.norm(text, axis=1, keepdims=True)
mix = mode_dota.init(1e-3, 0.004, D, K, jnp.asarray(text).T, num_modes=M)
opt = residual.make_optimizer()
rs0 = residual.init(jnp.asarray(text), opt)

def timed(fn, *args, reps=10):
    fn(*args).block_until_ready()          # compile
    float(np.asarray(fn(*args)))           # fetch-sync warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts)//2]

for tier, prec in [("highest", jax.lax.Precision.HIGHEST),
                   ("high", jax.lax.Precision.HIGH),
                   ("default", jax.lax.Precision.DEFAULT)]:
    @jax.jit
    def full(rs, t, m, prec=prec):
        out = residual.optimize_residuals(rs, t, m, opt, 1e-3,
                                          num_steps=STEPS, precision=prec)
        return out.residuals.sum()
    t_full = timed(full, rs0, jnp.asarray(text), mix)

    @jax.jit
    def dots_only(t, m, prec=prec):
        terms = residual.frozen_mixture_terms(m, 1e-3)
        proj = terms.proj
        X = jnp.concatenate([t * t, t], axis=1)
        acc = jnp.zeros((K, K), jnp.float32)
        accX = jnp.zeros_like(X)
        dn_f = (((1,), (1,)), ((), ()))
        dn_b = (((1,), (0,)), ((), ()))
        def body(i, carry):
            acc, accX = carry
            for mm in range(M):
                s = jax.lax.dot_general(X + accX.sum() * 0, proj[mm], dn_f,
                                        precision=prec)
                acc = acc + s
                accX = accX + jax.lax.dot_general(s, proj[mm], dn_b,
                                                  precision=prec)
            return acc, accX
        acc, accX = jax.lax.fori_loop(0, STEPS, body, (acc, accX))
        return acc.sum() + accX.sum()
    t_dots = timed(dots_only, jnp.asarray(text), mix)

    print(f"{tier:8s} full min/med={t_full[0]*1e3:7.2f}/{t_full[1]*1e3:7.2f} ms"
          f"  dots min/med={t_dots[0]*1e3:7.2f}/{t_dots[1]*1e3:7.2f} ms"
          f"  tail={100*(1-t_dots[0]/t_full[0]):4.1f}%")
