"""Slope-timed residual loop (chain R applications of optimize_residuals) +
optional HLO dump. Subtracting the fixed ~30ms dispatch cost via two Rs."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

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


def chain(R):
    def fn(res, states):
        def one_stream(rs, st):
            def body(i, rs):
                return residual.optimize_residuals(rs, text, st, opt, 1e-4,
                                                   num_steps=STEPS,
                                                   precision=PREC)
            return jax.lax.fori_loop(0, R, body, rs)
        out = jax.vmap(one_stream)(res, states)
        return out.residuals.sum()
    return jax.jit(fn)


def run(R):
    f = chain(R)
    np.asarray(f(res0, states))
    t0 = time.perf_counter()
    np.asarray(f(res0, states))
    return time.perf_counter() - t0

if "--dump" in sys.argv:
    import os
    f = chain(1)
    print(jax.jit(lambda r, s: f(r, s)).lower(res0, states).compile()
          .as_text()[:0])  # force compile under dump flags
    print("dumped")
else:
    d1 = run(1)
    d3 = run(3)
    per = (d3 - d1) / 2
    print(f"R=1 {d1*1e3:.1f} ms, R=3 {d3*1e3:.1f} ms -> per-call "
          f"{per*1e3:.1f} ms ({per/STEPS*1e3:.2f} ms/Adam-step)", flush=True)
