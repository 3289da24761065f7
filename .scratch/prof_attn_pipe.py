"""Pipelined-head attention kernel variants vs the committed kernel."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads

def _kernel_pipe(n_real, scale, mask_mode, q_ref, k_ref, v_ref, o_ref):
    Bg, G, nq = q_ref.shape[0], q_ref.shape[1], q_ref.shape[2]
    nk = k_ref.shape[2]
    if mask_mode == "where":
        col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        key_pad = col >= n_real
    def qk(b, h):
        return jax.lax.dot_general(q_ref[b, h, :, :], k_ref[b, h, :, :],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    def out(b, h, s):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp((s - m) * scale)
        if mask_mode == "where":
            p = jnp.where(key_pad, 0.0, p)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b, h, :, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[b, h, :, :] = (o / jnp.sum(p, axis=1, keepdims=True)
                             ).astype(o_ref.dtype)
    flat = [(b, h) for b in range(Bg) for h in range(G)]
    s_prev = qk(*flat[0])
    for i in range(1, len(flat)):
        s_next = qk(*flat[i])       # MXU for head i while VPU does i-1
        out(*flat[i - 1], s_prev)
        s_prev = s_next
    out(*flat[-1], s_prev)

def pipe_attn(q, k, v, scale):
    B, H, N, hd = q.shape
    G = H
    nq_pad = -(-N // 8) * 8
    nk_pad = -(-N // 128) * 128
    hd_pad = -(-hd // 128) * 128
    def pad(x, n_pad):
        return jnp.pad(x, ((0,0),(0,0),(0,n_pad-N),(0,hd_pad-hd)))
    qp, kp, vp = pad(q, nq_pad), pad(k, nk_pad), pad(v, nk_pad)
    mm = "none" if nk_pad == N else "where"
    def mkspec(n_pad):
        return pl.BlockSpec((1, G, n_pad, hd_pad), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_pipe, N, scale, mm),
        grid=(B,),
        in_specs=[mkspec(nq_pad), mkspec(nk_pad), mkspec(nk_pad)],
        out_specs=mkspec(nq_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, nq_pad, hd_pad), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100*1024*1024),
    )(qp, kp, vp)
    return out[:, :, :N, :hd]

def timed(f, *args, reps=30):
    def chain(*a):
        def body(c, _):
            r = f(a[0] + c, *a[1:])
            return jnp.float32(jnp.sum(r.astype(jnp.float32))) * 1e-12, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*args))
    t0 = time.perf_counter(); _ = np.asarray(cf(*args))
    return (time.perf_counter() - t0) / reps * 1e3

rng = np.random.default_rng(0)
for (name, B, H, N, hd) in [("ulip", 30, 6, 513, 64), ("eva", 30, 16, 513, 64),
                            ("ppta", 30, 8, 385, 64)]:
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    sc = hd ** -0.5
    ref = attention_pallas_heads(q, k, v, sc)
    got = pipe_attn(q, k, v, sc)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    t_base = timed(lambda a,b,c: attention_pallas_heads(a,b,c,sc), q, k, v)
    t_pipe = timed(lambda a,b,c: pipe_attn(a,b,c,sc), q, k, v)
    print(f"{name}: base={t_base:.2f}ms pipe={t_pipe:.2f}ms maxdiff={err:.2e}", flush=True)
