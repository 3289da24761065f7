"""Keys-on-sublanes attention kernel probe: compute s^T = K·Q^T so the
softmax max/sum reduce over SUBLANES (cheap elementwise vreg chain) instead
of lanes (shuffle trees).  PV contracts p^T over its major axis — the MXU's
native lhs^T·rhs form, no transpose op.
Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/prof_attn_tr.py"""
import functools
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads


def _attn_tr_kernel(n_real: int, scale: float, mask_rows: bool,
                    q_ref, k_ref, v_ref, o_ref):
    Bg, G = q_ref.shape[0], q_ref.shape[1]
    nk = k_ref.shape[2]
    nq = q_ref.shape[2]
    if mask_rows:
        row = jax.lax.broadcasted_iota(jnp.int32, (nk, nq), 0)
        key_pad = row >= n_real
    for b in range(Bg):
        for h in range(G):
            q = q_ref[b, h, :, :]
            k = k_ref[b, h, :, :]
            v = v_ref[b, h, :, :]
            # s^T: (Nk, Nq) — keys on sublanes
            st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if mask_rows:
                m = jnp.max(jnp.where(key_pad, -jnp.inf, st), axis=0,
                            keepdims=True)
                pt = jnp.where(key_pad, 0.0, jnp.exp((st - m) * scale))
            else:
                m = jnp.max(st, axis=0, keepdims=True)
                pt = jnp.exp((st - m) * scale)
            s = jnp.sum(pt, axis=0, keepdims=True)          # (1, Nq)
            # o = p^T^T · v via contraction over the major axis of both
            o = jax.lax.dot_general(pt.astype(v.dtype), v,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = o / s.T
            o_ref[b, h, :, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "batch_group",
                                             "head_group"))
def attention_tr(q, k, v, scale=None, batch_group=1, head_group=8):
    B, H, N, hd = q.shape
    G = min(H, head_group)
    while H % G:
        G -= 1
    Bg = min(B, batch_group)
    while B % Bg:
        Bg -= 1
    scale = float(scale if scale is not None else hd ** -0.5)
    nq_pad = -(-N // 128) * 128     # queries now on the LANE axis
    nk_pad = -(-N // 8) * 8         # keys: sublane tile only
    hd_pad = -(-hd // 128) * 128

    def pad(x, n_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - N), (0, hd_pad - hd)))

    mask_rows = nk_pad != N
    qp, kp, vp = pad(q, nq_pad), pad(k, nk_pad), pad(v, nk_pad)

    def mkspec(n_pad):
        return pl.BlockSpec((Bg, G, n_pad, hd_pad),
                            lambda b, g: (b, g, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_tr_kernel, N, scale, mask_rows),
        grid=(B // Bg, H // G),
        in_specs=[mkspec(nq_pad), mkspec(nk_pad), mkspec(nk_pad)],
        out_specs=mkspec(nq_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, nq_pad, hd_pad), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, kp, vp)
    return out[:, :, :N, :hd]


def timed(f, *a, reps=30):
    def chain(*a):
        def body(c, _):
            r = f(*[x + (c * 0).astype(x.dtype) for x in a])
            return jnp.sum(r.astype(jnp.float32)) * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*a))
    t0 = time.perf_counter(); _ = np.asarray(cf(*a))
    return (time.perf_counter() - t0) / reps * 1e3


rng = np.random.default_rng(0)
for label, B, H, N, hd in [("ULIP (30,6,513,64)", 30, 6, 513, 64),
                           ("OpenShape (30,8,513,64)", 30, 8, 513, 64),
                           ("EVA02-L (30,16,513,64)", 30, 16, 513, 64)]:
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    ref = attention_pallas_heads(q, k, v)
    new = attention_tr(q, k, v)
    d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32))))
    base = timed(attention_pallas_heads, q, k, v)
    for bg in (1, 2):
        ms = timed(lambda q, k, v: attention_tr(q, k, v, batch_group=bg),
                   q, k, v)
        print(f"{label}: heads={base:.2f} ms, tr bg={bg}: {ms:.2f} ms "
              f"(maxdiff {d:.2e})", flush=True)
