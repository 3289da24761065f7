import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B,H,N,hd = 30,6,513,64
n_pad, hd_pad = 640, 128
scale = hd ** -0.5
rng = np.random.default_rng(0)
q,k,v = (jnp.asarray(rng.standard_normal((B,H,N,hd)), jnp.bfloat16) for _ in range(3))

def make_kernel(mask, scalepos):
    def kern(q_ref,k_ref,v_ref,o_ref):
        G = q_ref.shape[1]
        if mask=="where":
            col = jax.lax.broadcasted_iota(jnp.int32,(n_pad,n_pad),1)
            key_pad = col >= N
        for h in range(G):
            qh,kh,vh = q_ref[0,h],k_ref[0,h],v_ref[0,h]
            if scalepos=="q":
                qh = (qh.astype(jnp.float32)*scale).astype(qh.dtype)
            s = jax.lax.dot_general(qh,kh,(((1,),(1,)),((),())),preferred_element_type=jnp.float32)
            if scalepos=="s":
                s = s*scale
            if mask=="where":
                s = jnp.where(key_pad, jnp.float32(-3e4), s)
            m = jnp.max(s,axis=1,keepdims=True)
            e = (s-m)*scale if scalepos=="exp" else (s-m)
            p = jnp.exp(e)
            o = jax.lax.dot_general(p.astype(vh.dtype),vh,(((1,),(0,)),((),())),preferred_element_type=jnp.float32)
            o = o/jnp.sum(p,axis=1,keepdims=True)
            o_ref[0,h] = o.astype(o_ref.dtype)
    return kern

def build(mask, scalepos):
    def f(q,k,v):
        pad = lambda x: jnp.pad(x,((0,0),(0,0),(0,n_pad-N),(0,hd_pad-hd)))
        qp,kp,vp = pad(q),pad(k),pad(v)
        if mask=="lane":
            qp = qp.at[:,:,:,hd].set(jnp.asarray(1.0,qp.dtype))
            kp = kp.at[:,:,N:,hd].set(jnp.asarray(-3e4,kp.dtype))
        spec = pl.BlockSpec((1,H,n_pad,hd_pad), lambda b:(b,0,0,0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(make_kernel(mask,scalepos), grid=(B,),
            in_specs=[spec]*3, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B,H,n_pad,hd_pad), v.dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100*1024*1024))(qp,kp,vp)
        return out[:,:,:N,:hd]
    return f

def chain(fn, reps=24):
    def g(q,k,v):
        def body(c,_):
            o = fn(q + c.astype(q.dtype)*0, k, v)
            return jnp.mean(o).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    return jax.jit(g)

def timed(fn,*a):
    _ = np.asarray(fn(*a)); t0=time.perf_counter(); _=np.asarray(fn(*a))
    return (time.perf_counter()-t0)/24*1e3

# reference output for correctness
def ref(q,k,v):
    s = jnp.einsum('bhnd,bhmd->bhnm', q.astype(jnp.float32), k.astype(jnp.float32))*scale
    return jnp.einsum('bhnm,bhmd->bhnd', jax.nn.softmax(s,-1).astype(v.dtype), v)
want = np.asarray(jax.jit(ref)(q,k,v)).astype(np.float32)

combos = [("where","s"),("where","exp"),("lane","exp"),("lane","s"),("lane","q")]
for trial in range(2):
    row=[]
    for mask,sp in combos:
        f = build(mask,sp)
        err = np.abs(np.asarray(jax.jit(f)(q,k,v)).astype(np.float32)-want).max()
        t = timed(chain(f), q,k,v)
        row.append(f"{mask}/{sp} {t:.2f}ms(err{err:.1e})")
    print(f"trial{trial}: " + " | ".join(row), flush=True)
