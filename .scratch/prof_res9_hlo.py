"""Dump optimized HLO for the integrated LVIS-scale vmapped engine step and
summarise the residual while-body: every op >= 8 MB output, grouped by kind.
Finds leftover relayout copies / re-materialised operands after the
custom-VJP rewrite (round 3)."""
import re
import sys
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu import engine
from uni_adapter_tpu.models.uni3d import create_uni3d

prec = sys.argv[1] if len(sys.argv) > 1 else "high"
rng = np.random.default_rng(0)
K = 1156
cfg = Config(model=ModelConfig(vlm3d="uni3d", use_pallas_fps=True,
                               use_pallas_knn=True),
             dota=DotaConfig(use_mode_dota=True, mode_M=4,
                             res_learning=True, residual_precision=prec))
model = create_uni3d(cfg.model)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 1024, 6), jnp.float32))
t = rng.standard_normal((K, 1024)).astype(np.float32)
text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))
S, T = 15, 2
pcs = jnp.asarray(rng.standard_normal((T, S, 1, 1024, 3)), jnp.float32)
rgbs = jnp.ones_like(pcs)
tgt = jnp.asarray(rng.integers(0, K, (T, S, 1)), jnp.int32)
scan_fn = jax.jit(engine.make_vmapped_scan_fn(cfg, model))
states = engine.init_states_vmapped(cfg, text, S, seed=1)
lowered = scan_fn.lower(params, text, states, pcs, rgbs, tgt)
hlo = lowered.compile().as_text()
print(f"total HLO lines: {len(hlo.splitlines())}", flush=True)

# find the while body computation that contains the residual fori_loop
# (identified by dot ops with 4624 in their shape)
blocks = re.split(r"\n(?=%?\w[\w.\-]* \(|ENTRY )", hlo)
shape_re = re.compile(r"(bf16|f32|s32|pred)\[([0-9,]*)\]")

def nbytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * (2 if dt == "bf16" else 4)

for blk in blocks:
    header = blk.splitlines()[0] if blk else ""
    if "1156,1156]" not in blk or "region" not in header:
        continue
    big = []
    for ln in blk.splitlines():
        ln = ln.strip()
        m = shape_re.match(ln.split(" = ", 1)[1]) if " = " in ln else None
        if not m:
            continue
        sz = nbytes(m)
        if sz >= 8 * 2**20:
            op = re.search(r"= \S+ (\w+)", ln)
            big.append((sz, op.group(1) if op else "?", ln[:160]))
    if big:
        print(f"\n=== computation: {header[:100]} ({len(big)} ops >=8MB)")
        from collections import Counter
        cnt = Counter(k for _, k, _ in big)
        tot = sum(s for s, _, _ in big)
        print(f"  total bytes of >=8MB outputs: {tot/2**20:.0f} MB; kinds: {dict(cnt)}")
        for sz, k, ln in sorted(big, reverse=True)[:12]:
            print(f"  {sz/2**20:7.1f} MB {k:12s} {ln}")
