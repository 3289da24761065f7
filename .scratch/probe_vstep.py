import sys
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu import engine
from uni_adapter_tpu.models.uni3d import create_uni3d

V = int(sys.argv[1])
cfg = Config(model=ModelConfig(),
             dota=DotaConfig(use_mode_dota=True, mode_M=4, res_learning=True))
model = create_uni3d(cfg.model)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 1024, 6), jnp.float32))
rng = np.random.default_rng(0)
t = rng.standard_normal((40, 1024)).astype(np.float32)
text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))
step = engine.make_step_fn(cfg, model)
vstep = jax.jit(jax.vmap(step, in_axes=(None, None, 0, 0)))
states = engine.init_states_vmapped(cfg, text, V, seed=0)
pcs = jnp.asarray(rng.standard_normal((V, 1, 1024, 3)), jnp.float32)
batch = (pcs, jnp.ones_like(pcs), jnp.zeros((V, 1), jnp.int32))
s, outs = vstep(params, text, states, batch)
print(f"V={V}: ok", np.asarray(outs.final_logits).shape, flush=True)
