import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.serve import TTAServer

model = Uni3D(trans_dim=64, embed_dim=48, num_group=32, group_size=16,
              encoder_dim=32, depth=2, num_heads=4, dtype=jnp.float32)
cfg = Config(model=ModelConfig(compute_dtype="float32"),
             dota=DotaConfig(use_mode_dota=True, mode_M=4,
                             res_learning=False))
rng = np.random.default_rng(0)
text = rng.standard_normal((40, 48)).astype(np.float32)
text /= np.linalg.norm(text, axis=1, keepdims=True)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 1024, 6), jnp.float32))
# any bf16 params?
for p, l in jax.tree_util.tree_leaves_with_path(params):
    if l.dtype == jnp.bfloat16:
        print("BF16 param:", jax.tree_util.keystr(p))
server = TTAServer(cfg, model, params, jnp.asarray(text), sizes=(1, 2, 4),
                   seed=0)
for cid in ["a", "b", "c"]:
    server.register(cid)
reqs = [(c, rng.standard_normal((1, 1024, 3)).astype(np.float32), None)
        for c in ["a", "b", "c"]]
out = server.submit(reqs)
print("tiny submit ok", flush=True)
