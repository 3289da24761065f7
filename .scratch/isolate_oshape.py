import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.ppta import create_openshape
from uni_adapter_tpu.ops.geometry import query_ball_point, sample_and_group
from uni_adapter_tpu.ops.ballquery_pallas import query_ball_pallas
from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched
from uni_adapter_tpu.ops.geometry import farthest_point_sample, index_points

rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.standard_normal((4, 1024, 3)), jnp.float32)
feats = jnp.concatenate([xyz, jnp.ones_like(xyz)], -1)

# 1) ball query standalone, normal data, r=0.2 (vitg14 preset)
ctr = index_points(xyz, farthest_point_sample(xyz, 384))
bq_x = query_ball_point(0.2, 64, xyz, ctr)
bq_p = query_ball_pallas(0.2, 64, xyz, ctr)
print("ballq exact:", bool(jnp.all(bq_x == bq_p)),
      "ndiff:", int(jnp.sum(bq_x != bq_p)), flush=True)

# 2) FPS pallas vs xla on this data
f_x = farthest_point_sample(xyz, 384)
f_p = fps_pallas_batched(xyz, 384)
print("fps equal:", bool(jnp.all(f_x == f_p)), flush=True)

# 3) sample_and_group full
sx = sample_and_group(384, 0.2, 64, xyz, feats, use_pallas_fps=False)
sp = sample_and_group(384, 0.2, 64, xyz, feats, use_pallas_fps=False,
                      use_pallas_ballq=True)
print("s&g xyz equal:", bool(jnp.all(sx[0] == sp[0])),
      "pts equal:", bool(jnp.all(sx[1] == sp[1])), flush=True)

# 4) full forward kernels on/off (attention on/off separately)
for (fps, bq, attn) in [(True, True, True), (False, False, True),
                        (True, True, False), (False, True, False),
                        (True, False, False)]:
    cfg = ModelConfig(vlm3d="openshape", use_pallas_fps=fps,
                      use_pallas_knn=True, use_pallas_ballq=bq,
                      use_pallas_attention=attn)
    model = create_openshape(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xyz, feats)
    out = np.asarray(model.apply(params, xyz, feats))
    print(f"fps={fps} ballq={bq} attn={attn}: out[0,:4]={out[0,:4]}", flush=True)
