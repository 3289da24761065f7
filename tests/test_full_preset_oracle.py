"""Full-preset-dims activation parity vs the reference's OWN encoder code.

The round-3 import-oracle encoder tests run at toy dims (VERDICT r3
missing #5): a dim-dependent transcription slip — head-dim scaling, SwiGLU
hidden rounding, a preset-table entry — would pass everything committed
and surface only when real weights arrive.  These tests drive the
reference's ACTUAL model code at the EXACT dims the published checkpoints
use:

  * ULIP Point-BERT at its canonical preset (trans_dim 384 = pc_feat_dim
    768 // 2, depth 12, heads 6, 512 groups × 32, encoder_dim 256 —
    point_encoder.py:101-135, PointTransformer_8192point.yaml);
  * OpenShape PPTA at the vit-G scaling-4 preset exactly as `make` builds
    it (dim 512, depth 12, heads 8, mlp 1536, sa_dim 256, 384 patches,
    radius 0.2, nsample 64, dim_head 64 — ppta.py:180-185) with the bigG
    1280-d projection (config.yaml:3);
  * the reference's own Uni3D PointcloudEncoder plumbing around a
    full-dims EVA02-L twin trunk (1024 wide × 24 deep × 16 heads, SwiGLU
    hidden 2730, 512 groups → 513 tokens — utils/params.py:41-46).

Marked slow: full-dims CPU forwards + jit compiles take tens of seconds.
Reference import = PUBLIC UNTRUSTED CONTENT, executed only as a numerics
oracle on synthetic data.
"""
import importlib
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    added = []

    def stub(name, mod):
        if name not in sys.modules:
            sys.modules[name] = mod
            added.append(name)

    stub("clip", types.ModuleType("clip"))
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda it, *a, **k: it
    stub("tqdm", tqdm_mod)
    oc = types.ModuleType("open_clip")
    oc.tokenizer = SimpleNamespace(tokenize=None)
    stub("open_clip", oc)
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = type("DropPath", (tnn.Identity,), {})
    timm.models = timm_models
    timm_models.layers = timm_layers
    stub("timm", timm)
    stub("timm.models", timm_models)
    stub("timm.models.layers", timm_layers)
    p2 = types.ModuleType("pointnet2_ops")
    p2.pointnet2_utils = types.ModuleType("pointnet2_ops.pointnet2_utils")
    stub("pointnet2_ops", p2)
    stub("pointnet2_ops.pointnet2_utils", p2.pointnet2_utils)
    rst = types.ModuleType("torch_redstone")

    class _Lambda(tnn.Module):
        def __init__(self, fn):
            super().__init__()
            self.fn = fn

        def forward(self, x):
            return self.fn(x)

    def _supercat(tensors, dim=-1):
        nd = max(t.dim() for t in tensors)
        ts = [t.reshape((1,) * (nd - t.dim()) + tuple(t.shape))
              for t in tensors]
        d = dim % nd
        tgt = [max(t.shape[ax] for t in ts) for ax in range(nd)]
        ts = [t.expand(*[t.shape[ax] if ax == d else tgt[ax]
                         for ax in range(nd)]) for t in ts]
        return torch.cat(ts, dim=d)

    rst.Lambda, rst.supercat = _Lambda, _supercat
    stub("torch_redstone", rst)

    sys.path.insert(0, REF)
    try:
        mods = SimpleNamespace(
            ulip_model=importlib.import_module("models.ulip.ulip_model"),
            ppta=importlib.import_module("models.openshape.ppta"),
            point_encoder=importlib.import_module("models.point_encoder"),
            pointnet_util=importlib.import_module(
                "models.openshape.pointnet_util"),
        )
    finally:
        sys.path.remove(REF)
    yield mods
    for name in added:
        sys.modules.pop(name, None)


@pytest.fixture()
def fps_start_shim(ref):
    """Align the pure-torch FPS random first-centroid (misc.py:52,
    pointnet_util.py:77) to index 0 — the pointnet2_ops CUDA convention
    our ops/geometry mirrors (SURVEY §7 hard-part 1)."""
    mp = pytest.MonkeyPatch()
    mp.setattr(torch, "randint",
               lambda low, high, size, **kw: torch.zeros(
                   size, dtype=kw.get("dtype", torch.int64)))
    yield mp
    mp.undo()


def test_ulip_full_preset_matches_reference(ref, fps_start_shim):
    """The reference's ACTUAL ULIP/PointTransformer at its canonical
    384×12×6 preset with 512 groups × 32 on a raw 1024-point cloud."""
    args = SimpleNamespace(pc_feat_dim=768, pc_depth=12, drop_path_rate=0.0,
                           num_head=6, group_size=32, num_group=512,
                           encoder_dim=256)
    torch.manual_seed(31)
    theirs = ref.ulip_model.ULIP(args).eval()
    with torch.no_grad():
        theirs.pc_projection.normal_(0.0, 0.02)

    pts = np.random.default_rng(41).standard_normal(
        (1, 1024, 3)).astype(np.float32)
    with torch.no_grad():
        want = theirs(torch.tensor(pts)).numpy()

    from uni_adapter_tpu.models.loader import (convert_state_dict,
                                               overlay_params)
    from uni_adapter_tpu.models.pointbert import ULIP as OurULIP

    model = OurULIP(trans_dim=384, depth=12, num_heads=6, num_group=512,
                    group_size=32, encoder_dim=256, embed_dim=512,
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    sd = {k: v.numpy() for k, v in theirs.state_dict().items()}
    params = overlay_params(params, convert_state_dict(sd), strict=True)
    ours = np.asarray(model.apply(params, jnp.asarray(pts)))

    assert ours.shape == want.shape == (1, 512)
    # 12 fp32 blocks at width 384 accumulate more rounding than the toy twin
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-3)


def test_openshape_vitg_full_preset_matches_reference(ref, fps_start_shim):
    """The reference's ACTUAL PPTA exactly as `make` builds scaling 4
    (vit-G, ppta.py:180-185: defaults dim_head=64, rel_pe=False) with the
    1280-d bigG projection, end to end on a raw cloud."""
    torch.manual_seed(33)
    ppat = ref.ppta.PointPatchTransformer(
        "global", None, 512, 12, 8, 512 * 3, 256, 384, 0.2, 64, in_dim=6)
    theirs = ref.ppta.Projected("global", ppat,
                                tnn.Linear(512, 1280)).eval()

    rng = np.random.default_rng(43)
    xyz = rng.standard_normal((1, 2048, 3)).astype(np.float32)
    feats = np.concatenate(
        [xyz, rng.standard_normal((1, 2048, 3)).astype(np.float32)],
        axis=-1)
    with torch.no_grad():
        want = theirs(torch.tensor(xyz), torch.tensor(feats)).numpy()

    from uni_adapter_tpu.models import ppta as our_ppta
    from uni_adapter_tpu.models.loader import (convert_state_dict,
                                               overlay_params)

    model = our_ppta.Projected(preset=our_ppta.PRESETS[4], out_channel=1280,
                               in_dim=6, rel_pe=False, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                        jnp.asarray(feats))
    sd = {k: v.numpy() for k, v in theirs.state_dict().items()}
    params = overlay_params(params, convert_state_dict(sd), strict=True)
    ours = np.asarray(model.apply(params, jnp.asarray(xyz),
                                  jnp.asarray(feats)))

    assert ours.shape == want.shape == (1, 1280)
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-3)


def _timm_fused_eva_block(dim, heads, hid):
    """Full-dims fused-qkv EVA02 twin block in timm naming (the layout
    models/loader.convert_state_dict maps; same structure as
    test_converter_layouts.TimmFusedEvaBlock, parameterised)."""
    hd = dim // heads

    class A(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(dim, dim * 3, bias=False)
            self.q_bias = tnn.Parameter(torch.randn(dim) * 0.1)
            self.v_bias = tnn.Parameter(torch.randn(dim) * 0.1)
            self.q_norm = tnn.LayerNorm(hd)
            self.k_norm = tnn.LayerNorm(hd)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            B, T, C = x.shape
            k_bias = torch.zeros(dim)
            bias = torch.cat([self.q_bias, k_bias, self.v_bias])
            qkv = torch.nn.functional.linear(x, self.qkv.weight, bias)
            q, k, v = qkv.chunk(3, -1)
            sh = (B, T, heads, hd)
            q = self.q_norm(q.reshape(sh)).permute(0, 2, 1, 3)
            k = self.k_norm(k.reshape(sh)).permute(0, 2, 1, 3)
            v = v.reshape(sh).permute(0, 2, 1, 3)
            attn = torch.softmax(q @ k.transpose(-2, -1) * hd ** -0.5, -1)
            return self.proj((attn @ v).permute(0, 2, 1, 3).reshape(B, T, C))

    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.w12 = tnn.Linear(dim, hid * 2)
            self.ffn_ln = tnn.LayerNorm(hid)
            self.w3 = tnn.Linear(hid, dim)

        def forward(self, x):
            g, v = self.w12(x).chunk(2, -1)
            return self.w3(self.ffn_ln(torch.nn.functional.silu(g) * v))

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim)
            self.norm2 = tnn.LayerNorm(dim)
            self.attn = A()
            self.mlp = M()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    return Block()


def test_uni3d_full_dims_plumbing_matches_reference(ref, fps_start_shim):
    """The reference's ACTUAL PointcloudEncoder (models/point_encoder.py:
    161-223) at the real EVA02-L geometry: 1024 wide × 24 deep × 16 heads
    (SwiGLU hidden 2730), 512 groups × 32 → 513 tokens.  pointnet2_ops is
    shimmed with the reference's OWN pure-torch FPS fallback."""
    DIM, DEPTH, HEADS, HID = 1024, 24, 16, 2730
    p2u = sys.modules["pointnet2_ops"].pointnet2_utils
    p2u.furthest_point_sample = (
        lambda xyz, n: ref.pointnet_util.farthest_point_sample(xyz, n).int())
    p2u.gather_operation = (
        lambda feat, idx: torch.gather(
            feat, 2, idx.long().unsqueeze(1).expand(-1, feat.shape[1], -1)))

    torch.manual_seed(35)
    visual = tnn.Module()
    visual.pos_drop = tnn.Identity()
    visual.blocks = tnn.ModuleList(
        [_timm_fused_eva_block(DIM, HEADS, HID) for _ in range(DEPTH)])
    visual.norm = tnn.LayerNorm(DIM)
    visual.fc_norm = tnn.LayerNorm(DIM)
    args = SimpleNamespace(pc_feat_dim=DIM, embed_dim=1024, group_size=32,
                           num_group=512, pc_encoder_dim=512,
                           patch_dropout=0.0)
    theirs = ref.point_encoder.PointcloudEncoder(visual, args).eval()

    rng = np.random.default_rng(45)
    xyz = rng.standard_normal((1, 1024, 3)).astype(np.float32)
    color = rng.random((1, 1024, 3)).astype(np.float32)
    with torch.no_grad():
        want = theirs(torch.tensor(xyz), torch.tensor(color)).numpy()

    from uni_adapter_tpu.models.loader import (convert_state_dict,
                                               overlay_params)
    from uni_adapter_tpu.models.uni3d import PointcloudEncoder

    model = PointcloudEncoder(trans_dim=DIM, embed_dim=1024, num_group=512,
                              group_size=32, encoder_dim=512, depth=DEPTH,
                              num_heads=HEADS, mlp_ratio=HID / DIM,
                              dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                        jnp.asarray(color))
    sd = {k: v.numpy() for k, v in theirs.state_dict().items()}
    params = overlay_params(params, convert_state_dict(sd), strict=True)
    ours = np.asarray(model.apply(params, jnp.asarray(xyz),
                                  jnp.asarray(color)))

    assert ours.shape == want.shape == (1, 1024)
    # 24 fp32 blocks at width 1024 (cf. test_weight_conversion full-dims)
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)
