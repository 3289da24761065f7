"""Converter rules for the REAL published checkpoint layouts (VERDICT r1
next-step #3), each proven by a torch twin in that exact naming:

  * timm EVA02 fused variants — `attn.qkv` + `q_bias`/`v_bias`, fused
    `mlp.w12`/`w3`, `mlp.ffn_ln`, `rope.freqs_*` buffers
    (the layout of the published Uni3D `uni3d-L` checkpoints;
    reference consumption at utils/load_models.py:41-62).
  * OpenAI/open_clip CLIP text towers — `text.transformer.resblocks.*`,
    `attn.in_proj_*`/`out_proj`, `mlp.c_fc`/`c_proj`, `token_embedding`,
    `text_projection` (reference: utils/load_models.py:64-105 +
    models/ulip/text_encoder.py).
  * OpenShape PPTA — `module.ppat.transformer.layers.N.{0,1}.fn.*`,
    `sa.mlp_convs/mlp_bns`, `lift.{0,2}` (reference:
    models/openshape/ppta.py state_dict layout).

Every twin runs strict overlay (no missing, no unexpected keys) and an
activation-level forward comparison.
"""
import os

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.loader import (convert_state_dict,
                                           load_torch_state_dict,
                                           overlay_params)


def _save(tmp_path, name, sd):
    path = os.path.join(tmp_path, name)
    torch.save({"module." + k: v for k, v in sd.items()}, path)
    return path


def _overlay_strict(model, init_args, path):
    params = model.init(jax.random.PRNGKey(0), *init_args)
    converted = convert_state_dict(load_torch_state_dict(path))
    return overlay_params(params, converted, strict=True)


# ---------------------------------------------------------------------------
# 1. timm EVA02 fused layout (qkv fused + q/v bias, mlp.w12/w3, ffn_ln, rope)
# ---------------------------------------------------------------------------

DIM, HEADS, HID = 32, 4, 24


class TimmFusedEvaBlock(tnn.Module):
    """torch twin in timm's FUSED EVA02 naming."""

    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM)
        self.norm2 = tnn.LayerNorm(DIM)

        class A(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(DIM, DIM * 3, bias=False)
                self.q_bias = tnn.Parameter(torch.randn(DIM) * 0.1)
                self.v_bias = tnn.Parameter(torch.randn(DIM) * 0.1)
                hd = DIM // HEADS
                self.q_norm = tnn.LayerNorm(hd)
                self.k_norm = tnn.LayerNorm(hd)
                self.proj = tnn.Linear(DIM, DIM)
                # rope buffers exist in the published checkpoints but are
                # inactive in the reference forward (point_encoder.py:217)
                self.register_buffer("rope_freqs", torch.randn(8, 2),
                                     persistent=False)

            def forward(self, x):
                B, T, C = x.shape
                hd = C // HEADS
                k_bias = torch.zeros(DIM)
                qkv = torch.nn.functional.linear(
                    x, self.qkv.weight,
                    torch.cat([self.q_bias, k_bias, self.v_bias]))
                q, k, v = qkv.chunk(3, dim=-1)
                sh = (B, T, HEADS, hd)
                q = self.q_norm(q.reshape(sh)).permute(0, 2, 1, 3)
                k = self.k_norm(k.reshape(sh)).permute(0, 2, 1, 3)
                v = v.reshape(sh).permute(0, 2, 1, 3)
                attn = torch.softmax((q @ k.transpose(-2, -1)) * hd ** -0.5,
                                     -1)
                return self.proj(
                    (attn @ v).permute(0, 2, 1, 3).reshape(B, T, C))

        class M(tnn.Module):
            def __init__(self):
                super().__init__()
                self.w12 = tnn.Linear(DIM, HID * 2)
                self.ffn_ln = tnn.LayerNorm(HID)
                self.w3 = tnn.Linear(HID, DIM)

            def forward(self, x):
                x1, x2 = self.w12(x).chunk(2, dim=-1)   # (gate, value)
                return self.w3(self.ffn_ln(
                    torch.nn.functional.silu(x1) * x2))

        self.attn = A()
        self.mlp = M()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


def test_timm_fused_eva_layout(tmp_path):
    from uni_adapter_tpu.models.common import EvaBlock

    torch.manual_seed(0)
    tm = TimmFusedEvaBlock().eval()
    path = _save(tmp_path, "eva_fused.pt", tm.state_dict())

    model = EvaBlock(DIM, HEADS, mlp_ratio=HID / DIM, dtype=jnp.float32)
    x = np.random.default_rng(0).standard_normal((2, 9, DIM)).astype(
        np.float32)
    params = _overlay_strict(model, (jnp.asarray(x),), path)

    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 2. open_clip text tower (text.transformer.resblocks.*, in_proj, c_fc, ...)
# ---------------------------------------------------------------------------

TW, TH, TL, TV, TC, TE = 32, 4, 2, 64, 16, 20


class OpenClipTextTwin(tnn.Module):
    """torch twin in open_clip's CustomTextCLIP `text.*` naming."""

    def __init__(self):
        super().__init__()

        class Block(tnn.Module):
            def __init__(self):
                super().__init__()
                self.ln_1 = tnn.LayerNorm(TW)
                self.ln_2 = tnn.LayerNorm(TW)
                self.attn = tnn.MultiheadAttention(TW, TH, batch_first=True)
                mlp = tnn.Module()
                mlp.c_fc = tnn.Linear(TW, TW * 4)
                mlp.c_proj = tnn.Linear(TW * 4, TW)
                self.mlp = mlp

            def forward(self, x, mask):
                a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                                 attn_mask=mask, need_weights=False)
                x = x + a
                h = self.mlp.c_fc(self.ln_2(x))
                h = h * torch.sigmoid(1.702 * h)        # QuickGELU
                return x + self.mlp.c_proj(h)

        class Transformer(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resblocks = tnn.ModuleList([Block() for _ in range(TL)])

        class Text(tnn.Module):
            def __init__(self):
                super().__init__()
                self.token_embedding = tnn.Embedding(TV, TW)
                self.positional_embedding = tnn.Parameter(
                    torch.randn(TC, TW) * 0.01)
                self.transformer = Transformer()
                self.ln_final = tnn.LayerNorm(TW)
                self.text_projection = tnn.Linear(TW, TE, bias=False)

            def forward(self, toks):
                x = self.token_embedding(toks) + self.positional_embedding
                mask = torch.full((TC, TC), float("-inf")).triu(1)
                for blk in self.transformer.resblocks:
                    x = blk(x, mask)
                x = self.ln_final(x)
                pooled = x[torch.arange(x.shape[0]), toks.argmax(dim=-1)]
                return self.text_projection(pooled)

        self.text = Text()

    def forward(self, toks):
        return self.text(toks)


def test_open_clip_text_layout(tmp_path):
    from uni_adapter_tpu.models.clip_text import TextEncoder

    torch.manual_seed(1)
    tm = OpenClipTextTwin().eval()
    path = _save(tmp_path, "clip_text.pt", tm.state_dict())

    model = TextEncoder(vocab_size=TV, width=TW, layers=TL, heads=TH,
                        context_length=TC, embed_dim=TE, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    toks = rng.integers(1, TV, (3, TC)).astype(np.int32)
    toks[:, -1] = TV - 1                      # EOT = highest id
    params = _overlay_strict(model, (jnp.asarray(toks),), path)

    ours = np.asarray(model.apply(params, jnp.asarray(toks)))
    with torch.no_grad():
        theirs = tm(torch.tensor(toks, dtype=torch.long)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 3. OpenShape PPTA layout (module.ppat.*, transformer.layers.N.{0,1}.fn.*)
# ---------------------------------------------------------------------------

PD, PH, PHD, PMLP, PSA, PATCH, NSAMP = 24, 2, 64, 48, 20, 8, 8


class OpenShapeTwin(tnn.Module):
    """torch twin in the reference OpenShape naming; consumes PRE-GROUPED
    set-abstraction inputs so both sides share geometry (grouping is
    oracle-tested separately in test_geometry)."""

    def __init__(self):
        super().__init__()

        class SA(tnn.Module):
            def __init__(self):
                super().__init__()
                self.mlp_convs = tnn.ModuleList([
                    tnn.Conv2d(6 + 3, 64, 1), tnn.Conv2d(64, 64, 1),
                    tnn.Conv2d(64, PSA, 1)])
                self.mlp_bns = tnn.ModuleList([
                    tnn.BatchNorm2d(64), tnn.BatchNorm2d(64),
                    tnn.BatchNorm2d(PSA)])

            def forward(self, grouped):        # (B, C+3, nsample, npoint)
                x = grouped
                for conv, bn in zip(self.mlp_convs, self.mlp_bns):
                    x = torch.relu(bn(conv(x)))
                return torch.max(x, 2)[0]      # (B, PSA, npoint)

        class Attention(tnn.Module):
            def __init__(self):
                super().__init__()
                inner = PH * PHD
                self.to_qkv = tnn.Linear(PD, inner * 3, bias=False)
                self.to_out = tnn.Sequential(tnn.Linear(inner, PD))

            def forward(self, x):
                B, T, _ = x.shape
                qkv = self.to_qkv(x).chunk(3, dim=-1)
                q, k, v = (t.reshape(B, T, PH, PHD).permute(0, 2, 1, 3)
                           for t in qkv)
                attn = torch.softmax(
                    (q @ k.transpose(-2, -1)) * PHD ** -0.5, -1)
                out = (attn @ v).permute(0, 2, 1, 3).reshape(B, T, PH * PHD)
                return self.to_out(out)

        class FeedForward(tnn.Module):
            def __init__(self):
                super().__init__()
                self.net = tnn.Sequential(
                    tnn.Linear(PD, PMLP), tnn.GELU(), tnn.Dropout(0.0),
                    tnn.Linear(PMLP, PD), tnn.Dropout(0.0))

            def forward(self, x):
                return self.net(x)

        class PreNorm(tnn.Module):
            def __init__(self, fn):
                super().__init__()
                self.norm = tnn.LayerNorm(PD)
                self.fn = fn

            def forward(self, x):
                return self.fn(self.norm(x))

        class Transformer(tnn.Module):
            def __init__(self):
                super().__init__()
                self.layers = tnn.ModuleList([
                    tnn.ModuleList([PreNorm(Attention()),
                                    PreNorm(FeedForward())])
                    for _ in range(2)])

            def forward(self, x):
                for attn, ff in self.layers:
                    x = attn(x) + x
                    x = ff(x) + x
                return x

        class PPAT(tnn.Module):
            def __init__(self):
                super().__init__()
                self.sa = SA()
                self.lift = tnn.Sequential(
                    tnn.Conv1d(PSA + 3, PD, 1),
                    tnn.Identity(),           # the permute Lambda
                    tnn.LayerNorm([PD]))
                self.cls_token = tnn.Parameter(torch.randn(PD))
                self.transformer = Transformer()

            def forward(self, grouped, centroids):
                feat = self.sa(grouped)                       # (B, PSA, S)
                x = torch.cat([centroids.transpose(1, 2), feat], dim=1)
                x = self.lift[2](self.lift[0](x).permute(0, 2, 1))
                cls = self.cls_token.expand(x.shape[0], 1, -1)
                x = torch.cat([cls, x], dim=1)
                return self.transformer(x)[:, 0]

        self.ppat = PPAT()
        self.proj = tnn.Linear(PD, 16)

    def forward(self, grouped, centroids):
        return self.proj(self.ppat(grouped, centroids))


def test_openshape_ppta_layout(tmp_path):
    from uni_adapter_tpu.models.ppta import PPTAPreset, Projected
    from uni_adapter_tpu.ops.geometry import sample_and_group

    torch.manual_seed(2)
    tm = OpenShapeTwin().eval()
    for mod in tm.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.2)
            mod.running_var.uniform_(0.5, 1.5)
    path = _save(tmp_path, "openshape.pt", tm.state_dict())

    preset = PPTAPreset(dim=PD, depth=2, heads=PH, mlp_dim=PMLP, sa_dim=PSA,
                        patches=PATCH, prad=0.6, nsamp=NSAMP)
    model = Projected(preset=preset, out_channel=16, in_dim=6,
                      dtype=jnp.float32)   # dim_head fixed at 64 (reference)
    rng = np.random.default_rng(3)
    N = 64
    xyz = rng.standard_normal((2, N, 3)).astype(np.float32) * 0.3
    features = np.concatenate([xyz, np.ones_like(xyz)], -1).astype(np.float32)
    params = _overlay_strict(
        model, (jnp.asarray(xyz), jnp.asarray(features)), path)

    ours = np.asarray(model.apply(params, jnp.asarray(xyz),
                                  jnp.asarray(features)))

    # torch side consumes the SAME grouping (rel-xyz ‖ features, channels
    # first) the flax SetAbstraction computes internally
    new_xyz, new_points = sample_and_group(PATCH, 0.6, NSAMP,
                                           jnp.asarray(xyz),
                                           jnp.asarray(features))
    grouped = torch.tensor(np.asarray(new_points)).permute(0, 3, 2, 1)
    with torch.no_grad():
        theirs = tm(grouped, torch.tensor(np.asarray(new_xyz))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Conversion-report CLI (VERDICT r2 item 6)
# ---------------------------------------------------------------------------

def test_conversion_report_clean_and_diffed(tmp_path, capsys):
    """conversion_report on a twin checkpoint: clean for the matching
    layout; names missing keys / unexpected keys / shape mismatches when
    the checkpoint disagrees with the model."""
    from uni_adapter_tpu.models.common import EvaBlock
    from uni_adapter_tpu.models.loader import (conversion_report,
                                               print_conversion_report)

    torch.manual_seed(1)
    tm = TimmFusedEvaBlock().eval()
    path = _save(tmp_path, "eva_report.pt", tm.state_dict())
    model = EvaBlock(DIM, HEADS, mlp_ratio=HID / DIM, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, DIM), jnp.float32))
    converted = convert_state_dict(load_torch_state_dict(path))

    rep = conversion_report(params, converted)
    assert not rep["missing"] and not rep["unexpected"]
    assert not rep["shape_mismatches"]
    assert len(rep["converted"]) == rep["n_model_leaves"]
    print_conversion_report(rep)
    assert "STRICT" not in capsys.readouterr().out  # report has no verdict

    # corrupt the checkpoint: drop one key, add a stray one, break a shape
    sd = load_torch_state_dict(path)
    sd.pop("attn.proj.bias")
    sd["stray.weight"] = np.zeros((3, 3), np.float32)
    sd["mlp.w3.weight"] = np.zeros((DIM, HID + 1), np.float32)
    rep2 = conversion_report(params, convert_state_dict(sd))
    assert any(p.endswith("attn/proj/bias") for p in rep2["missing"])
    assert any("stray" in k for k in rep2["unexpected"])
    assert any(p.endswith("mlp/fc2/kernel")
               for p, _, _, _ in rep2["shape_mismatches"])


def test_conversion_report_cli_entrypoint(tmp_path):
    """`python -m uni_adapter_tpu.models.loader <ckpt> --vlm3d clip_text`
    runs end-to-end and reports diffs (twin tower is tiny → mostly missing,
    exit code 1; the point is the artifact, not a clean match)."""
    import subprocess
    import sys

    torch.manual_seed(2)
    tm = OpenClipTextTwin().eval()
    path = _save(tmp_path, "report_cli.pt", tm.state_dict())
    proc = subprocess.run(
        [sys.executable, "-m", "uni_adapter_tpu.models.loader", path,
         "--vlm3d", "clip_text", "--text-preset", "ulip",
         "--device", "cpu"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 1, proc.stderr
    assert "model leaves:" in proc.stdout
    assert "STRICT OVERLAY: DIFFS FOUND" in proc.stdout
