"""Model loading: random init or conversion from the reference's torch
checkpoints.

Rebuild of the reference's loader layer (utils/load_models.py:8-127): the
reference strips the training-era `module.` prefix and filters point-model
keys (:53-59, :70-99); here the same checkpoints (Uni3D `.pt`, ULIP SLIP
checkpoints) convert into flax parameter pytrees by an explicit name map.

Conversion rules (torch → flax):
  * Linear / Conv1d(k=1) / Conv2d(k=1) weight (out, in, …) → kernel (in, out)
  * LayerNorm weight/bias → scale/bias
  * BatchNorm running_mean/running_var/weight/bias → mean/var/scale/bias
    (folded into BatchNormInference — TTA always runs eval mode)
  * EVA02 per-block names: q_proj/k_proj/v_proj(+q_norm/k_norm), SwiGLU
    fc1_g/fc1_x/norm/fc2 — identical names in timm and models/common.py.

NOTE: the reference's OpenShape point-model loader is a stub
(`lm3d_model = None`, utils/load_models.py:126); here create_openshape
(models/ppta.py) is a complete model, and the converter covers its
checkpoint layout too.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np


def init_or_load_params(model, init_args: Sequence, checkpoint_path:
                        Optional[str], seed: int = 42):
    """Initialise flax params; overlay a converted checkpoint if given."""
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), *init_args)
    if checkpoint_path:
        state_dict = load_torch_state_dict(checkpoint_path)
        converted = convert_state_dict(state_dict)
        params = overlay_params(params, converted)
    return params


def build_backbone(vlm3d: str, mc, npoints: int = 1024):
    """Construct the point backbone for `vlm3d` with its init shapes and
    grouping geometry — the single dispatch point shared by the analysis
    CLIs and the conversion-report CLI (reference forward conventions:
    Uni_Adapter.py:53-67).

    Returns (model, init_args, num_group, group_size); num_group/group_size
    describe where the transformer tokens sit spatially (for the
    on-pointcloud attention overlays — PPTA tokens sit on the
    set-abstraction FPS centers, same FPS as group_points).
    """
    import jax.numpy as jnp

    if vlm3d == "ulip":
        from uni_adapter_tpu.models.pointbert import create_ulip
        model = create_ulip(mc)
        init_args = (jnp.zeros((1, npoints, 3), jnp.float32),)
        num_group, group_size = mc.num_group, mc.ulip_group_size
    elif vlm3d == "openshape":
        from uni_adapter_tpu.models.ppta import create_openshape
        model = create_openshape(mc)
        init_args = (jnp.zeros((1, npoints, 3), jnp.float32),
                     jnp.zeros((1, npoints, 6), jnp.float32))
        num_group, group_size = model.preset.patches, model.preset.nsamp
    elif vlm3d == "uni3d":
        from uni_adapter_tpu.models.uni3d import create_uni3d
        model = create_uni3d(mc)
        init_args = (jnp.zeros((1, npoints, 6), jnp.float32),)
        num_group, group_size = mc.num_group, mc.group_size
    else:
        raise ValueError(f"unknown vlm3d {vlm3d!r}")
    return model, init_args, num_group, group_size


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy, stripping the `module.` prefix
    (reference utils/load_models.py:53-59)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("module", "state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "numpy"):
            continue
        k = k.removeprefix("module.")
        out[k] = v.float().numpy()
    return out


#: torch name-fragment → flax name-fragment rewrites, applied in order.
_RENAMES = [
    # open_clip CustomTextCLIP wraps the text tower under `text.`
    (r"^text\.", ""),
    # mini-PointNet sequential indices → named layers (uni3d.MiniPointNet)
    (r"first_conv\.0\.", "conv1."), (r"first_conv\.1\.", "bn1."),
    (r"first_conv\.3\.", "conv2."),
    (r"second_conv\.0\.", "conv3."), (r"second_conv\.1\.", "bn2."),
    (r"second_conv\.3\.", "conv4."),
    # pos-embed MLP sequential → fc1/fc2 (uni3d.PosEmbedMLP)
    (r"pos_embed\.0\.", "pos_embed.fc1."), (r"pos_embed\.2\.", "pos_embed.fc2."),
    # timm EVA block list → flax module names
    (r"visual\.blocks\.(\d+)\.", r"blocks_\1."),
    (r"^blocks\.(\d+)\.", r"blocks_\1."),
    (r"blocks\.blocks\.(\d+)\.", r"blocks_\1."),   # ULIP TransformerEncoder
    # timm EVA separate-SwiGLU naming (w1=gate, w2=value, w3=out, ffn_ln=mid
    # LayerNorm); the fused `w12` variant is split in _expand_structural
    (r"mlp\.w1\.", "mlp.fc1_g."), (r"mlp\.w2\.", "mlp.fc1_x."),
    (r"mlp\.w3\.", "mlp.fc2."), (r"mlp\.ffn_ln\.", "mlp.norm."),
    # timm EVA final norms
    (r"visual\.norm\.", "norm."), (r"visual\.fc_norm\.", "fc_norm."),
    # CLIP text transformer resblocks (OpenAI / open_clip layout):
    # nn.MultiheadAttention packs [q;k;v] rows of in_proj exactly like the
    # fused qkv Dense's output columns, so a plain transpose suffices
    (r"transformer\.resblocks\.(\d+)\.", r"resblocks_\1."),
    (r"attn\.in_proj_", "attn.qkv."),
    (r"attn\.out_proj\.", "attn.proj."),
    (r"mlp\.c_fc\.", "mlp.fc1."), (r"mlp\.c_proj\.", "mlp.fc2."),
    # OpenShape PPTA (reference models/openshape/ppta.py state_dict layout)
    (r"sa\.mlp_convs\.(\d+)\.", r"sa.conv\1."),
    (r"sa\.mlp_bns\.(\d+)\.", r"sa.bn\1."),
    (r"lift\.0\.", "lift."), (r"lift\.2\.", "lift_norm."),
    (r"transformer\.layers\.(\d+)\.0\.norm\.", r"layers_\1.attn_norm."),
    (r"transformer\.layers\.(\d+)\.0\.fn\.to_qkv\.", r"layers_\1.attn.qkv."),
    (r"transformer\.layers\.(\d+)\.0\.fn\.to_out\.0\.", r"layers_\1.attn.proj."),
    (r"transformer\.layers\.(\d+)\.0\.fn\.pe\.0\.", r"layers_\1.pe.fc1."),
    (r"transformer\.layers\.(\d+)\.0\.fn\.pe\.2\.", r"layers_\1.pe.fc2."),
    (r"transformer\.layers\.(\d+)\.1\.norm\.", r"layers_\1.ff_norm."),
    (r"transformer\.layers\.(\d+)\.1\.fn\.net\.0\.", r"layers_\1.ff.fc1."),
    (r"transformer\.layers\.(\d+)\.1\.fn\.net\.3\.", r"layers_\1.ff.fc2."),
]


def _rename(key: str) -> str:
    for pat, rep in _RENAMES:
        key = re.sub(pat, rep, key)
    return key


def _expand_structural(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pre-pass for published layouts that need splitting, not renaming.

    * timm EVA02 fused attention: `attn.qkv.weight` (3W, W) with separate
      `attn.q_bias` / `attn.v_bias` params (k has a zero non-persistent
      buffer) → separate q/k/v projections.  Detected by the presence of
      q_bias so the CLIP text towers' genuinely-fused qkv stays fused.
    * timm EVA02 fused SwiGLU: `mlp.w12.{weight,bias}` chunks into
      (gate, value) halves along the OUTPUT dim (timm GluMlp chunk order).
    * rope buffers (`rope.freqs_*`): dropped — the reference drives the EVA
      blocks as bare `blk(x)` with rotary embeddings inactive
      (models/point_encoder.py:217-218).
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".rope." in k or k.startswith("rope."):
            continue
        if k.endswith("attn.qkv.weight") \
                and k[: -len("qkv.weight")] + "q_bias" in sd:
            p = k[: -len("qkv.weight")]
            W = v.shape[0] // 3
            out[p + "q_proj.weight"] = v[:W]
            out[p + "k_proj.weight"] = v[W:2 * W]
            out[p + "v_proj.weight"] = v[2 * W:]
            continue
        if k.endswith("attn.q_bias"):
            out[k[: -len("q_bias")] + "q_proj.bias"] = v
            continue
        if k.endswith("attn.v_bias"):
            out[k[: -len("v_bias")] + "v_proj.bias"] = v
            continue
        if k.endswith("attn.k_bias"):      # persistent zero buffer variants
            continue
        if k.endswith("mlp.w12.weight") or k.endswith("mlp.w12.bias"):
            h = v.shape[0] // 2
            out[k.replace("w12", "fc1_g")] = v[:h]
            out[k.replace("w12", "fc1_x")] = v[h:]
            continue
        out[k] = v
    return out


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Flatten-name converted dict: 'a.b.c/kernel' style flax leaf paths."""
    out: Dict[str, np.ndarray] = {}
    for key, val in _expand_structural(sd).items():
        key = _rename(key)
        parts = key.split(".")
        leaf = parts[-1]
        prefix = "/".join(parts[:-1])
        if key.endswith("token_embedding.weight"):
            # embedding table, not a Linear: stays (vocab, width)
            out[prefix] = val
            continue
        if key.endswith("text_projection.weight"):
            # open_clip stores the projection as a bias-free Linear (E, W);
            # the flax side keeps CLIP's bare (W, E) parameter
            out[prefix] = val.T
            continue
        if leaf == "weight":
            if val.ndim == 2:                       # Linear
                out[f"{prefix}/kernel"] = val.T
            elif val.ndim in (3, 4):                # Conv k=1
                out[f"{prefix}/kernel"] = val.reshape(val.shape[0], -1).T
            elif val.ndim == 1:
                # LayerNorm or BatchNorm scale — disambiguated at overlay
                out[f"{prefix}/scale"] = val
            else:
                out[f"{prefix}/weight"] = val
        elif leaf == "bias":
            out[f"{prefix}/bias"] = val
        elif leaf == "running_mean":
            out[f"{prefix}/mean"] = val
        elif leaf == "running_var":
            out[f"{prefix}/var"] = val
        elif leaf in ("num_batches_tracked",):
            continue
        else:
            out[f"{prefix}/{leaf}" if prefix else leaf] = val
    return out


def _flat_param_paths(params: Any):
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in leaves:
        parts = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        out.append(("/".join(str(p) for p in parts), leaf))
    return out


def _suffix_match(pstr: str, ckey: str) -> bool:
    # match only on full path-component boundaries so e.g. checkpoint key
    # 'norm/scale' cannot claim the model's 'fc_norm/scale' leaf
    return pstr == ckey or pstr.endswith("/" + ckey)


def _match_leaves(path_strs, converted: Dict[str, np.ndarray]):
    """For each model leaf, the longest suffix-matching checkpoint key with
    an identical shape; also name-matching keys whose shapes disagree."""
    matches = {}
    shape_mismatches = []
    for pstr, leaf in path_strs:
        hit, near = None, None
        for ckey, cval in converted.items():
            if _suffix_match(pstr, ckey):
                if cval.shape == tuple(leaf.shape):
                    if hit is None or len(ckey) > len(hit):
                        hit = ckey
                elif near is None or len(ckey) > len(near):
                    near = ckey
        if hit is not None:
            matches[pstr] = hit
        elif near is not None:
            shape_mismatches.append(
                (pstr, near, tuple(leaf.shape), converted[near].shape))
    return matches, shape_mismatches


def overlay_params(params: Any, converted: Dict[str, np.ndarray],
                   strict: bool = False):
    """Write converted leaves into the flax param pytree by path suffix.

    Missing / unexpected keys are logged in grouped form — the role of the
    reference's checkpoint-key diagnostics
    (models/ulip/pointbert/checkpoint.py:9-126)."""
    path_strs = _flat_param_paths(params)
    matches, _ = _match_leaves(path_strs, converted)
    used = set(matches.values())
    new_leaves = [np.asarray(converted[matches[pstr]], leaf.dtype)
                  if pstr in matches else leaf
                  for pstr, leaf in path_strs]

    # a leaf is overlaid iff it matched — the same criterion as
    # conversion_report (a boundary-less endswith against used keys would
    # let e.g. an un-overlaid 'fc_norm/scale' hide behind a used
    # 'norm/scale' key and pass strict=True with its random init)
    missing = [p for p, _ in path_strs if p not in matches]
    unexpected = sorted(set(converted) - used)
    if missing:
        logging.info("overlay_params: %d params kept their init (e.g. %s)",
                     len(missing), missing[:5])
    if unexpected:
        logging.info("overlay_params: %d checkpoint keys unused (e.g. %s)",
                     len(unexpected), unexpected[:5])
    if strict and (unexpected or missing):
        raise ValueError(f"strict overlay failed: missing={missing[:10]}, "
                         f"unexpected={unexpected[:10]}")
    return jax.tree.unflatten(jax.tree.structure(params), new_leaves)


def conversion_report(params: Any,
                      converted: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Structured strict-overlay diff for a converted checkpoint.

    Returns a dict with:
      converted:        {model_leaf_path: checkpoint_key} that would load
      missing:          model leaves no checkpoint key covers (keep init)
      unexpected:       checkpoint keys no model leaf consumed
      shape_mismatches: (model_path, ckpt_key, model_shape, ckpt_shape)
                        where the NAME matches but the shape does not —
                        the usual symptom of a wrong dims config
    """
    path_strs = _flat_param_paths(params)
    matches, shape_mismatches = _match_leaves(path_strs, converted)
    used = set(matches.values())
    missing = [p for p, _ in path_strs if p not in matches]
    unexpected = sorted(set(converted) - used)
    return {"converted": matches, "missing": missing,
            "unexpected": unexpected, "shape_mismatches": shape_mismatches,
            "n_model_leaves": len(path_strs)}


def print_conversion_report(report: Dict[str, Any], max_items: int = 20):
    print(f"model leaves:      {report['n_model_leaves']}")
    print(f"converted:         {len(report['converted'])}")
    print(f"missing (init):    {len(report['missing'])}")
    print(f"unexpected (ckpt): {len(report['unexpected'])}")
    print(f"shape mismatches:  {len(report['shape_mismatches'])}")
    for title, items in (("MISSING", report["missing"]),
                         ("UNEXPECTED", report["unexpected"])):
        if items:
            print(f"-- {title} ({len(items)}) --")
            for it in items[:max_items]:
                print(f"  {it}")
            if len(items) > max_items:
                print(f"  ... and {len(items) - max_items} more")
    if report["shape_mismatches"]:
        print("-- SHAPE MISMATCHES --")
        for pstr, ckey, ms, cs in report["shape_mismatches"][:max_items]:
            print(f"  {pstr}: model {ms} vs checkpoint {ckey} {cs}")


def _report_main(argv: Optional[Sequence[str]] = None) -> int:
    """`python -m uni_adapter_tpu.models.loader <ckpt> --vlm3d uni3d`:
    print the strict-overlay diff for a torch checkpoint against the
    selected backbone — so the moment real weights appear, conversion is
    one command with a reviewable artifact (reference layouts:
    utils/load_models.py:41-105)."""
    import argparse

    import jax.numpy as jnp

    from uni_adapter_tpu.config import ModelConfig

    ap = argparse.ArgumentParser(description=_report_main.__doc__)
    ap.add_argument("checkpoint", help="torch checkpoint path (.pt)")
    ap.add_argument("--vlm3d", default="uni3d",
                    choices=["uni3d", "ulip", "openshape", "clip_text"])
    ap.add_argument("--text-preset", default="ulip",
                    help="clip_text tower preset "
                         "(ulip/uni3d/openshape_vitg14/openshape_vitl14)")
    ap.add_argument("--eva-depth", type=int, default=None)
    ap.add_argument("--max-items", type=int, default=20)
    ap.add_argument("--device", default="default",
                    help="jax platform override (cpu/tpu), matching "
                         "main.py --device — the env var alone is not "
                         "enough when a backend was preregistered at "
                         "interpreter start")
    args = ap.parse_args(argv)

    if args.device != "default":
        jax.config.update("jax_platforms", args.device)

    mc = ModelConfig(vlm3d=args.vlm3d if args.vlm3d != "clip_text"
                     else "uni3d", compute_dtype="float32")
    if args.eva_depth is not None:
        import dataclasses
        mc = dataclasses.replace(mc, eva_depth=args.eva_depth)

    if args.vlm3d == "clip_text":
        from uni_adapter_tpu.models.clip_text import create_text_encoder
        model = create_text_encoder(args.text_preset, dtype=jnp.float32)
        init_args = (jnp.zeros((1, 77), jnp.int32),)
    else:
        # 128-point init: param shapes are npoints-independent and the
        # report only needs shapes
        model, init_args, _, _ = build_backbone(args.vlm3d, mc, npoints=128)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    converted = convert_state_dict(load_torch_state_dict(args.checkpoint))
    report = conversion_report(params, converted)
    print_conversion_report(report, max_items=args.max_items)
    ok = (not report["missing"] and not report["unexpected"]
          and not report["shape_mismatches"])
    print("STRICT OVERLAY:", "CLEAN" if ok else "DIFFS FOUND")
    return 0 if ok else 1


# public alias for the console script (pyproject.toml:
# uni-adapter-convert-report)
report_main = _report_main

if __name__ == "__main__":
    raise SystemExit(_report_main())
