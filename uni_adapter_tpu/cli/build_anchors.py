"""CLI: build a precomputed text-anchor bank (.npy) from a text tower.

The reference ships fp32 ``.pt`` banks and loads them by name
(Uni_Adapter.py:295-316); its Objaverse-LVIS bank is a stripped blob
(.MISSING_LARGE_BLOBS:1).  This command regenerates any bank from
labels.json + templates.json through the batched template-ensemble
classifier (anchors.clip_classifier) — so the moment a converted CLIP
text checkpoint exists, the LVIS last mile is one command:

    uni-adapter-build-anchors --text-preset uni3d \
        --clip-checkpoint /path/to/open_clip.pt \
        --labels-key objaverse_lvis_openshape --out lvis_bank.npy

The output is row-normalised (K, D) float32, the exact layout
anchors.load_precomputed reads (pass the file path as
``--precomputed-text-features /abs/path.npy`` to the evaluation CLI).
``--compare-to`` prints the max abs diff against an existing bank — the
value-exactness check used for the shipped converted banks.
"""
from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--text-preset", default="uni3d",
                    help="text tower preset (ulip / uni3d / "
                         "openshape_vitg14 / openshape_vitl14 — "
                         "models/clip_text.py)")
    ap.add_argument("--clip-checkpoint", default=None,
                    help="converted CLIP text checkpoint (torch .pt or "
                         "npz via models/loader); random weights + a "
                         "warning when omitted (plumbing runs only)")
    ap.add_argument("--labels-key", default=None,
                    help="labels.json key (e.g. modelnet40_openshape, "
                         "objaverse_lvis_openshape)")
    ap.add_argument("--dataset-name", default=None,
                    help="infer --labels-key from a dataset family name "
                         "(modelnet / scanobject / shapenet / lvis)")
    ap.add_argument("--template-key", default="modelnet40_64",
                    help="templates.json key (64-prompt ensemble default)")
    ap.add_argument("--labels-path", default=None)
    ap.add_argument("--templates-path", default=None)
    ap.add_argument("--out", required=True, help="output .npy path")
    ap.add_argument("--batch-size", type=int, default=256,
                    help="prompts per text-tower forward (K*T total)")
    ap.add_argument("--tower-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="tower compute dtype; float32 matches the "
                         "reference's shipped fp32 banks, bfloat16 is "
                         "~MXU-speed for large K (the bank is fp32 either "
                         "way — anchors are normalised template means)")
    ap.add_argument("--compare-to", default=None,
                    help="existing bank (.npy): print max abs diff")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", default="default",
                    help="jax platform override (cpu/tpu); the env var "
                         "alone cannot override a preregistered backend")
    args = ap.parse_args(argv)

    import jax

    if args.device != "default":
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import numpy as np

    from uni_adapter_tpu.anchors import clip_classifier
    from uni_adapter_tpu.config import ASSETS_DIR, labels_key_for
    from uni_adapter_tpu.models.clip_text import create_text_encoder
    from uni_adapter_tpu.models.loader import init_or_load_params

    if not args.labels_key and not args.dataset_name:
        ap.error("one of --labels-key or --dataset-name is required")
    key = args.labels_key or labels_key_for(args.dataset_name)
    with open(args.labels_path
              or os.path.join(ASSETS_DIR, "labels.json")) as f:
        classnames = json.load(f)[key]
    with open(args.templates_path
              or os.path.join(ASSETS_DIR, "templates.json")) as f:
        templates = json.load(f)[args.template_key]

    tower = create_text_encoder(args.text_preset,
                                dtype=jnp.dtype(args.tower_dtype))
    params = init_or_load_params(
        tower, (jnp.zeros((1, 77), jnp.int32),), args.clip_checkpoint,
        seed=args.seed)
    if args.clip_checkpoint is None:
        logging.warning("no --clip-checkpoint: random text tower — the "
                        "bank exercises the pipeline but is not a usable "
                        "classifier")
    # params as an ARGUMENT, not a closure constant: closure-captured
    # arrays bake into the jaxpr as literals, and a GB-scale tower then
    # pays constant folding + re-upload instead of one device_put
    params = jax.device_put(params)
    apply = jax.jit(tower.apply)
    encode = lambda toks: apply(params, toks)  # noqa: E731

    anchors = np.asarray(
        clip_classifier(classnames, templates, encode,
                        batch_size=args.batch_size), np.float32)
    # np.save appends .npy when absent; report the path that exists
    out = args.out if args.out.endswith(".npy") else args.out + ".npy"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.save(out, anchors)

    summary = {"out": out, "labels_key": key, "K": anchors.shape[0],
               "D": anchors.shape[1], "templates": len(templates)}
    if args.compare_to:
        other = np.load(args.compare_to)
        summary["compare_to"] = args.compare_to
        summary["max_abs_diff"] = (
            float(np.abs(anchors - other).max())
            if other.shape == anchors.shape else "shape mismatch "
            f"{other.shape} vs {anchors.shape}")
    print(json.dumps(summary))
    return anchors


def cli() -> int:
    """Console-script entry (pyproject.toml)."""
    main()
    return 0


if __name__ == "__main__":
    raise SystemExit(cli())
