"""CLI: extract and visualize attention maps from a point-cloud encoder.

Rebuild of the reference's `extract_attention.py` main entry point
(extract_attention.py:1123-1234): load a model, feed one sample (from a
corrupted dataset if configured, synthetic sphere otherwise), extract every
layer's attention, and emit the full figure set — per-layer/head heatmaps,
head-averaged maps, CLS-evolution stats, and the 3D attention overlay.

Example:
    python extract_attention_cli.py --root /data/modelnet40_c \
        --corruption uniform --out outputs/attn
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def synthetic_sphere(npoints: int = 1024, seed: int = 0) -> np.ndarray:
    """Unit-sphere fallback sample (the reference example's fallback,
    example_attention_extraction.py:425-449)."""
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((npoints, 3)).astype(np.float32)
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", default=None, help="corrupted-dataset root")
    parser.add_argument("--dataset-name", default="modelnet")
    parser.add_argument("--corruption", default="uniform")
    parser.add_argument("--severity", type=int, default=5)
    parser.add_argument("--sample-idx", type=int, default=0)
    parser.add_argument("--out", default="outputs/attention")
    parser.add_argument("--layers", type=int, nargs="*", default=None)
    parser.add_argument("--heads", type=int, nargs="*", default=[0, 1])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--depth", type=int, default=24)
    parser.add_argument("--vlm3d", default="uni3d",
                        choices=["uni3d", "ulip", "openshape"],
                        help="backbone to extract from (the reference's "
                             "hook extractor is generic over blocks; all "
                             "three are covered here)")
    parser.add_argument("--device", default="default",
                        help="jax platform override (cpu/tpu); same as "
                             "main.py --device — the env var alone is not "
                             "enough under preregistered backends")
    args = parser.parse_args(argv)

    if args.device != "default":
        import jax

        jax.config.update("jax_platforms", args.device)

    from uni_adapter_tpu.analysis import attention as A
    from uni_adapter_tpu.config import Config, DataConfig, ModelConfig
    from uni_adapter_tpu.data.datasets import load_tta_dataset
    from uni_adapter_tpu.models.loader import init_or_load_params
    from uni_adapter_tpu.utils.logging import setup_logging

    os.makedirs(args.out, exist_ok=True)
    setup_logging(os.path.join(args.out, "extract.log"))

    mc = ModelConfig(vlm3d=args.vlm3d, eva_depth=args.depth,
                     checkpoint_path=args.checkpoint)
    from uni_adapter_tpu.models.loader import build_backbone
    model, init_args, num_group, group_size = build_backbone(args.vlm3d, mc)
    params = init_or_load_params(model, init_args, args.checkpoint)

    if args.root:
        cfg = Config(data=DataConfig(root=args.root,
                                     dataset_name=args.dataset_name,
                                     corruption=args.corruption,
                                     severity=args.severity))
        ds = load_tta_dataset(cfg)
        pc, label, name, _ = ds[args.sample_idx]
        logging.info("sample %d: class %s", args.sample_idx, name)
    else:
        pc = synthetic_sphere()
        logging.info("no --root given: using the synthetic sphere")

    extractor = A.AttentionExtractor(model, params, num_group, group_size,
                                     vlm3d=args.vlm3d)
    maps = extractor.extract(pc)
    logging.info("extracted %d layers, map shape %s", len(maps),
                 maps["layer_0"].shape)

    A.visualize_attention_maps(maps, args.layers, args.heads,
                               os.path.join(args.out, "attention_maps.png"))
    A.visualize_head_averaged(maps,
                              os.path.join(args.out, "head_averaged.png"))
    A.visualize_cls_evolution(maps,
                              os.path.join(args.out, "cls_evolution.png"))
    A.visualize_per_head_grid(maps, -1,
                              os.path.join(args.out, "per_head_grid.png"))
    A.visualize_layer_evolution(maps, 0,
                                os.path.join(args.out, "layer_evolution.png"))
    A.visualize_attention_3d(extractor, pc, -1,
                             os.path.join(args.out, "attention_3d.html"))

    # on-pointcloud overlay family (reference extract_attention.py:636-935)
    centers = extractor.get_group_centers(pc)[0]
    cls_attn = extractor.get_cls_attention(-1)[0]          # (H, G)
    A.visualize_attention_on_pointcloud(
        pc, cls_attn.mean(0), centers,
        title="CLS attention (last layer, head-averaged)",
        save_path=os.path.join(args.out, "attention_on_pointcloud.html"))
    A.visualize_attention_heads_on_pointcloud(
        pc, cls_attn, centers,
        save_path=os.path.join(args.out, "attention_heads_on_pointcloud"))
    A.visualize_layer_attention_on_pointcloud_grid(
        maps, pc, centers, args.layers,
        save_path=os.path.join(args.out, "layer_attention_grid"))
    import json as _json
    with open(os.path.join(args.out, "attention_stats.json"), "w") as f:
        _json.dump(A.attention_statistics(maps), f, indent=2)
    np.savez(os.path.join(args.out, "attention_maps.npz"), **maps)
    logging.info("wrote figures + npz to %s", args.out)


def cli() -> int:
    """Console-script entry (pyproject.toml): exit 0 on success —
    main()'s return value is in-process API, not an exit code."""
    main()
    return 0


if __name__ == "__main__":
    raise SystemExit(cli())
