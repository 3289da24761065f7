"""Example: clean-vs-corrupted attention comparison for one sample.

Rebuild of the reference's example_attention_extraction.py:45-481: load the
SAME sample index from the clean and corrupted variants of a dataset (or
fall back to a synthetic sphere + its jittered corruption), extract
attention from both, and write side-by-side comparison figures plus the 3D
overlays.

Run:
    python examples/attention_extraction_example.py \
        --root /data/modelnet40_c --corruption gaussian --sample-idx 3
    python examples/attention_extraction_example.py        # synthetic
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_sample_pair(root, dataset_name, corruption, severity, idx):
    """Same sample index, clean + corrupted (reference
    example_attention_extraction.py:45-120)."""
    from uni_adapter_tpu.config import Config, DataConfig
    from uni_adapter_tpu.data.datasets import load_tta_dataset

    def one(corr):
        cfg = Config(data=DataConfig(root=root, dataset_name=dataset_name,
                                     corruption=corr, severity=severity))
        ds = load_tta_dataset(cfg)
        pc, label, name, _ = ds[idx]
        return pc, name

    clean_pc, name = one("clean")
    corr_pc, _ = one(corruption)
    return clean_pc, corr_pc, name


def synthetic_pair(npoints=1024, seed=0):
    """Synthetic-sphere fallback (reference :425-449)."""
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((npoints, 3)).astype(np.float32)
    clean = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    corrupted = clean + 0.08 * rng.standard_normal(clean.shape).astype(
        np.float32)
    return clean, corrupted, "synthetic_sphere"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", default=None)
    parser.add_argument("--dataset-name", default="modelnet")
    parser.add_argument("--corruption", default="gaussian")
    parser.add_argument("--severity", type=int, default=5)
    parser.add_argument("--sample-idx", type=int, default=0)
    parser.add_argument("--out", default="outputs/attention_example")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--depth", type=int, default=24)
    parser.add_argument("--device", default="default")
    args = parser.parse_args(argv)

    import jax

    if args.device != "default":
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from uni_adapter_tpu.analysis import attention as A
    from uni_adapter_tpu.config import ModelConfig
    from uni_adapter_tpu.models.loader import init_or_load_params
    from uni_adapter_tpu.models.uni3d import create_uni3d
    from uni_adapter_tpu.utils.logging import setup_logging

    os.makedirs(args.out, exist_ok=True)
    setup_logging(os.path.join(args.out, "example.log"))

    if args.root:
        try:
            clean, corrupted, name = load_sample_pair(
                args.root, args.dataset_name, args.corruption, args.severity,
                args.sample_idx)
        except FileNotFoundError as e:
            logging.warning("dataset load failed (%s); synthetic fallback", e)
            clean, corrupted, name = synthetic_pair()
    else:
        clean, corrupted, name = synthetic_pair()
    logging.info("sample: %s", name)

    mc = ModelConfig(eva_depth=args.depth, checkpoint_path=args.checkpoint)
    model = create_uni3d(mc)
    params = init_or_load_params(model, (jnp.zeros((1, clean.shape[0], 6),
                                                   jnp.float32),),
                                 args.checkpoint)
    ex = A.AttentionExtractor(model, params, mc.num_group, mc.group_size)

    results = {}
    all_maps = {}
    for tag, pc in [("clean", clean), ("corrupted", corrupted)]:
        maps = ex.extract(pc)
        all_maps[tag] = maps
        results[tag] = {
            "cls": ex.get_cls_attention(-1).mean(1)[0],
            "evo": A.cls_attention_evolution(maps),
        }
        A.visualize_attention_3d(ex, pc, -1,
                                 os.path.join(args.out, f"overlay_{tag}.html"))
        # the reference's viridis on-pointcloud overlay, per condition
        A.visualize_attention_on_pointcloud(
            pc, results[tag]["cls"], ex.get_group_centers(pc)[0],
            title=f"{tag}: CLS attention on point cloud",
            save_path=os.path.join(args.out,
                                   f"attention_on_pointcloud_{tag}.html"))

    # full comparison panel set (reference visualize_comparison, :117-345)
    written = A.visualize_comparison(all_maps["clean"], all_maps["corrupted"],
                                     args.out, class_name=name,
                                     corruption_type=args.corruption,
                                     severity=args.severity)
    logging.info("comparison panels: %s", written)

    # side-by-side comparison figure (reference comparison figs)
    fig, axes = plt.subplots(2, 2, figsize=(14, 8))
    for col, tag in enumerate(["clean", "corrupted"]):
        axes[0][col].imshow(results[tag]["evo"], aspect="auto", cmap="viridis")
        axes[0][col].set_title(f"{tag}: CLS evolution")
        axes[1][col].plot(results[tag]["cls"])
        axes[1][col].set_title(f"{tag}: final-layer CLS attention")
    fig.suptitle(f"{name}: clean vs {args.corruption}")
    fig.tight_layout()
    path = os.path.join(args.out, "comparison.png")
    fig.savefig(path, dpi=110)
    plt.close(fig)

    delta = np.abs(results["clean"]["cls"] - results["corrupted"]["cls"])
    logging.info("mean |Δ CLS attention| = %.5f; figures in %s",
                 float(delta.mean()), args.out)


if __name__ == "__main__":
    main()
