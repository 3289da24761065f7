"""CLI: clean-vs-corrupted cross-class attention analysis.

Rebuild of the reference's `cross_class_attention_analysis.py` main
(cross_class_attention_analysis.py:617-820): sweep severities 1-5 of one
corruption, build per-class CLS-attention centroids for clean and corrupted
streams, compare distance matrices / nearest-neighbour flips, t-SNE the
displacement, and dump JSON + npy + figures.  Falls back to synthetic
per-class clusters when no dataset root is given, so the pipeline is
runnable anywhere.

Example:
    python cross_class_analysis_cli.py --root /data/modelnet40_c \
        --corruption gaussian --out outputs/cross_class
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def synthetic_class_set(n_classes: int = 6, per_class: int = 3,
                        npoints: int = 512, noise: float = 0.0,
                        noise_seed: int = 1):
    """Synthetic per-class clusters.  The class GEOMETRY (anchors + base
    points) is fixed (seed 0) so the clean and every corrupted severity
    share the same underlying classes — only the additive noise varies
    with `noise_seed`; otherwise the displacement analysis would measure a
    seed change, not corruption."""
    rng = np.random.default_rng(0)
    noise_rng = np.random.default_rng(1000 + noise_seed)
    pcs, labels = [], []
    for k in range(n_classes):
        anchor = rng.standard_normal(3)
        for _ in range(per_class):
            pts = rng.standard_normal((npoints, 3)).astype(np.float32)
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            pts = pts * (0.4 + 0.1 * k) + anchor * 0.2
            pcs.append(pts + noise * noise_rng.standard_normal(pts.shape)
                       .astype(np.float32))
            labels.append(k)
    return np.stack(pcs), np.array(labels)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", default=None)
    parser.add_argument("--dataset-name", default="modelnet")
    parser.add_argument("--corruption", default="gaussian")
    parser.add_argument("--severities", type=int, nargs="*",
                        default=[1, 2, 3, 4, 5])
    parser.add_argument("--max-per-class", type=int, default=4)
    parser.add_argument("--out", default="outputs/cross_class")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--depth", type=int, default=24)
    parser.add_argument("--vlm3d", default="uni3d",
                        choices=["uni3d", "ulip", "openshape"])
    parser.add_argument("--device", default="default",
                        help="jax platform override (cpu/tpu); same as "
                             "main.py --device — the env var alone is not "
                             "enough under preregistered backends")
    args = parser.parse_args(argv)

    if args.device != "default":
        import jax

        jax.config.update("jax_platforms", args.device)

    from uni_adapter_tpu.analysis.cross_class import (
        CrossClassAttentionAnalyzer, plot_distance_matrices,
        top_confused_pairs, visualize_displacement_magnitudes,
        visualize_severity_progression, visualize_top_confused_pairs,
        visualize_tsne_with_displacement)
    from uni_adapter_tpu.config import Config, DataConfig, ModelConfig
    from uni_adapter_tpu.data.datasets import load_tta_dataset
    from uni_adapter_tpu.models.loader import init_or_load_params
    from uni_adapter_tpu.utils.logging import setup_logging

    os.makedirs(args.out, exist_ok=True)
    setup_logging(os.path.join(args.out, "analysis.log"))

    mc = ModelConfig(vlm3d=args.vlm3d, eva_depth=args.depth,
                     checkpoint_path=args.checkpoint)
    from uni_adapter_tpu.models.loader import build_backbone
    model, init_args, num_group, group_size = build_backbone(args.vlm3d, mc)
    params = init_or_load_params(model, init_args, args.checkpoint)

    if args.root:
        def load(severity, corruption=None):
            cfg = Config(data=DataConfig(
                root=args.root, dataset_name=args.dataset_name,
                corruption=corruption or args.corruption, severity=severity))
            ds = load_tta_dataset(cfg)
            pcs = [np.asarray(ds[i][0]) for i in range(len(ds))]
            labels = np.array([ds[i][1] for i in range(len(ds))])
            return np.stack(pcs), labels

        clean_pcs, clean_labels = load(1, "clean")
        class_names = load_tta_dataset(Config(data=DataConfig(
            root=args.root, dataset_name=args.dataset_name,
            corruption=args.corruption))).class_names
        sev_loader = lambda s: load(s)
    else:
        logging.info("no --root: synthetic class set")
        clean_pcs, clean_labels = synthetic_class_set()
        class_names = [f"class_{i}" for i in range(6)]
        sev_loader = lambda s: synthetic_class_set(noise=0.05 * s,
                                                   noise_seed=s)

    an = CrossClassAttentionAnalyzer(model, params, class_names,
                                     num_group=num_group,
                                     group_size=group_size,
                                     vlm3d=args.vlm3d)

    from uni_adapter_tpu.analysis.cross_class import _subsample_per_class
    clean_pcs, clean_labels = _subsample_per_class(clean_pcs, clean_labels,
                                                   args.max_per_class)
    clean_cent = an.class_centroids(clean_pcs, clean_labels)
    sweep = an.severity_sweep(sev_loader, args.severities,
                              args.max_per_class)

    results = {"severities": {}}
    progression = {}
    for s, cent in sweep.items():
        mats = an.distance_matrices(clean_cent, cent)
        conf = an.confusion_analysis(clean_cent, cent)
        emb = an.tsne_displacement(clean_cent, cent)
        analysis = top_confused_pairs(mats, class_names)
        progression[s] = {"analysis": analysis,
                          "clean_distances": mats["clean"],
                          "corrupted_distances": mats["corrupted"]}
        results["severities"][s] = {"confusion": conf,
                                    "top_confused": analysis}
        np.save(os.path.join(args.out, f"centroids_s{s}.npy"), cent)
        np.save(os.path.join(args.out, f"tsne_s{s}.npy"), emb)
        plot_distance_matrices(mats, class_names,
                               os.path.join(args.out, f"distance_s{s}.png"))
        # the reference's per-severity figure set (:372-536)
        visualize_top_confused_pairs(
            analysis, args.corruption, s,
            os.path.join(args.out, f"confused_pairs_s{s}.png"))
        visualize_tsne_with_displacement(
            clean_cent, cent, class_names, args.corruption, s,
            os.path.join(args.out, f"tsne_displacement_s{s}.png"),
            embedding=emb)
        visualize_displacement_magnitudes(
            clean_cent, cent, class_names, args.corruption, s,
            os.path.join(args.out, f"displacement_s{s}.png"))
        logging.info("severity %d: %d nearest-neighbour flips", s,
                     conf["n_flips"])
    if len(progression) > 1:
        visualize_severity_progression(
            progression, class_names, args.corruption,
            os.path.join(args.out, "severity_progression.png"))
    np.save(os.path.join(args.out, "centroids_clean.npy"), clean_cent)
    an.save_results(args.out, results)
    logging.info("analysis written to %s", args.out)


def cli() -> int:
    """Console-script entry (pyproject.toml): exit 0 on success —
    main()'s return value is in-process API, not an exit code."""
    main()
    return 0


if __name__ == "__main__":
    raise SystemExit(cli())
