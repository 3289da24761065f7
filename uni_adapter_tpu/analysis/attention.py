"""Attention-map extraction and visualization for the point transformers.

Rebuild of the reference's hook-based extractor (extract_attention.py:34-318
`AttentionExtractor` + the visualize_*/plot_* family at :321-1234).  The
reference registers forward hooks that RE-COMPUTE q/k inside every block
(handling EVA separate projections + q_norm/k_norm, :115-177); in JAX the
blocks simply return their attention weights when asked
(`return_attn=True` through models/common.py), so extraction is one
functional forward — no hooks, no recomputation, bitwise-consistent with
the logits path.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uni_adapter_tpu.ops.geometry import group_points


class AttentionExtractor:
    """Extract per-layer attention maps from a Uni3D/Point-BERT model.

    API mirrors the reference extractor (extract_attention.py:34-318):
    extract → {layer_i: (B, H, N, N)}, CLS getters, group centers.
    """

    def __init__(self, model, params, num_group: int = 512,
                 group_size: int = 64):
        self.model = model
        self.params = params
        self.num_group = num_group
        self.group_size = group_size
        self.attention_maps: Dict[str, np.ndarray] = {}
        self._extract = jax.jit(
            lambda p, pc: model.apply(p, pc, return_attn=True))

    def extract(self, point_cloud: np.ndarray) -> Dict[str, np.ndarray]:
        """Run one forward, stash every layer's (B, H, N, N) attention."""
        pc = jnp.asarray(point_cloud, jnp.float32)
        if pc.ndim == 2:
            pc = pc[None]
        if pc.shape[-1] == 3:   # xyz only → ones color, reference convention
            pc = jnp.concatenate([pc, jnp.ones_like(pc)], axis=-1)
        _, attns = self._extract(self.params, pc)
        self.attention_maps = {f"layer_{i}": np.asarray(a)
                               for i, a in enumerate(attns)}
        self.num_layers = len(attns)
        return self.attention_maps

    def get_cls_attention(self, layer_idx: int = -1) -> np.ndarray:
        """Attention FROM the CLS token to all group tokens,
        (B, H, G) (reference :268-295)."""
        if layer_idx == -1:
            layer_idx = self.num_layers - 1
        key = f"layer_{layer_idx}"
        if key not in self.attention_maps:
            raise ValueError(f"Layer {layer_idx} attention not found. "
                             "Run extract() first.")
        return self.attention_maps[key][:, :, 0, 1:]

    def get_attention_to_cls(self, layer_idx: int = -1) -> np.ndarray:
        """Attention from each token TO the CLS token, (B, H, G)."""
        if layer_idx == -1:
            layer_idx = self.num_layers - 1
        return self.attention_maps[f"layer_{layer_idx}"][:, :, 1:, 0]

    def get_group_centers(self, point_cloud: np.ndarray) -> np.ndarray:
        """FPS group centers aligned with the attention tokens
        (reference :297-318)."""
        pc = jnp.asarray(point_cloud, jnp.float32)
        if pc.ndim == 2:
            pc = pc[None]
        xyz = pc[:, :, :3]
        _, centers, _ = group_points(xyz, None, self.num_group,
                                     self.group_size)
        return np.asarray(centers)


def attention_entropy(attn: np.ndarray) -> np.ndarray:
    """Row entropy of attention distributions (reference CLS-evolution
    stats, extract_attention.py:"entropy/sparsity")."""
    p = attn / (attn.sum(-1, keepdims=True) + 1e-12)
    return -(p * np.log(p + 1e-12)).sum(-1)


def attention_sparsity(attn: np.ndarray, threshold: float = 0.01) -> np.ndarray:
    """Fraction of attention weights below threshold."""
    return (attn < threshold).mean(-1)


def cls_attention_evolution(maps: Dict[str, np.ndarray]) -> np.ndarray:
    """(L, G) head-averaged CLS attention per layer, for evolution plots."""
    layers = sorted(maps, key=lambda k: int(k.split("_")[1]))
    return np.stack([maps[k][:, :, 0, 1:].mean(axis=(0, 1)) for k in layers])


# ---------------------------------------------------------------------------
# Visualizations (matplotlib, Agg backend)
# ---------------------------------------------------------------------------

def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def visualize_attention_maps(attention_maps: Dict[str, np.ndarray],
                             layer_indices: Optional[List[int]] = None,
                             head_indices: Optional[List[int]] = None,
                             save_path: Optional[str] = None,
                             figsize: Tuple[int, int] = (16, 12),
                             cmap: str = "viridis"):
    """Per-layer/head heatmap grid (reference :321-420)."""
    plt = _plt()
    layers = sorted(attention_maps, key=lambda k: int(k.split("_")[1]))
    if layer_indices is not None:
        layers = [f"layer_{i}" for i in layer_indices]
    heads = head_indices or [0]
    fig, axes = plt.subplots(len(layers), len(heads), figsize=figsize,
                             squeeze=False)
    for r, lk in enumerate(layers):
        for c, h in enumerate(heads):
            axes[r][c].imshow(attention_maps[lk][0, h], cmap=cmap)
            axes[r][c].set_title(f"{lk} head {h}", fontsize=8)
            axes[r][c].axis("off")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def visualize_head_averaged(attention_maps: Dict[str, np.ndarray],
                            save_path: Optional[str] = None,
                            cmap: str = "viridis"):
    """Head-averaged attention per layer (reference :423-...)."""
    plt = _plt()
    layers = sorted(attention_maps, key=lambda k: int(k.split("_")[1]))
    n = len(layers)
    cols = min(n, 6)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i, lk in enumerate(layers):
        ax = axes[i // cols][i % cols]
        ax.imshow(attention_maps[lk][0].mean(0), cmap=cmap)
        ax.set_title(lk, fontsize=8)
        ax.axis("off")
    for j in range(n, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def visualize_cls_evolution(attention_maps: Dict[str, np.ndarray],
                            save_path: Optional[str] = None):
    """CLS-attention evolution heatmap + entropy/sparsity curves
    (reference CLS-evolution block)."""
    plt = _plt()
    evo = cls_attention_evolution(attention_maps)          # (L, G)
    fig, axes = plt.subplots(1, 3, figsize=(16, 4))
    axes[0].imshow(evo, aspect="auto", cmap="viridis")
    axes[0].set_xlabel("group token")
    axes[0].set_ylabel("layer")
    axes[0].set_title("CLS attention evolution")
    axes[1].plot(attention_entropy(evo))
    axes[1].set_title("entropy per layer")
    axes[2].plot(attention_sparsity(evo))
    axes[2].set_title("sparsity per layer")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def visualize_per_head_grid(attention_maps: Dict[str, np.ndarray],
                            layer_idx: int = -1,
                            save_path: Optional[str] = None,
                            cmap: str = "viridis"):
    """All heads of one layer as a grid (reference per-head grids)."""
    plt = _plt()
    layers = sorted(attention_maps, key=lambda k: int(k.split("_")[1]))
    key = layers[layer_idx]
    attn = attention_maps[key][0]                  # (H, N, N)
    H = attn.shape[0]
    cols = min(H, 4)
    rows = -(-H // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for h in range(H):
        ax = axes[h // cols][h % cols]
        ax.imshow(attn[h], cmap=cmap)
        ax.set_title(f"{key} head {h}", fontsize=8)
        ax.axis("off")
    for j in range(H, rows * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def visualize_layer_evolution(attention_maps: Dict[str, np.ndarray],
                              token_idx: int = 0,
                              save_path: Optional[str] = None):
    """One token's outgoing attention across layers (reference
    layer-evolution figure); defaults to the CLS token."""
    plt = _plt()
    layers = sorted(attention_maps, key=lambda k: int(k.split("_")[1]))
    evo = np.stack([attention_maps[k][0].mean(0)[token_idx]
                    for k in layers])              # (L, N)
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(evo, aspect="auto", cmap="magma")
    ax.set_xlabel("token")
    ax.set_ylabel("layer")
    ax.set_title(f"token {token_idx} outgoing attention across layers")
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def attention_statistics(attention_maps: Dict[str, np.ndarray]) -> dict:
    """Per-layer entropy / sparsity / CLS-mass summary (reference
    entropy-sparsity stats block)."""
    layers = sorted(attention_maps, key=lambda k: int(k.split("_")[1]))
    stats = {}
    for k in layers:
        attn = attention_maps[k]
        cls_row = attn[:, :, 0, :]
        stats[k] = {
            "entropy_mean": float(attention_entropy(attn).mean()),
            "sparsity_mean": float(attention_sparsity(attn).mean()),
            "cls_self_attention": float(attn[:, :, 0, 0].mean()),
            "cls_row_max": float(cls_row.max()),
        }
    return stats


def visualize_attention_3d(extractor: AttentionExtractor,
                           point_cloud: np.ndarray, layer_idx: int = -1,
                           save_path: Optional[str] = None):
    """3D overlay: group centers coloured by CLS attention (the reference's
    plotly overlay, :"3D plotly overlays"); writes the self-contained HTML
    viewer with per-cloud intensity buckets."""
    from uni_adapter_tpu.visualize import visualize_pointclouds_plotly

    extractor.extract(point_cloud)
    cls_attn = extractor.get_cls_attention(layer_idx).mean(1)[0]   # (G,)
    centers = extractor.get_group_centers(point_cloud)[0]          # (G, 3)
    q = np.quantile(cls_attn, [0.5, 0.8, 0.95])
    clouds = {
        "points": np.asarray(point_cloud)[..., :3].reshape(-1, 3),
        "low attention": centers[cls_attn < q[0]],
        "mid attention": centers[(cls_attn >= q[0]) & (cls_attn < q[2])],
        "top attention": centers[cls_attn >= q[2]],
    }
    return visualize_pointclouds_plotly(
        {k: v for k, v in clouds.items() if len(v)}, save_path=save_path,
        title=f"CLS attention, layer {layer_idx}")
