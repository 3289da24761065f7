"""Point-BERT discrete VAE (training-era parity components).

Rebuild of models/ulip/pointbert/dvae.py:11-349 — the dVAE the Point-BERT
backbone was pretrained with.  The TTA loop only touches the dVAE's
Group/Encoder (already rebuilt in ops/geometry + models/uni3d.MiniPointNet);
these pieces complete the inventory (SURVEY.md §2.2) and make the tokenizer/
reconstruction path available for future pretraining work on TPU:

  * DGCNN — k=4 graph-conv stack with GroupNorm + LeakyReLU over
    center-relative kNN graph features (dvae.py:20-113);
  * FoldingDecoder — coarse MLP points + 2×2 folding-grid refinement
    (dvae.py:216-268);
  * DiscreteVAE — encoder → DGCNN → Gumbel-softmax over a learned codebook
    → DGCNN → folding decoder (dvae.py:271-349), with the uniform-prior KL
    term of get_loss (:316-328) and a Chamfer-L1 reconstruction loss.

All graph gathers are batched `take_along_axis` over a dense kNN from one
MXU distance matrix — no sequential gathers.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.uni3d import MiniPointNet
from uni_adapter_tpu.ops.geometry import group_points, knn_point

_HIGH = jax.lax.Precision.HIGHEST


def graph_feature(coor: jax.Array, x: jax.Array, k: int = 4) -> jax.Array:
    """Center-relative kNN graph features (dvae.py:53-73 get_graph_feature).

    Args:
      coor: (B, N, 3); x: (B, N, C).
    Returns:
      (B, N, k, 2C): [neighbor − center ‖ center].
    """
    idx = knn_point(k, coor, coor)                         # (B, N, k)
    nb = jnp.take_along_axis(
        x[:, :, None, :],
        jnp.broadcast_to(idx[..., None], (*idx.shape, x.shape[-1])),
        axis=1)                                            # (B, N, k, C)
    ctr = jnp.broadcast_to(x[:, :, None, :], nb.shape)
    return jnp.concatenate([nb - ctr, ctr], axis=-1)


class DGCNN(nn.Module):
    """4-stage graph-conv feature extractor (dvae.py:20-113)."""
    output_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f: jax.Array, coor: jax.Array) -> jax.Array:
        # f: (B, G, C); coor: (B, G, 3)
        act = lambda x: nn.leaky_relu(x, 0.2)
        f = nn.Dense(128, dtype=self.dtype, name="input_trans")(
            f.astype(self.dtype))
        feats = []
        for i, ch in enumerate([256, 512, 512, 1024]):
            g = graph_feature(coor, f)                      # (B, G, k, 2C)
            g = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                         name=f"layer{i + 1}")(g)
            # inline GroupNorm keeps the param path flat (gn1/scale), the
            # contiguous-suffix form loader._suffix_match can overlay
            g = nn.GroupNorm(num_groups=4, dtype=self.dtype,
                             name=f"gn{i + 1}")(g)
            f = jnp.max(act(g), axis=2)                     # (B, G, ch)
            feats.append(f)                                 # 256+512+512+1024
        f = jnp.concatenate(feats, axis=-1)                 # (B, G, 2304)
        f = nn.Dense(self.output_channel, use_bias=False, dtype=self.dtype,
                     name="layer5")(f)
        f = nn.GroupNorm(num_groups=4, dtype=self.dtype, name="gn5")(f)
        return act(f)


class FoldingDecoder(nn.Module):
    """Coarse-points MLP + folding-grid refinement (dvae.py:216-268)."""
    num_fine: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature_global: jax.Array):
        # feature_global: (B, G, C)
        grid_size = 2
        num_coarse = self.num_fine // 4
        B, G, C = feature_global.shape
        fg = feature_global.reshape(B * G, C).astype(self.dtype)

        h = nn.Dense(1024, dtype=self.dtype, name="mlp1")(fg)
        h = nn.relu(h)
        h = nn.Dense(1024, dtype=self.dtype, name="mlp2")(h)
        h = nn.relu(h)
        coarse = nn.Dense(3 * num_coarse, dtype=self.dtype,
                          name="mlp3")(h).reshape(B * G, num_coarse, 3)

        # folding seed: 2×2 grid in [-0.05, 0.05]² (dvae.py:240-244)
        lin = jnp.linspace(-0.05, 0.05, grid_size)
        a, b = jnp.meshgrid(lin, lin, indexing="xy")
        seed = jnp.stack([a.reshape(-1), b.reshape(-1)], axis=-1)  # (4, 2)
        seed = jnp.broadcast_to(seed[None, None],
                                (B * G, num_coarse, 4, 2)
                                ).reshape(B * G, self.num_fine, 2)

        point_feat = jnp.repeat(coarse, grid_size ** 2, axis=1)     # (BG, N, 3)
        fg_exp = jnp.broadcast_to(fg[:, None, :], (B * G, self.num_fine, C))
        feat = jnp.concatenate([fg_exp, seed, point_feat], axis=-1)

        x = nn.Dense(512, dtype=self.dtype, name="final1")(feat)
        x = nn.relu(x)
        x = nn.Dense(512, dtype=self.dtype, name="final2")(x)
        x = nn.relu(x)
        offset = nn.Dense(3, dtype=self.dtype, name="final3")(x)
        fine = offset + point_feat
        return (coarse.reshape(B, G, num_coarse, 3),
                fine.reshape(B, G, self.num_fine, 3))


class DiscreteVAE(nn.Module):
    """Point tokenizer dVAE (dvae.py:271-349)."""
    num_group: int = 64
    group_size: int = 32
    encoder_dims: int = 256
    tokens_dims: int = 256
    decoder_dims: int = 256
    num_tokens: int = 8192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp: jax.Array, rng: jax.Array,
                 temperature: float = 1.0, hard: bool = False):
        neighborhood, center, _ = group_points(inp, None, self.num_group,
                                               self.group_size)
        logits = MiniPointNet(self.encoder_dims, 3, dtype=self.dtype,
                              name="encoder")(neighborhood)
        logits = DGCNN(self.num_tokens, dtype=self.dtype,
                       name="dgcnn_1")(logits, center)       # (B, G, V)

        codebook = self.param("codebook", nn.initializers.normal(1.0),
                              (self.num_tokens, self.tokens_dims))
        # Gumbel-softmax sampling (dvae.py:334)
        g = jax.random.gumbel(rng, logits.shape, logits.dtype)
        soft = jax.nn.softmax((logits + g) / temperature, axis=2)
        if hard:
            # straight-through: hard one-hot forward, soft gradients
            onehot = jax.nn.one_hot(jnp.argmax(soft, 2), self.num_tokens,
                                    dtype=soft.dtype)
            soft = onehot + soft - jax.lax.stop_gradient(soft)
        sampled = jnp.einsum("bgn,nc->bgc", soft, codebook,
                             precision=_HIGH)
        feature = DGCNN(self.decoder_dims, dtype=self.dtype,
                        name="dgcnn_2")(sampled, center)
        coarse, fine = FoldingDecoder(self.group_size, dtype=self.dtype,
                                      name="decoder")(feature)
        whole_fine = (fine + center[:, :, None, :]).reshape(
            inp.shape[0], -1, 3)
        whole_coarse = (coarse + center[:, :, None, :]).reshape(
            inp.shape[0], -1, 3)
        return whole_coarse, whole_fine, coarse, fine, neighborhood, logits


def chamfer_l1(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric Chamfer-L1 between point sets (B, N, 3) / (B, M, 3) —
    the dVAE reconstruction metric (dvae.py:300-313).  Averaged over the
    two directions (the /2 of Point-BERT's ChamferDistanceL1) so
    dvae_train_step's documented kl_weight schedule keeps the upstream
    reconstruction/KL balance."""
    d = jnp.linalg.norm(a[:, :, None] - b[:, None], axis=-1)  # (B, N, M)
    return 0.5 * (jnp.mean(jnp.min(d, axis=2)) + jnp.mean(jnp.min(d, axis=1)))


def dvae_loss(ret) -> Tuple[jax.Array, jax.Array]:
    """Reconstruction + uniform-prior KL (dvae.py:300-328).

    `ret` is the DiscreteVAE forward tuple; the grouped ground truth is its
    own 5th element (the encoder's neighbourhoods)."""
    _, _, coarse, fine, group_gt, logits = ret
    B, G = coarse.shape[:2]
    rec = (chamfer_l1(coarse.reshape(B * G, -1, 3),
                      group_gt.reshape(B * G, -1, 3))
           + chamfer_l1(fine.reshape(B * G, -1, 3),
                        group_gt.reshape(B * G, -1, 3)))
    softmax = jax.nn.softmax(logits, axis=-1)
    mean_softmax = softmax.mean(axis=1)
    log_qy = jnp.log(mean_softmax + 1e-12)
    log_uniform = -jnp.log(jnp.float32(logits.shape[-1]))
    # KL(uniform ‖ q) with batchmean reduction, matching F.kl_div(log_target)
    klv = jnp.mean(jnp.sum(jnp.exp(log_uniform)
                           * (log_uniform - log_qy), axis=-1))
    return rec, klv
