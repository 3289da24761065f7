"""Contrastive losses (training-era parity; unused by the TTA loop).

Rebuild of the reference's Uni3d_Text_Image_Loss (models/losses.py:7-69):
pc↔text plus masked pc↔image InfoNCE with cross-device feature gathering.
The reference all-gathers with torch.distributed (utils/utils.py:86-99
`all_gather_batch`); here the gather is `jax.lax.all_gather` over the mesh
axis when an axis_name is given — the same math, collective-on-ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def all_gather_batch(tensors, axis_name: Optional[str] = None):
    """Gather batches from all devices along the batch axis
    (reference utils/utils.py:86-99).  Identity outside pmap/shard_map."""
    if axis_name is None:
        return tensors
    return [jax.lax.all_gather(t, axis_name, axis=0, tiled=True)
            for t in tensors]


def info_nce(feat_a: jax.Array, feat_b: jax.Array, logit_scale: jax.Array,
             labels: jax.Array,
             feat_a_gathered: jax.Array | None = None,
             feat_b_gathered: jax.Array | None = None) -> jax.Array:
    """Symmetric InfoNCE between two normalised feature sets.

    Under data parallelism each side scores its LOCAL rows against the
    other side's GATHERED set (the reference's DDP semantics — local
    queries, global negatives, losses.py:30-44); transposing one
    rectangular local×gathered matrix would mislabel the b-side.  Without
    gathered args this reduces to the plain symmetric square form.
    """
    a_g = feat_a if feat_a_gathered is None else feat_a_gathered
    b_g = feat_b if feat_b_gathered is None else feat_b_gathered
    logits_ab = logit_scale * jnp.matmul(feat_a, b_g.T, precision=_HIGH)
    logits_ba = logit_scale * jnp.matmul(feat_b, a_g.T, precision=_HIGH)
    loss_a = _xent(logits_ab, labels)
    loss_b = _xent(logits_ba, labels)
    return 0.5 * (loss_a + loss_b)


def _xent(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()


def uni3d_text_image_loss(pc_embed: jax.Array, text_embed: jax.Array,
                          image_embed: jax.Array, logit_scale: jax.Array,
                          mask: Optional[jax.Array] = None,
                          axis_name: Optional[str] = None) -> dict:
    """pc↔text + (masked) pc↔image contrastive loss (losses.py:18-69).

    Args:
      pc_embed/text_embed/image_embed: (B, D), unnormalised.
      mask: (B,) 0/1 image-validity mask (the reference masks missing
        renders in the image leg).
    Returns:
      dict with loss, uni3d_loss, pc_image_acc, pc_text_acc (the metric
      names from models/uni3d.py:33-34).
    """
    def norm(x):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    pc, tx, im = norm(pc_embed), norm(text_embed), norm(image_embed)
    pc_g, tx_g, im_g = all_gather_batch([pc, tx, im], axis_name)
    B = pc.shape[0]
    offset = (jax.lax.axis_index(axis_name) * B if axis_name is not None
              else 0)
    labels = offset + jnp.arange(B)

    loss_pt = info_nce(pc, tx, logit_scale, labels,
                       feat_a_gathered=pc_g, feat_b_gathered=tx_g)
    # Image leg is SYMMETRIC like the text leg (losses.py:52-53): the
    # reference averages CE(pc→image_all) and CE(image→pc_all), both with
    # the same local-row ignore-index mask.  Rows are local queries, columns
    # the gathered negatives, so the mask applies to this shard's rows in
    # both directions.
    logits_pi = logit_scale * jnp.matmul(pc, im_g.T, precision=_HIGH)
    logits_ip = logit_scale * jnp.matmul(im, pc_g.T, precision=_HIGH)
    if mask is not None:
        m = mask.astype(jnp.float32)

        def masked_ce(logits):
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            num, den = (per * m).sum(), m.sum()
            if axis_name is not None:
                # normalise by the GLOBAL mask count, not the local one —
                # otherwise shards with different numbers of valid images
                # weight rows unequally and DP diverges from single-device
                # training (AD through psum keeps the gradients exact)
                num = jax.lax.psum(num, axis_name)
                den = jax.lax.psum(den, axis_name)
            return num / jnp.maximum(den, 1.0)

        loss_pi = 0.5 * (masked_ce(logits_pi) + masked_ce(logits_ip))
    else:
        loss_pi = 0.5 * (_xent(logits_pi, labels) + _xent(logits_ip, labels))
    loss = loss_pt + loss_pi

    pc_text_acc = (jnp.argmax(logit_scale * pc @ tx_g.T, 1) == labels).mean()
    pc_image_acc = (jnp.argmax(logits_pi, 1) == labels).mean()
    return {"loss": loss, "uni3d_loss": loss,
            "pc_text_acc": 100.0 * pc_text_acc,
            "pc_image_acc": 100.0 * pc_image_acc}
