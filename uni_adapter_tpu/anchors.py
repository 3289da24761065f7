"""Text anchors: zero-shot classifier weights from class names.

Rebuild of the reference's two anchor paths (Uni_Adapter.py:295-316):
  * precomputed banks — the reference ships fp32 .pt tensors
    (precomputed_text_features/Uni3D/*.pt); converted to .npy in
    assets/text_features/ with identical values;
  * on-the-fly `clip_classifier` (Uni_Adapter.py:32-51): per class, format
    the 64 prompt templates, tokenize, encode, L2-normalise each embedding,
    mean over templates, re-normalise — batched here so all K·64 prompts go
    through the text tower as one (or a few) MXU-friendly batches.
"""
from __future__ import annotations

import logging
import os
from typing import Optional


import jax.numpy as jnp
import numpy as np

from uni_adapter_tpu.config import ASSETS_DIR, Config, load_labels, load_templates
from uni_adapter_tpu.utils.tokenizer import SimpleTokenizer

#: Shipped banks, keyed by (backbone-size, dataset family).
PRECOMPUTED = {
    ("large", "modelnet"): "text_features_large.npy",
    ("giant", "modelnet"): "text_features_giant.npy",
    ("large", "scanobject"): "text_features_large_scanobjectnn.npy",
    ("large", "shapenet"): "text_features_large_shapenetcorev2.npy",
}


def load_precomputed(path_or_key: str,
                     dataset_name: Optional[str] = None) -> jnp.ndarray:
    """Load a precomputed (K, D) anchor bank.

    Accepts an explicit .npy path or a size key ('large'/'giant') resolved
    against the shipped assets for `dataset_name`.
    """
    if os.path.exists(path_or_key):
        loaded = np.load(path_or_key)
        if isinstance(loaded, np.lib.npyio.NpzFile):
            # .npz archive: take the sole array (or the conventional first
            # key) — np.load returns an NpzFile, which has no .astype
            with loaded:
                arr = loaded[loaded.files[0]]
        else:
            arr = loaded
        return jnp.asarray(arr.astype(np.float32))
    if path_or_key.endswith((".npy", ".npz")) or os.sep in path_or_key:
        # looks like a path, not a size key — a typo'd path must not fall
        # through to a cryptic size-key KeyError
        raise FileNotFoundError(
            f"precomputed text-feature file not found: {path_or_key}")
    family = next((f for f in ("modelnet", "scanobject", "shapenet")
                   if dataset_name and f in dataset_name.lower()), None)
    if family is None:
        if dataset_name is not None:
            # an unrecognised dataset must not silently get the ModelNet
            # bank (wrong class set → silently wrong zero-shot accuracy)
            raise KeyError(
                f"no shipped anchor-bank family for dataset "
                f"'{dataset_name}' (known: modelnet/scanobject/shapenet; "
                f"or pass a .npy path)")
        family = "modelnet"
    try:
        fname = PRECOMPUTED[(path_or_key, family)]
    except KeyError:
        avail = sorted({k for k, fam in PRECOMPUTED if fam == family})
        raise KeyError(
            f"no shipped '{path_or_key}' bank for dataset family "
            f"'{family}' (available sizes: {avail}; or pass a .npy path)"
        ) from None
    return jnp.asarray(
        np.load(os.path.join(ASSETS_DIR, "text_features", fname))
        .astype(np.float32))


def clip_classifier(classnames, templates, encode_text_fn,
                    tokenizer: Optional[SimpleTokenizer] = None,
                    batch_size: int = 256) -> jnp.ndarray:
    """Template-ensemble zero-shot weights (Uni_Adapter.py:32-51).

    Args:
      classnames: K class names ('_' replaced by ' ' as in the reference).
      templates: list of prompt templates with one {} slot.
      encode_text_fn: (B, 77) int32 tokens -> (B, D) features.
    Returns:
      (K, D) row-normalised anchors (the reference's clip_weights.T — the
      engine transposes when forming logits).
    """
    tokenizer = tokenizer or SimpleTokenizer()
    n_tmpl = len(templates)
    prompts = [t.format(name.replace("_", " "))
               for name in classnames for t in templates]
    tokens = tokenizer(prompts)                                 # (K·T, 77)
    feats = []
    for s in range(0, tokens.shape[0], batch_size):
        feats.append(np.asarray(encode_text_fn(jnp.asarray(
            tokens[s:s + batch_size]))))
    emb = jnp.asarray(np.concatenate(feats, 0), jnp.float32)    # (K·T, D)
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
    emb = emb.reshape(len(classnames), n_tmpl, -1).mean(axis=1)  # (K, D)
    return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)


def get_text_anchors(cfg: Config, encode_text_fn=None,
                     tokenizer=None) -> jnp.ndarray:
    """Resolve anchors per the reference's precedence
    (Uni_Adapter.py:295-316): precomputed bank if configured and present,
    else compute on the fly from labels.json + templates.json."""
    pre = cfg.data.precomputed_text_features
    if pre:
        try:
            return load_precomputed(pre, cfg.data.dataset_name)
        except FileNotFoundError:
            # configured-but-missing: the documented precedence is
            # "precomputed if configured AND PRESENT" — fall through to the
            # on-the-fly path when a text encoder is available
            if encode_text_fn is None:
                raise
            logging.warning(
                "precomputed bank '%s' not found; computing anchors on the "
                "fly", pre)
    if encode_text_fn is None:
        raise ValueError("No precomputed anchors configured and no text "
                         "encoder provided for the on-the-fly path")
    return clip_classifier(load_labels(cfg), load_templates(cfg),
                           encode_text_fn, tokenizer)
