"""Tensor parallelism for the encoder trunks (pjit / GSPMD NamedSharding).

The reference has no tensor parallelism anywhere (SURVEY.md §2.4: largest
sequence is 513 tokens, single-GPU inference) — this module is a
beyond-reference capability for multi-chip serving: shard the transformer
weight matrices over a `model` mesh axis so a single forward's matmuls
split across chips and the per-chip latency drops with the mesh size.
SURVEY.md §2.4 sketches exactly this ("pjit-shard the EVA02-Large blocks
over model axes — trivial with jit + NamedSharding given the 513-token
seq").

The sharding follows the Megatron pattern, expressed purely as
`PartitionSpec`s on the parameter pytree — XLA's GSPMD propagates them
through the jitted forward and inserts the ICI collectives (one
all-reduce per block at the attention proj and MLP fc2 outputs):

  * attention q/k/v projections: column-sharded `P(None, model)` — heads
    split across chips, attention itself is embarrassingly parallel over
    heads;
  * attention output proj: row-sharded `P(model, None)` — consumes the
    head-sharded activations, partial sums all-reduce;
  * SwiGLU fc1_g / fc1_x: column-sharded; the EVA02 MLP's *hidden-dim*
    LayerNorm parameters shard with the hidden axis (GSPMD turns its
    mean/var into a subsharded reduction);
  * fc2: row-sharded;
  * per-head q_norm/k_norm, the block LayerNorms, and everything outside
    the trunk (mini-PointNet, pos-embed, projections): replicated.

Composes with the data modes in parallel/mesh.py on a 2-D (data, model)
mesh: batch sharded over `data`, weights over `model`.  The TTA adaptation
state is tiny (K·M·D) and stays replicated.

No reference analogue (file:line n/a — capability absent upstream).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# path-fragment rules, checked in order; first match wins.
# (parent-module name, param name) → spec builder
def _spec_for(path_names, leaf, axis: str):
    names = list(path_names)
    is_kernel = names[-1] == "kernel"
    is_bias_like = names[-1] in ("bias", "scale", "mean", "var")
    parent = names[-2] if len(names) >= 2 else ""
    grandparent = names[-3] if len(names) >= 3 else ""

    in_attn = "attn" in names
    in_mlp = "mlp" in names or "ff" in names

    # column-sharded producers: out-features split over the model axis
    # (llama naming: w1 = gate and w3 = up are producers; w2 = down is the
    # row-sharded consumer)
    col = parent in ("q_proj", "k_proj", "v_proj", "qkv", "fc1", "fc1_g",
                     "fc1_x", "w1", "w3", "w12", "gate")
    # row-sharded consumers: in-features split, output all-reduced
    row = (in_attn and parent in ("proj", "out", "out_proj")) or \
          (in_mlp and parent in ("fc2", "w2", "down"))

    if is_kernel and (in_attn or in_mlp):
        if col and leaf.ndim == 2:
            return P(None, axis)
        if row and leaf.ndim == 2:
            return P(axis, None)
    if is_bias_like and (in_attn or in_mlp) and leaf.ndim == 1:
        if col:
            return P(axis)
        # the EVA02 SwiGLU hidden-dim LayerNorm lives inside mlp and its
        # features follow the column-sharded hidden axis
        if in_mlp and parent == "norm" and grandparent in ("mlp", "ff"):
            return P(axis)
    return P()  # replicated


def _path_names(path):
    out = []
    for k in path:
        out.append(k.key if hasattr(k, "key") else str(k))
    return out


def tp_param_specs(params, axis: str = "model"):
    """PartitionSpec pytree for Megatron-style trunk sharding.

    Any parameter not matched by the rules stays replicated, so the specs
    are safe for the full model pytree (mini-PointNet, pos-embed,
    projections are small and replicated).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_names(path), leaf, axis), params)


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """Place `params` on `mesh` with the TP specs (replicated over any
    other mesh axes).  Head count and MLP hidden dim should be divisible by
    the `axis` size for an even split; GSPMD pads otherwise."""
    specs = tp_param_specs(params, axis)
    return jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P)))


def make_tp_forward(model, mesh: Mesh, axis: str = "model",
                    data_axis: Optional[str] = None, jit: bool = True):
    """Jitted `forward(params, *inputs)` whose params are TP-sharded.

    Pass params through `shard_params_tp` first (jit commits to argument
    shardings); inputs are replicated unless `data_axis` names a mesh axis
    to shard the leading batch dimension over.  Outputs are fully
    replicated so downstream (logits, adaptation state) is
    sharding-agnostic.  `jit=False` returns the raw traced body for
    composition under an outer jit (the sharding constraints still steer
    GSPMD there).
    """
    rep = NamedSharding(mesh, P())
    in_batch = (NamedSharding(mesh, P(data_axis)) if data_axis else rep)

    def fwd(params, *inputs):
        inputs = tuple(jax.lax.with_sharding_constraint(x, in_batch)
                       for x in inputs)
        out = model.apply(params, *inputs)
        return jax.lax.with_sharding_constraint(out, rep)

    return jax.jit(fwd) if jit else fwd


def make_tp_encode_fn(model, mesh: Mesh, kind: str = "uni3d",
                      axis: str = "model"):
    """(prepare_params, encode) for a tensor-parallel TTA encoder.

    `encode(tp_params, pc, rgb)` matches engine.make_encode_fn's contract
    (input conventions of the reference's get_logits_wrapper,
    Uni_Adapter.py:53-67, L2-normalised output) so it drops into
    engine.make_step_fn/make_scan_fn via `encode_fn=` — only the trunk
    forward changes.  Spec inference is structural (tp_param_specs walks
    the param tree), so all three backbones work.
    """
    from uni_adapter_tpu.engine import encode_with

    fwd = make_tp_forward(model, mesh, axis, jit=False)

    def prepare(params):
        return shard_params_tp(params, mesh, axis)

    return prepare, encode_with(kind, fwd)
