"""Pipeline parallelism for the encoder trunks (GPipe microbatch schedule
over a `stage` mesh axis: shard_map + lax.ppermute).

The reference has no pipeline parallelism anywhere (SURVEY.md §2.4 —
single-GPU inference; file:line n/a, capability absent upstream).  This
module is a beyond-reference capability completing the parallelism
portfolio: DP (parallel/mesh.py, three modes), TP (parallel/tp.py), and
depth-wise PP here.

Why PP when TP exists: PP shards the trunk *depth-wise* — each chip holds
depth/S of the transformer weights, and the only communication is one
(Bm, N, width) activation ppermute per stage per microbatch, vs TP's two
all-reduces per block.  For trunks whose weights exceed one chip's HBM, or
on meshes where per-block all-reduces are expensive, PP is the right axis;
PP × TP × DP compose on a 3-D mesh in the usual way.

Mechanics: the L homogeneous trunk blocks' parameters are stacked into
leaves of shape (S, L/S, ...) and sharded over `stage`, so each device
lax.scans its local L/S blocks (one traced block body in the program).
The batch splits into n_micro microbatches rotating through the device
ring: at tick t, device 0 injects microbatch t, device s applies blocks
[s·L/S, (s+1)·L/S) to the microbatch injected at tick t−s, and device S−1
emits microbatch t−(S−1).  Devices outside their valid window compute on
dead buffers that never reach the output (the GPipe bubble —
(S−1)/(n_micro+S−1) of the ticks); the emitted microbatches accumulate
into a zeros buffer on the last stage only, so a final psum over `stage`
is a pure broadcast of the result.

Maintenance note: the module-level `uni3d_pre/uni3d_post/ulip_pre/ulip_post`
helpers re-state their model's embedding and head path (the non-block
portion of the encoder's __call__) — ONE restatement each, shared with the
sequence-parallel forwards in parallel/sp.py.  Any edit to a model's
embedding/head breaks the PP/SP == plain-forward equality that
tests/test_pp.py and tests/test_sp.py assert on every run, so drift cannot
land silently; the restatement buys pipelining without threading a
block-boundary API through the flax modules.

Some blocks consume per-microbatch CONSTANTS besides the activations —
ULIP's Point-BERT re-adds the positional embedding at every block
(reference models/ulip/pointbert/point_encoder.py:95-98); PPTA with
rel_pe recomputes every block's attention bias from the centroid-delta
tensor (reference models/openshape/ppta.py:50-59).  Those constants do
NOT ride the ring: the microbatch store is replicated into the shard_map
anyway, and the in-flight microbatch index is derivable (m = t − idx for
GPipe; a schedule table for the interleaved executor), so each stage
re-takes its extras locally (`micro_extras`) — only the activations
ppermute.  Builders cover all three backbones.
"""
from __future__ import annotations

from typing import Callable, Optional

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_trunk_flat(trunk_params: dict, depth: int, fmt: str = "blocks_{}"):
    """Stack per-block param trees `fmt.format(i)` into flat (depth, ...)
    leaves (the layer-scanned layout parallel/sp.py consumes directly)."""
    blocks = [trunk_params[fmt.format(i)] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def stack_trunk_params(trunk_params: dict, depth: int, n_stages: int,
                       fmt: str = "blocks_{}"):
    """Stack per-block param trees `fmt.format(i)` into leaves of shape
    (n_stages, depth // n_stages, ...)."""
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    stacked = stack_trunk_flat(trunk_params, depth, fmt)
    return jax.tree.map(
        lambda a: a.reshape(n_stages, depth // n_stages, *a.shape[1:]),
        stacked)


def _shard(tree, mesh: Mesh, spec: P):
    sh = NamedSharding(mesh, spec)
    return jax.device_put(tree, jax.tree.map(lambda _: sh, tree))


def _shard_stacked(stacked, mesh: Mesh, stage_axis: str,
                   tp_axis: Optional[str], lead: int = 2):
    """Stage-shard the stacked (S, L/S, ...) block params (or the
    interleaved (S, V, L/(S·V), ...) stacks with lead=3); with `tp_axis`,
    additionally Megatron-shard each block's matrices over it (specs from
    parallel/tp.py, shifted right by the `lead` stacking axes)."""
    if tp_axis is None:
        return _shard(stacked, mesh, P(stage_axis))
    from uni_adapter_tpu.parallel import tp as _tp

    # per-block TP specs computed on the block-shaped view: drop the
    # leading stacking axes for spec inference, then prepend them
    pad = (None,) * (lead - 1)
    block_view = jax.tree.map(lambda a: a[(0,) * lead], stacked)
    tp_specs = _tp.tp_param_specs(block_view, axis=tp_axis)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, P(*((stage_axis,) + pad + tuple(s)))),
        tp_specs, is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(stacked, shardings)


def take_micro(tree, i):
    """Dynamic-index microbatch i out of a (n_micro, ...) pytree — shared
    by both ring executors (here and parallel/pp_interleave.py)."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
        tree)


def ring_perm(n_stages: int):
    """The stage ring's ppermute pattern (device i -> i+1 mod S) — shared
    by both ring executors."""
    return [(i, (i + 1) % n_stages) for i in range(n_stages)]


def _pipeline(block_apply: Callable, local_blocks, micro_carry,
              n_stages: int, axis: str, micro_extras=None):
    """GPipe schedule; runs inside shard_map over `axis`.

    local_blocks: this stage's (L/S, ...) stacked block params.
    micro_carry: replicated pytree with leading (n_micro, Bm, ...) axes.
    micro_extras: optional replicated pytree of per-microbatch CONSTANTS
    (same leading axes) that every block consumes but never transforms —
    ULIP's positional embedding, PPTA's rel-pe centroid deltas.  These do
    NOT ride the ring: at tick t, device s holds the microbatch injected
    at tick t−s, so it re-takes extras[t−s] locally from the replicated
    store instead of receiving them via ppermute (micro_carry is already
    replicated into the shard_map, so this is free).  With extras,
    block_apply is called as block_apply(p, carry, extras).
    Returns the pytree after all L blocks, same leading axes.
    """
    idx = jax.lax.axis_index(axis)
    n_micro = jax.tree.leaves(micro_carry)[0].shape[0]

    def stage_fn(carry, extras):
        def blk(c, p):
            if micro_extras is None:
                return block_apply(p, c), None
            return block_apply(p, c, extras), None
        carry, _ = jax.lax.scan(blk, carry, local_blocks)
        return carry

    buf = jax.tree.map(jnp.zeros_like, take_micro(micro_carry, 0))
    outs = jax.tree.map(jnp.zeros_like, micro_carry)
    perm = ring_perm(n_stages)

    def tick(state, t):
        buf, outs = state
        inject = take_micro(micro_carry, jnp.clip(t, 0, n_micro - 1))
        buf = jax.tree.map(lambda i_, b: jnp.where(idx == 0, i_, b),
                           inject, buf)
        extras = None
        if micro_extras is not None:
            # the microbatch in flight here is m = t − idx (out-of-window
            # ticks compute on dead buffers that never reach the output,
            # so the clip is harmless)
            extras = take_micro(micro_extras,
                                jnp.clip(t - idx, 0, n_micro - 1))
        buf = stage_fn(buf, extras)
        m = t - (n_stages - 1)
        write = (idx == n_stages - 1) & (m >= 0) & (m < n_micro)
        mc = jnp.clip(m, 0, n_micro - 1)
        outs = jax.tree.map(
            lambda o, b: jnp.where(
                write, jax.lax.dynamic_update_index_in_dim(o, b, mc, 0), o),
            outs, buf)
        buf = jax.tree.map(lambda b: jax.lax.ppermute(b, axis, perm), buf)
        return (buf, outs), None

    (_, outs), _ = jax.lax.scan(tick, (buf, outs),
                                jnp.arange(n_micro + n_stages - 1))
    # outs is nonzero only on the last stage — psum broadcasts it
    return jax.tree.map(lambda o: jax.lax.psum(o, axis), outs)


def _split_micro(tree, n_micro: int):
    def r(a):
        B = a.shape[0]
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible into {n_micro} "
                             f"microbatches")
        return a.reshape(n_micro, B // n_micro, *a.shape[1:])
    return jax.tree.map(r, tree)


def _merge_micro(tree):
    return jax.tree.map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), tree)


def _make_pp_forward(mesh: Mesh, stage_axis: str, n_stages: int,
                     n_micro: int, block_apply, pre, post,
                     data_axis: Optional[str] = None, jit: bool = True,
                     tp_axis: Optional[str] = None, interleave: int = 1,
                     has_extras: bool = False):
    """Assemble the jitted PP forward from per-model pre/block/post fns.

    pre/post run replicated on every device (they are a negligible weight
    and FLOP fraction — the trunk holds the model's mass); only the trunk
    pipelines.  With `data_axis` (PP × DP on a 2-D mesh) each microbatch's
    batch dimension additionally shards over that axis — the same GPipe
    schedule runs per data shard, params replicate over `data`, and the
    stage psum stays stage-only.  With `tp_axis` (PP × TP) the shard_map
    goes PARTIAL-manual: manual over stage (and data), while the model
    axis stays automatic — each stage's block matrices carry their
    Megatron shardings (parallel/tp.py specs) and GSPMD inserts the
    per-block all-reduces over `tp_axis` inside the pipeline body.

    With `has_extras`, `pre` returns (carry, extras) and `block_apply` is
    called as block_apply(p, carry, extras): the extras pytree holds
    per-microbatch constants every block reads but never transforms
    (ULIP's pos embedding, PPTA's rel-pe deltas).  They are NOT rotated
    through the ring — the executors re-take them locally from the
    replicated store by the in-flight microbatch index, which halves
    ULIP's ring payload and removes PPTA's (B, S+1, S+1, 3) delta
    rotation entirely.  `post` receives the rotating carry only.
    """
    carry_spec = P(None, data_axis) if data_axis else P()

    if interleave > 1:
        from uni_adapter_tpu.parallel.pp_interleave import (
            build_interleaved_schedule, pipeline_interleaved)
        sched = build_interleaved_schedule(n_stages, interleave, n_micro)

        def pipe_body(stacked_local, micro_carry, micro_extras=None):
            local = jax.tree.map(lambda a: a[0], stacked_local)
            return pipeline_interleaved(block_apply, local, micro_carry,
                                        sched, stage_axis,
                                        micro_extras=micro_extras)
    else:
        def pipe_body(stacked_local, micro_carry, micro_extras=None):
            local = jax.tree.map(lambda a: a[0], stacked_local)
            return _pipeline(block_apply, local, micro_carry, n_stages,
                             stage_axis, micro_extras=micro_extras)

    manual = {stage_axis} | ({data_axis} if data_axis else set())
    in_specs = (P(stage_axis), carry_spec) + (
        (carry_spec,) if has_extras else ())
    pipe = jax.shard_map(
        pipe_body, mesh=mesh,
        in_specs=in_specs, out_specs=carry_spec,
        check_vma=False,
        **({"axis_names": manual} if tp_axis else {}))

    def fwd(pp_params, pc):
        stacked, rest = pp_params
        if has_extras:
            carry, extras = pre(rest, pc)
            carry = _merge_micro(pipe(stacked, _split_micro(carry, n_micro),
                                      _split_micro(extras, n_micro)))
        else:
            carry = pre(rest, pc)
            carry = _merge_micro(pipe(stacked, _split_micro(carry, n_micro)))
        return post(rest, carry)

    return jax.jit(fwd) if jit else fwd


# ---------------------------------------------------------------------------
# Per-model embedding (pre) and head (post) paths, shared with parallel/sp.py
# — ONE restatement of each model's non-block portion (see maintenance note
# in the module docstring; tests/test_pp.py and tests/test_sp.py both assert
# equality with the plain forward, so drift cannot land silently).
# ---------------------------------------------------------------------------

def uni3d_pre(model, rest, pc):
    """Uni3D embedding path: (B, N, 6) cloud -> (B, G+1, width) tokens+pos
    (reference point_encoder.py:99-210; `rest` = point_encoder params minus
    the blocks)."""
    from uni_adapter_tpu.models.uni3d import MiniPointNet, PosEmbedMLP
    from uni_adapter_tpu.ops.geometry import group_points

    xyz, color = pc[:, :, :3], pc[:, :, 3:]
    _, center, features = group_points(
        xyz, color, model.num_group, model.group_size,
        use_pallas_fps=model.use_pallas_fps,
        approx_knn=model.approx_knn,
        use_pallas_knn=model.use_pallas_knn,
        use_pallas_knn_gather=model.use_pallas_knn_gather)
    tokens = MiniPointNet(model.encoder_dim, 6, dtype=model.dtype).apply(
        {"params": rest["encoder"]}, features)
    tokens = nn.Dense(model.trans_dim, dtype=model.dtype).apply(
        {"params": rest["encoder2trans"]}, tokens)
    B = tokens.shape[0]
    pos = PosEmbedMLP(model.trans_dim, dtype=model.dtype).apply(
        {"params": rest["pos_embed"]}, center)
    x = jnp.concatenate(
        [jnp.broadcast_to(rest["cls_token"].astype(model.dtype),
                          (B, 1, model.trans_dim)), tokens], axis=1)
    pos = jnp.concatenate(
        [jnp.broadcast_to(rest["cls_pos"].astype(model.dtype),
                          (B, 1, model.trans_dim)), pos], axis=1)
    return x + pos   # pos added once (point_encoder.py:210)


def uni3d_post(model, rest, x):
    """Uni3D head: norm(CLS) -> fc_norm -> trans2embed (point_encoder.py
    :212-223)."""
    from uni_adapter_tpu.models.common import LN as _LN

    x = _LN(dtype=model.dtype).apply({"params": rest["norm"]}, x[:, 0, :])
    x = _LN(dtype=model.dtype).apply({"params": rest["fc_norm"]}, x)
    x = nn.Dense(model.embed_dim, dtype=model.dtype).apply(
        {"params": rest["trans2embed"]}, x)
    return x.astype(jnp.float32)


def ulip_pre(model, rest, pts):
    """ULIP Point-BERT embedding path -> (x, pos) carry; pos is re-added at
    every block (reference models/ulip/pointbert/point_encoder.py:95-98).
    `rest` = {"pe": point_encoder minus blocks, "pc_projection": ...}."""
    from uni_adapter_tpu.models.uni3d import MiniPointNet, PosEmbedMLP
    from uni_adapter_tpu.ops.geometry import group_points

    pe = rest["pe"]
    neighborhood, center, _ = group_points(
        pts, None, model.num_group, model.group_size,
        use_pallas_fps=model.use_pallas_fps,
        approx_knn=model.approx_knn,
        use_pallas_knn=model.use_pallas_knn,
        use_pallas_knn_gather=model.use_pallas_knn_gather)
    tokens = MiniPointNet(model.encoder_dim, 3, dtype=model.dtype).apply(
        {"params": pe["encoder"]}, neighborhood)
    tokens = nn.Dense(model.trans_dim, dtype=model.dtype).apply(
        {"params": pe["reduce_dim"]}, tokens)
    B = tokens.shape[0]
    pos = PosEmbedMLP(model.trans_dim, dtype=model.dtype).apply(
        {"params": pe["pos_embed"]}, center)
    x = jnp.concatenate(
        [jnp.broadcast_to(pe["cls_token"].astype(model.dtype),
                          (B, 1, model.trans_dim)), tokens], axis=1)
    pos = jnp.concatenate(
        [jnp.broadcast_to(pe["cls_pos"].astype(model.dtype),
                          (B, 1, model.trans_dim)), pos], axis=1)
    return x, pos


def ulip_post(model, rest, carry):
    """ULIP head: norm, [CLS ‖ max-pool] concat, pc_projection matmul
    (reference point_encoder.py:100-104 + ULIP.encode_pc)."""
    from uni_adapter_tpu.models.common import LN as _LN

    x, _ = carry
    x = _LN(dtype=model.dtype).apply({"params": rest["pe"]["norm"]}, x)
    concat_f = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)],
                               axis=-1)
    return jnp.matmul(concat_f.astype(jnp.float32),
                      rest["pc_projection"],
                      precision=jax.lax.Precision.HIGHEST)


def make_pp_forward_uni3d(model, mesh: Mesh, stage_axis: str = "stage",
                          n_micro: Optional[int] = None,
                          data_axis: Optional[str] = None, jit: bool = True,
                          tp_axis: Optional[str] = None,
                          interleave: int = 1):
    """(prepare_params, forward) for a pipeline-parallel Uni3D.

    prepare_params(params) -> pp_params: stacks the EVA block params over
    (stage, L/S) and shards them over `stage`; everything else replicates.
    forward(pp_params, pc) -> (B, embed_dim) fp32, equal to model.apply.
    `data_axis` composes PP × DP on a 2-D mesh (microbatch batch dimension
    sharded over it); `tp_axis` composes PP × TP (each stage's blocks
    Megatron-sharded over that axis, GSPMD all-reduces inside the ring) —
    all three compose on a 3-D (stage, model, data) mesh.  Head count and
    SwiGLU hidden dim must divide by the `tp_axis` size.
    `interleave=V` switches the GPipe schedule to the interleaved
    virtual-stage schedule (parallel/pp_interleave.py): each device holds V
    chunks of depth/(S·V) blocks and the fill/drain bubble shrinks ~V×;
    depth must divide by S·V.
    """
    from uni_adapter_tpu.models.common import EvaBlock

    S = mesh.shape[stage_axis]
    n_micro = n_micro or S
    block = EvaBlock(model.trans_dim, model.num_heads,
                     quantize=model.quantize,
                     use_pallas_attention=model.use_pallas_attention,
                     dtype=model.dtype)

    def block_apply(p, x):
        return block.apply({"params": p}, x)

    def prepare(params):
        pe = params["params"]["point_encoder"]
        if interleave > 1:
            from uni_adapter_tpu.parallel.pp_interleave import (
                stack_trunk_params_interleaved)
            stacked = stack_trunk_params_interleaved(pe, model.depth, S,
                                                     interleave)
        else:
            stacked = stack_trunk_params(pe, model.depth, S)
        rest = {k: v for k, v in pe.items() if not k.startswith("blocks_")}
        return (_shard_stacked(stacked, mesh, stage_axis, tp_axis,
                               lead=3 if interleave > 1 else 2),
                _shard(rest, mesh, P()))

    def pre(rest, pc):
        return uni3d_pre(model, rest, pc)

    def post(rest, x):
        return uni3d_post(model, rest, x)

    return prepare, _make_pp_forward(mesh, stage_axis, S, n_micro,
                                     block_apply, pre, post, data_axis, jit,
                                     tp_axis, interleave)


def make_pp_forward_openshape(model, mesh: Mesh, stage_axis: str = "stage",
                              n_micro: Optional[int] = None,
                              data_axis: Optional[str] = None,
                              jit: bool = True, interleave: int = 1):
    """(prepare_params, forward) for a pipeline-parallel OpenShape PPTA
    (cache_type='global', the TTA path).

    forward(pp_params, xyz, features) -> (B, out_channel) fp32.  With
    rel_pe each block recomputes its attention bias from the (B, S+1,
    S+1, 3) centroid-delta tensor (reference ppta.py:50-59); the delta is
    a per-microbatch constant, so it does NOT rotate through the ring —
    stages re-take it locally from the replicated store (extras path of
    _make_pp_forward), saving the ~3 MB/tick delta ppermute at 512
    patches.  Without rel_pe only the activations rotate and blocks get a
    dummy delta.  `interleave=V` selects the interleaved virtual-stage
    schedule (see make_pp_forward_uni3d).
    """
    from uni_adapter_tpu.models.common import LN
    from uni_adapter_tpu.models.ppta import (PPTABlockPair, SetAbstraction)

    if model.cache_type != "global":
        raise ValueError("pipeline forward covers cache_type='global' "
                         "(the TTA path)")
    p = model.preset
    S = mesh.shape[stage_axis]
    n_micro = n_micro or S
    block = PPTABlockPair(p.dim, p.heads, 64, p.mlp_dim, model.rel_pe,
                          use_pallas_attention=model.use_pallas_attention,
                          dtype=model.dtype)

    if model.rel_pe:
        def block_apply(pp, x, delta):
            return block.apply({"params": pp}, x, delta)
    else:
        def block_apply(pp, x):
            dummy = jnp.zeros((x.shape[0], 1, 1, 3), jnp.float32)
            return block.apply({"params": pp}, x, dummy)

    def prepare(params):
        ppat = params["params"]["ppat"]
        if interleave > 1:
            from uni_adapter_tpu.parallel.pp_interleave import (
                stack_trunk_params_interleaved)
            stacked = stack_trunk_params_interleaved(
                ppat, p.depth, S, interleave, fmt="layers_{}")
        else:
            stacked = stack_trunk_params(ppat, p.depth, S, fmt="layers_{}")
        rest = {
            "ppat": {k: v for k, v in ppat.items()
                     if not k.startswith("layers_")},
            "proj": params["params"]["proj"],
        }
        return (_shard(stacked, mesh, P(stage_axis)),
                _shard(rest, mesh, P()))

    def pre(rest, inputs):
        xyz, features = inputs
        ppat = rest["ppat"]
        centroids, feat = SetAbstraction(
            p.patches, p.prad, p.nsamp, (64, 64, p.sa_dim),
            use_pallas_fps=model.use_pallas_fps,
            use_pallas_ballq=model.use_pallas_ballq,
            dtype=model.dtype).apply({"params": ppat["sa"]}, xyz, features)
        x = jnp.concatenate([centroids.astype(model.dtype), feat], axis=-1)
        x = nn.Dense(p.dim, dtype=model.dtype).apply(
            {"params": ppat["lift"]}, x)
        x = LN(dtype=model.dtype).apply({"params": ppat["lift_norm"]}, x)
        B = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(ppat["cls_token"].astype(model.dtype),
                              (B, 1, p.dim)), x], axis=1)
        if not model.rel_pe:
            return x
        centroids = jnp.concatenate(
            [jnp.zeros((B, 1, 3), centroids.dtype), centroids], axis=1)
        delta = centroids[:, :, None, :] - centroids[:, None, :, :]
        return x, delta

    def post(rest, x):
        return nn.Dense(model.out_channel, dtype=jnp.float32).apply(
            {"params": rest["proj"]}, x[:, 0].astype(jnp.float32))

    pipe_fwd = _make_pp_forward(mesh, stage_axis, S, n_micro,
                                block_apply, pre, post, data_axis, jit,
                                interleave=interleave,
                                has_extras=model.rel_pe)

    def fwd(pp_params, xyz, features):
        return pipe_fwd(pp_params, (xyz, features))

    return prepare, fwd


def make_pp_forward_ulip(model, mesh: Mesh, stage_axis: str = "stage",
                         n_micro: Optional[int] = None,
                         data_axis: Optional[str] = None, jit: bool = True,
                         interleave: int = 1):
    """(prepare_params, forward) for a pipeline-parallel ULIP Point-BERT.

    Point-BERT re-adds the positional embedding at every block (reference
    point_encoder.py:95-98).  pos is a per-microbatch CONSTANT, so it does
    not ride the ring: only the activations rotate, and each stage
    re-takes its in-flight microbatch's pos locally from the replicated
    store (extras path of _make_pp_forward) — half the ring payload of
    rotating (x, pos).  `interleave=V` selects the interleaved
    virtual-stage schedule (see make_pp_forward_uni3d).
    """
    from uni_adapter_tpu.models.common import ViTBlock

    S = mesh.shape[stage_axis]
    n_micro = n_micro or S
    block = ViTBlock(model.trans_dim, model.num_heads,
                     use_pallas_attention=model.use_pallas_attention,
                     dtype=model.dtype)

    def block_apply(p, x, pos):
        return block.apply({"params": p}, x + pos)

    def prepare(params):
        pe = params["params"]["point_encoder"]
        if interleave > 1:
            from uni_adapter_tpu.parallel.pp_interleave import (
                stack_trunk_params_interleaved)
            stacked = stack_trunk_params_interleaved(pe, model.depth, S,
                                                     interleave)
        else:
            stacked = stack_trunk_params(pe, model.depth, S)
        rest = {
            "pe": {k: v for k, v in pe.items()
                   if not k.startswith("blocks_")},
            "pc_projection": params["params"]["pc_projection"],
        }
        return (_shard(stacked, mesh, P(stage_axis)),
                _shard(rest, mesh, P()))

    def pre(rest, pts):
        return ulip_pre(model, rest, pts)   # (x, pos) == (carry, extras)

    def post(rest, x):
        return ulip_post(model, rest, (x, None))

    return prepare, _make_pp_forward(mesh, stage_axis, S, n_micro,
                                     block_apply, pre, post, data_axis, jit,
                                     interleave=interleave, has_extras=True)


def make_pp_encode_fn(model, mesh: Mesh, kind: str = "uni3d",
                      stage_axis: str = "stage",
                      n_micro: Optional[int] = None,
                      tp_axis: Optional[str] = None,
                      interleave: int = 1):
    """(prepare_params, encode) for a pipeline-parallel TTA encoder.

    `encode(pp_params, pc, rgb)` matches engine.make_encode_fn's contract
    (per-backbone input conventions of the reference's get_logits_wrapper,
    Uni_Adapter.py:53-67, L2-normalised output) so it drops into
    engine.make_step_fn/make_scan_fn via `encode_fn=` — the adaptation
    loop is unchanged, only the trunk forward pipelines.  n_micro defaults
    to 1: TTA steps are batch-1 (2 with the fused noise-aug double fit),
    too small to microbatch — PP here is a capacity feature (trunks larger
    than one chip's HBM), not a throughput one.
    """
    from uni_adapter_tpu.engine import encode_with

    n_micro = 1 if n_micro is None else n_micro
    if tp_axis is not None and kind != "uni3d":
        raise ValueError(f"tp_axis is supported for kind='uni3d' only "
                         f"(got kind={kind!r}) — silently stage-only "
                         "sharding would defeat the point of asking for TP")
    if kind == "uni3d":
        prepare, fwd = make_pp_forward_uni3d(model, mesh, stage_axis,
                                             n_micro, jit=False,
                                             tp_axis=tp_axis,
                                             interleave=interleave)
    elif kind == "ulip":
        prepare, fwd = make_pp_forward_ulip(model, mesh, stage_axis,
                                            n_micro, jit=False,
                                            interleave=interleave)
    elif kind == "openshape":
        prepare, fwd = make_pp_forward_openshape(model, mesh, stage_axis,
                                                 n_micro, jit=False,
                                                 interleave=interleave)
    else:
        raise ValueError(kind)

    # input-convention dispatch + normalisation live in ONE place
    # (engine.encode_with); this module only supplies the pipelined forward
    return prepare, encode_with(kind, fwd)


# ---------------------------------------------------------------------------
# Pipeline-parallel pretraining (GPipe backward: jax.grad through the
# scheduled forward — ppermute/psum transpose to the reverse rotation, so
# each stage's block gradients stay on that stage's chip, as do its AdamW
# moments; only activations and their cotangents ride the ring)
# ---------------------------------------------------------------------------

def init_pp_train_state(model, rng, example_pc, tx, prepare,
                        init_logit_scale: Optional[float] = None):
    """TrainState whose params are the stage-sharded (stacked, rest) pair;
    optimizer state inherits the same shardings via tx.init.

    `example_pc` is passed to model.init — a (B, N, 6) cloud for Uni3D,
    (B, N, 3) for ULIP, or an (xyz, features) tuple for OpenShape."""
    from uni_adapter_tpu.train import TrainState

    if init_logit_scale is None:
        init_logit_scale = float(jnp.log(1 / 0.07))
    init_args = (example_pc if isinstance(example_pc, tuple)
                 else (example_pc,))
    pp_params = prepare(model.init(rng, *init_args))
    logit_scale = jnp.float32(init_logit_scale)
    opt_state = tx.init((pp_params, logit_scale))
    return TrainState(pp_params, logit_scale, opt_state, jnp.int32(0))


def _make_pp_train_step(tx, fwd, n_model_inputs: int,
                        donate: bool = False):
    """Contrastive train step over an (unjitted) PP forward: the reference's
    training-era loss (models/losses.py:7-69) on the pipelined encoder.

    train_step(state, *model_inputs, text_embed, image_embed, mask)
    -> (state, metrics) with state.params = the stage-sharded
    (stacked, rest) pair.  The loss sees the globally assembled embeddings
    (the forward's output is replicated), so with a data axis the
    negatives are global by construction — equal to the single-device step
    on the same batch (tested in tests/test_pp.py).  `donate=True` donates
    the input state's buffers (halves peak memory; invalidates the input —
    see train.make_dp_train_step)."""
    from uni_adapter_tpu.models.losses import uni3d_text_image_loss
    from uni_adapter_tpu.train import _apply_grads

    def loss_fn(pp_params, logit_scale, model_inputs, text_embed,
                image_embed, mask):
        pc_embed = fwd(pp_params, *model_inputs)
        out = uni3d_text_image_loss(pc_embed, text_embed, image_embed,
                                    jnp.exp(logit_scale), mask=mask,
                                    axis_name=None)
        return out["loss"], out

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, *args, mask=None):
        model_inputs, (text_embed, image_embed) = \
            args[:n_model_inputs], args[n_model_inputs:n_model_inputs + 2]
        if len(args) > n_model_inputs + 2:
            mask = args[n_model_inputs + 2]
        if mask is None:
            mask = jnp.ones((text_embed.shape[0],), jnp.float32)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, state.logit_scale, model_inputs, text_embed,
            image_embed, mask)
        return _apply_grads(state, tx, grads), metrics

    return train_step


def make_pp_train_step_uni3d(model, tx, mesh: Mesh,
                             stage_axis: str = "stage",
                             n_micro: Optional[int] = None,
                             data_axis: Optional[str] = None,
                             tp_axis: Optional[str] = None,
                             interleave: int = 1, donate: bool = False):
    """(prepare_params, train_step) for pipeline-parallel contrastive
    pretraining of a Uni3D point encoder (no PP exists upstream —
    SURVEY.md §2.4).  train_step(state, pc, text_embed, image_embed, mask);
    `tp_axis` composes PP × TP training (block grads and moments shard
    over BOTH stage and model axes); `interleave=V` trains through the
    interleaved virtual-stage schedule (jax.grad transposes the tick scan,
    so the backward inherits the same ~V× smaller fill/drain bubble)."""
    prepare, fwd = make_pp_forward_uni3d(model, mesh, stage_axis, n_micro,
                                         data_axis, jit=False,
                                         tp_axis=tp_axis,
                                         interleave=interleave)
    return prepare, _make_pp_train_step(tx, fwd, 1, donate=donate)


def make_pp_train_step_ulip(model, tx, mesh: Mesh,
                            stage_axis: str = "stage",
                            n_micro: Optional[int] = None,
                            data_axis: Optional[str] = None,
                            donate: bool = False):
    """PP pretraining for the ULIP Point-BERT encoder:
    train_step(state, pts, text_embed, image_embed, mask), pts (B, N, 3)."""
    prepare, fwd = make_pp_forward_ulip(model, mesh, stage_axis, n_micro,
                                        data_axis, jit=False)
    return prepare, _make_pp_train_step(tx, fwd, 1, donate=donate)


def make_pp_train_step_openshape(model, tx, mesh: Mesh,
                                 stage_axis: str = "stage",
                                 n_micro: Optional[int] = None,
                                 data_axis: Optional[str] = None,
                                 donate: bool = False):
    """PP pretraining for the OpenShape PPTA encoder:
    train_step(state, xyz, features, text_embed, image_embed, mask)."""
    prepare, fwd = make_pp_forward_openshape(model, mesh, stage_axis,
                                             n_micro, data_axis, jit=False)
    return prepare, _make_pp_train_step(tx, fwd, 2, donate=donate)
