"""Sequence parallelism for the encoder trunks (exact ring attention over a
`seq` mesh axis: shard_map + lax.ppermute).

The reference has no sequence parallelism anywhere (SURVEY.md §2.4 —
single-GPU inference, 513-token sequences; file:line n/a, capability absent
upstream).  This module completes the parallelism portfolio alongside DP
(parallel/mesh.py), TP (parallel/tp.py) and PP (parallel/pp.py,
pp_interleave.py): it is the large-N lever for scene-scale point clouds,
where the trunk's token count G grows with the cloud (num_group scales with
npoints) and the (G, G) attention-score buffers plus the per-token matmuls
outgrow one chip.

Mechanics: the token axis shards over `seq` — every chip holds N/S tokens
and the FULL block weights (replicated; shard them over a `model` axis via
parallel/tp.py if weights are also too large).  LayerNorms, qkv/out
projections and the MLP are per-token and run purely locally; only
attention mixes tokens, and it runs as an exact ring:

    K/V shards rotate around the device ring (one lax.ppermute per hop)
    while each chip folds the arriving key block into a running online
    softmax (m, l, o) — the flash-attention recurrence.  After S hops every
    query has attended to every key; o/l equals full softmax(QKᵀ)·V exactly
    up to fp reassociation.

Token counts that don't divide the mesh (the flagship's 513 = 512 groups
+ CLS) are right-padded to a multiple of S; a validity mask rides the ring
with K/V so padded keys score -1e30 (exp → 0) and padded query rows are
sliced off before the head.  Communication per block is one (B, n_loc,
width·2/S)-sized K/V hop per ring step — bandwidth rides ICI and overlaps
the local matmuls under XLA's latency-hiding scheduler.

Numerics: the softmax accumulators are fp32 regardless of compute dtype
(under bf16 the plain path stores (N, N) logits in bf16 — see
models/common._attend — so the SP forward is slightly MORE precise there;
parity tests run fp32 where both paths agree to ~1e-6).  int8 trunks
(model.quantize) are not supported — QuantDense's per-row activation scales
are token-local so they'd compose, but the opt-in int8 path is measured
slower on current hardware (BASELINE.md) and is not worth the extra
restatement here.

Composes with DP on a 2-D (data, seq) mesh (batch over `data`, tokens over
`seq`) and differentiates: ppermute transposes to the reverse rotation, so
jax.grad trains straight through the ring (make_sp_train_step_uni3d).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uni_adapter_tpu.parallel.pp import (
    _make_pp_train_step, ring_perm, stack_trunk_flat, ulip_post,
    ulip_pre, uni3d_post, uni3d_pre)

_NEG = -1e30   # finite -inf stand-in: exp(_NEG - m) == 0, no NaN from inf-inf


def ring_attention(q, k, v, scale: float, axis: str,
                   kv_valid: Optional[jax.Array] = None) -> jax.Array:
    """Exact full attention over token shards; runs inside shard_map.

    q, k, v: (B, H, n_loc, hd) — this chip's token shard.
    kv_valid: (n_loc,) float/bool mask for this shard's KEYS (1 = real
        token, 0 = right-padding); None means all keys are real.
    Returns (B, H, n_loc, hd) in v.dtype: softmax(QKᵀ·scale)·V over the
    full (global) key set, via S ppermute hops + online-softmax folding.
    Rows whose queries are padding come back as garbage — slice them off.
    """
    S = jax.lax.axis_size(axis)
    B, H, n_loc, hd = q.shape
    qf = q.astype(jnp.float32)
    if kv_valid is None:
        kv_valid = jnp.ones((n_loc,), jnp.float32)
    valid = kv_valid.astype(jnp.float32)

    m0 = jnp.full((B, H, n_loc, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((B, H, n_loc, 1), jnp.float32)
    o0 = jnp.zeros((B, H, n_loc, hd), jnp.float32)
    perm = ring_perm(S)

    def fold(acc, kb, vb, vmask):
        m, l, o = acc
        s = jnp.einsum("bhnd,bhmd->bhnm", qf, kb.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(vmask[None, None, None, :] > 0.5, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)            # padded keys: exp(≤ _NEG-m) == 0
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum("bhnm,bhmd->bhnd", p,
                                  vb.astype(jnp.float32),
                                  preferred_element_type=jnp.float32)
        return m_new, l, o

    def hop(carry, _):
        acc, kb, vb, vmask = carry
        acc = fold(acc, kb, vb, vmask)
        kb, vb, vmask = (jax.lax.ppermute(t, axis, perm)
                         for t in (kb, vb, vmask))
        return (acc, kb, vb, vmask), None

    # S folds need only S-1 rotations: the last arriving shard folds
    # OUTSIDE the scan, so no hop's K/V/mask permute is computed-and-
    # discarded (inside a scan XLA cannot DCE the dead collective)
    (acc, kb, vb, vmask), _ = jax.lax.scan(
        hop, ((m0, l0, o0), k, v, valid), None, length=S - 1)
    _, l, o = fold(acc, kb, vb, vmask)
    return (o / jnp.maximum(l, 1e-30)).astype(v.dtype)


# ---------------------------------------------------------------------------
# Token-sharded block bodies.  These re-state EvaBlock / ViTBlock with the
# SAME param-tree layout and flax submodules (models/common.py), swapping
# only the dense softmax for ring_attention — tests/test_sp.py asserts
# equality with the plain forward on every run, so drift cannot land
# silently (same contract as the pp.py pre/post restatement).
# ---------------------------------------------------------------------------

def _heads(t, B, n, H, hd):
    return jnp.transpose(t.reshape(B, n, H, hd), (0, 2, 1, 3))


def _unheads(t, B, n, dim):
    return jnp.transpose(t, (0, 2, 1, 3)).reshape(B, n, dim)


def _sp_eva_block(model, p, x, valid, axis: str):
    """EvaBlock (models/common.py:264-292) on a (B, n_loc, D) token shard:
    separate q/k/v with per-head q/k LayerNorm, ring attention, SwiGLU."""
    from uni_adapter_tpu.models.common import LN, SwiGLU

    dim, H = model.trans_dim, model.num_heads
    hd = dim // H
    B, n_loc = x.shape[0], x.shape[1]
    h = LN(dtype=model.dtype).apply({"params": p["norm1"]}, x)
    a = p["attn"]
    q = nn.Dense(dim, use_bias=True, dtype=model.dtype).apply(
        {"params": a["q_proj"]}, h)
    k = nn.Dense(dim, use_bias=False, dtype=model.dtype).apply(
        {"params": a["k_proj"]}, h)
    v = nn.Dense(dim, use_bias=True, dtype=model.dtype).apply(
        {"params": a["v_proj"]}, h)
    q, k, v = (_heads(t, B, n_loc, H, hd) for t in (q, k, v))
    q = LN(dtype=model.dtype).apply({"params": a["q_norm"]}, q)
    k = LN(dtype=model.dtype).apply({"params": a["k_norm"]}, k)
    out = ring_attention(q, k, v, hd ** -0.5, axis, valid)
    out = nn.Dense(dim, dtype=model.dtype).apply(
        {"params": a["proj"]}, _unheads(out, B, n_loc, dim))
    x = x + out
    # Uni3D (the wrapper) fixes the EVA02 SwiGLU ratio; PointcloudEncoder
    # exposes it — accept either (EvaBlock default: 4·2/3)
    mlp_ratio = getattr(model, "mlp_ratio", 4 * 2 / 3)
    x = x + SwiGLU(dim, int(dim * mlp_ratio),
                   dtype=model.dtype).apply(
        {"params": p["mlp"]}, LN(dtype=model.dtype).apply(
            {"params": p["norm2"]}, x))
    return x


def _sp_vit_block(model, p, x, valid, axis: str):
    """ViTBlock (models/common.py:237-261) on a token shard: fused-qkv
    attention (no qkv bias — Point-BERT), ring attention, GELU MLP."""
    from uni_adapter_tpu.models.common import LN, Mlp

    dim, H = model.trans_dim, model.num_heads
    hd = dim // H
    B, n_loc = x.shape[0], x.shape[1]
    h = LN(dtype=model.dtype).apply({"params": p["norm1"]}, x)
    qkv = nn.Dense(dim * 3, use_bias=False, dtype=model.dtype).apply(
        {"params": p["attn"]["qkv"]}, h)
    qkv = qkv.reshape(B, n_loc, 3, H, hd)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    out = ring_attention(q, k, v, hd ** -0.5, axis, valid)
    out = nn.Dense(dim, dtype=model.dtype).apply(
        {"params": p["attn"]["proj"]}, _unheads(out, B, n_loc, dim))
    x = x + out
    x = x + Mlp(dim, int(dim * 4.0), dtype=model.dtype).apply(
        {"params": p["mlp"]}, LN(dtype=model.dtype).apply(
            {"params": p["norm2"]}, x))
    return x


# ---------------------------------------------------------------------------
# Forwards
# ---------------------------------------------------------------------------

def _make_sp_forward(model, mesh: Mesh, seq_axis: str, block_body, pre,
                     post, data_axis: Optional[str] = None,
                     jit: bool = True):
    """Assemble the jitted SP forward.

    block_body(model, p, carry, valid, axis) applies ONE trunk block to a
    token shard; the trunk scans it over the (L, ...) stacked block params
    (replicated — every chip runs every block, on its tokens).  pre/post
    run replicated (negligible FLOP fraction; the trunk holds the mass).
    The carry is a pytree whose leaves are (B, n_tok, ...) — ULIP carries
    (x, pos) since pos is re-added every block.
    """
    S = mesh.shape[seq_axis]
    carry_spec = P(data_axis, seq_axis)

    def trunk(stacked, carry, valid):
        def blk(c, p):
            return block_body(model, p, c, valid, seq_axis), None
        carry, _ = jax.lax.scan(blk, carry, stacked)
        return carry

    shmap = jax.shard_map(
        trunk, mesh=mesh,
        in_specs=(P(), carry_spec, P(seq_axis)), out_specs=carry_spec,
        check_vma=False)

    def fwd(sp_params, pc):
        stacked, rest = sp_params
        carry = pre(rest, pc)
        n_tok = jax.tree.leaves(carry)[0].shape[1]
        pad = (-n_tok) % S
        if pad:
            carry = jax.tree.map(
                lambda a: jnp.pad(a, ((0, 0), (0, pad)) +
                                  ((0, 0),) * (a.ndim - 2)), carry)
        valid = (jnp.arange(n_tok + pad) < n_tok).astype(jnp.float32)
        carry = shmap(stacked, carry, valid)
        if pad:
            carry = jax.tree.map(lambda a: a[:, :n_tok], carry)
        return post(rest, carry)

    return jax.jit(fwd) if jit else fwd


def _prepare(params_trunk_key, mesh, depth, params, fmt="blocks_{}"):
    trunk = params["params"][params_trunk_key]
    stacked = stack_trunk_flat(trunk, depth, fmt=fmt)  # (L, ...) flat stack
    rep = NamedSharding(mesh, P())
    put = lambda t: jax.device_put(t, jax.tree.map(lambda _: rep, t))
    return put(stacked), trunk


def make_sp_forward_uni3d(model, mesh: Mesh, seq_axis: str = "seq",
                          data_axis: Optional[str] = None, jit: bool = True):
    """(prepare_params, forward) for a sequence-parallel Uni3D.

    prepare_params(params) -> sp_params: (L, ...)-stacked EVA block params
    + the rest, all replicated; forward(sp_params, pc) -> (B, embed_dim)
    fp32, equal to model.apply (tokens sharded over `seq`, exact ring
    attention).  `data_axis` composes SP × DP on a 2-D (data, seq) mesh.
    """
    if model.quantize:
        raise ValueError("sequence parallelism does not support the int8 "
                         "trunk (see module docstring)")

    def prepare(params):
        stacked, pe = _prepare("point_encoder", mesh, model.depth, params)
        rest = {k: v for k, v in pe.items() if not k.startswith("blocks_")}
        return stacked, rest

    return prepare, _make_sp_forward(
        model, mesh, seq_axis, _sp_eva_block,
        lambda rest, pc: uni3d_pre(model, rest, pc),
        lambda rest, x: uni3d_post(model, rest, x),
        data_axis, jit)


def make_sp_forward_ulip(model, mesh: Mesh, seq_axis: str = "seq",
                         data_axis: Optional[str] = None, jit: bool = True):
    """(prepare_params, forward) for a sequence-parallel ULIP Point-BERT.

    The carry is (x, pos), both token-sharded — Point-BERT re-adds the
    positional embedding at every block (reference
    models/ulip/pointbert/point_encoder.py:95-98), so each shard holds its
    tokens' pos rows and the re-add stays local.
    """
    def block_body(model_, p, carry, valid, axis):
        x, pos = carry
        return _sp_vit_block(model_, p, x + pos, valid, axis), pos

    def prepare(params):
        stacked, pe = _prepare("point_encoder", mesh, model.depth, params)
        rest = {"pe": {k: v for k, v in pe.items()
                       if not k.startswith("blocks_")},
                "pc_projection": params["params"]["pc_projection"]}
        return stacked, rest

    return prepare, _make_sp_forward(
        model, mesh, seq_axis, block_body,
        lambda rest, pts: ulip_pre(model, rest, pts),
        lambda rest, carry: ulip_post(model, rest, carry),
        data_axis, jit)


def make_sp_encode_fn(model, mesh: Mesh, kind: str = "uni3d",
                      seq_axis: str = "seq"):
    """(prepare_params, encode) for a sequence-parallel TTA encoder.

    `encode(sp_params, pc, rgb)` matches engine.make_encode_fn's contract
    (input conventions of the reference's get_logits_wrapper,
    Uni_Adapter.py:53-67, L2-normalised output) so it drops into
    engine.make_step_fn/make_scan_fn via `encode_fn=` — only the trunk
    forward changes.  OpenShape's PPTA is intentionally out of scope: its
    trunk is the smallest of the three (tiny presets, 32-token windows)
    while its rel-pe bias couples query AND key centroids per block — no
    large-N payoff to buy that complexity.
    """
    from uni_adapter_tpu.engine import encode_with

    if kind == "uni3d":
        prepare, fwd = make_sp_forward_uni3d(model, mesh, seq_axis,
                                             jit=False)
    elif kind == "ulip":
        prepare, fwd = make_sp_forward_ulip(model, mesh, seq_axis,
                                            jit=False)
    else:
        raise ValueError(f"sequence parallelism covers kind='uni3d'|'ulip' "
                         f"(got {kind!r})")
    return prepare, encode_with(kind, fwd)


def make_sp_train_step_uni3d(model, tx, mesh: Mesh, seq_axis: str = "seq",
                             data_axis: Optional[str] = None,
                             donate: bool = False):
    """(prepare_params, train_step) for sequence-parallel contrastive
    pretraining of a Uni3D point encoder: jax.grad rides straight through
    the ring (ppermute transposes to the reverse rotation), so activations
    AND their cotangents stay token-sharded through the trunk.
    train_step(state, pc, text_embed, image_embed, mask) — the loss sees
    the replicated (B, embed_dim) output, so negatives are global by
    construction (same contract as the PP train steps)."""
    prepare, fwd = make_sp_forward_uni3d(model, mesh, seq_axis, data_axis,
                                         jit=False)
    return prepare, _make_pp_train_step(tx, fwd, 1, donate=donate)
