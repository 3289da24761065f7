"""Fused Pallas attention vs the XLA reference implementation."""
import numpy as np
import jax
import jax.numpy as jnp

from uni_adapter_tpu.ops.attention_pallas import (attention_pallas,
                                                   attention_pallas_heads)


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)


def test_fused_attention_matches_xla():
    rng = np.random.default_rng(0)
    B, H, N, hd = 2, 3, 70, 32          # N, hd both unaligned
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    want = np.asarray(_xla_attention(q, k, v, hd ** -0.5))
    got = np.asarray(attention_pallas(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_attention_rows_are_convex():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)), jnp.float32)
    v = jnp.ones((1, 2, 16, 8), jnp.float32)
    out = np.asarray(attention_pallas(q, q, v, interpret=True))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)  # convex combo of ones


def test_heads_kernel_matches_xla():
    """The round-2 per-batch-element kernel across mask modes and groupings
    (odd N exercises the padded-key mask; N=128 the mask-free path)."""
    rng = np.random.default_rng(2)
    for B, H, N, hd in [(2, 3, 70, 32), (1, 2, 128, 64), (3, 4, 77, 16)]:
        q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, hd)),
                               jnp.float32) for _ in range(3))
        want = np.asarray(_xla_attention(q, k, v, hd ** -0.5))
        for bg, hg in [(1, 8), (1, 2), (B, H)]:
            got = np.asarray(attention_pallas_heads(
                q, k, v, interpret=True, head_group=hg, batch_group=bg))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_heads_kernel_bf16_close_to_fp32():
    """bf16 I/O: fp32 scores/softmax inside the kernel keep the error at
    bf16 input-rounding scale."""
    rng = np.random.default_rng(3)
    B, H, N, hd = 2, 2, 60, 32
    q32, k32, v32 = (jnp.asarray(rng.standard_normal((B, H, N, hd)),
                                 jnp.float32) for _ in range(3))
    want = np.asarray(_xla_attention(q32, k32, v32, hd ** -0.5))
    got = np.asarray(attention_pallas_heads(
        q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        v32.astype(jnp.bfloat16), interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)


def test_model_flag_swaps_attention_numerically_consistent():
    """use_pallas_attention=True (interpret fallback unavailable on CPU, so
    compare the _attend dispatch directly in interpret mode)."""
    from uni_adapter_tpu.models import common

    rng = np.random.default_rng(4)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 3, 33, 16)),
                           jnp.float32) for _ in range(3))
    base = np.asarray(common._attend(q, k, v, 0.25))
    fused = np.asarray(attention_pallas_heads(q, k, v, 0.25, interpret=True))
    np.testing.assert_allclose(fused, base, rtol=1e-4, atol=1e-5)


def test_heads_kernel_uniformly_negative_scores_no_nan():
    """Underflow regression (ADVICE r2): when every REAL raw score in a row
    sits far below the pad columns' exact-zero q·k, a row max taken over the
    padded plane would underflow all real exp terms and the pad-zeroed row
    sum would hit 0 → NaN.  The max must cover real keys only."""
    rng = np.random.default_rng(5)
    B, H, N, hd = 1, 2, 33, 16          # N=33 pads to 128 lanes ⇒ pad cols
    # orthogonal-ish q with huge negative projections on every key
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    k = -200.0 * q                       # q·k ≈ −200·|q|² ≪ −88/scale
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    want = np.asarray(_xla_attention(q, k, v, hd ** -0.5))
    got = np.asarray(attention_pallas_heads(q, k, v, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_eva_fused_kernel_matches_module_math():
    """eva_attention_fused (natural layout, in-kernel LN) == the
    transpose + flax-LN + _attend module math, bf16 tolerance."""
    import flax.linen as nn
    from uni_adapter_tpu.models.common import _attend
    from uni_adapter_tpu.ops.attention_pallas import eva_attention_fused

    B, N, D, H = 2, 37, 64, 4
    hd = D // H
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    gq = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    bq = jnp.asarray(rng.standard_normal(hd) * 0.1, jnp.float32)
    gk = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    bk = jnp.asarray(rng.standard_normal(hd) * 0.1, jnp.float32)
    scale = hd ** -0.5

    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    qh = jnp.transpose(q.reshape(B, N, H, hd), (0, 2, 1, 3))
    kh = jnp.transpose(k.reshape(B, N, H, hd), (0, 2, 1, 3))
    vh = jnp.transpose(v.reshape(B, N, H, hd), (0, 2, 1, 3))
    qh = ln.apply({"params": {"scale": gq, "bias": bq}}, qh)
    kh = ln.apply({"params": {"scale": gk, "bias": bk}}, kh)
    want = jnp.transpose(_attend(qh, kh, vh, scale), (0, 2, 1, 3)
                         ).reshape(B, N, D)

    got = eva_attention_fused(q, k, v, gq, bq, gk, bk, num_heads=H,
                              scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_eva_fused_kernel_noln_variant():
    """apply_ln=False (LN handled upstream on the natural reshape): the
    kernel is pure attention over lane-sliced heads."""
    from uni_adapter_tpu.models.common import _attend
    from uni_adapter_tpu.ops.attention_pallas import eva_attention_fused

    B, N, D, H = 2, 21, 32, 2
    hd = D // H
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    scale = hd ** -0.5
    qh = jnp.transpose(q.reshape(B, N, H, hd), (0, 2, 1, 3))
    kh = jnp.transpose(k.reshape(B, N, H, hd), (0, 2, 1, 3))
    vh = jnp.transpose(v.reshape(B, N, H, hd), (0, 2, 1, 3))
    want = jnp.transpose(_attend(qh, kh, vh, scale), (0, 2, 1, 3)
                         ).reshape(B, N, D)
    got = eva_attention_fused(q, k, v, num_heads=H, scale=scale,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_eva_attention_module_pallas_path_matches_plain():
    """EvaAttention(use_pallas=True) routes through the natural-layout
    fused kernel (interpret mode off-TPU is not wired into the module, so
    compare the module's two code paths at the math level): the flax LN
    on the (B, N, H, hd) natural reshape must equal the LN on the
    transposed layout — same params, same per-element normalisation."""
    import flax.linen as nn

    B, N, H, hd = 2, 9, 3, 8
    D = H * hd
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    gq = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
    bq = jnp.asarray(rng.standard_normal(hd) * 0.1, jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
    a = ln.apply({"params": {"scale": gq, "bias": bq}},
                 x.reshape(B, N, H, hd)).reshape(B, N, D)
    b = jnp.transpose(
        ln.apply({"params": {"scale": gq, "bias": bq}},
                 jnp.transpose(x.reshape(B, N, H, hd), (0, 2, 1, 3))),
        (0, 2, 1, 3)).reshape(B, N, D)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)


def test_eva_block_kernel_matches_module_math():
    """eva_attn_block_fused (whole-span kernel: q/k/v/out projections +
    per-head LN + attention in one pallas call) equals the flax
    EvaAttention path fed the SAME params (interpret mode)."""
    from uni_adapter_tpu.models.common import EvaAttention
    from uni_adapter_tpu.ops.attention_pallas import eva_attn_block_fused

    B, N, D, H = 2, 37, 128, 4
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32
                    ).astype(jnp.bfloat16)
    mod = EvaAttention(D, H)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    pp = params["params"]
    got = eva_attn_block_fused(
        x, pp["q_proj"]["kernel"], pp["q_proj"]["bias"],
        pp["k_proj"]["kernel"], pp["v_proj"]["kernel"],
        pp["v_proj"]["bias"], pp["q_norm"]["scale"], pp["q_norm"]["bias"],
        pp["k_norm"]["scale"], pp["k_norm"]["bias"],
        pp["proj"]["kernel"], pp["proj"]["bias"], num_heads=H,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_eva_block_param_holders_identical_tree():
    """The use_pallas_block branch creates a param tree byte-identical to
    the Dense/LN branch — same names, shapes, AND initial values (flax
    path-derived RNG), so checkpoints and the converter are agnostic."""
    from uni_adapter_tpu.models.common import EvaAttention

    B, N, D, H = 1, 9, 64, 2
    x = jnp.zeros((B, N, D), jnp.bfloat16)
    p_ref = jax.jit(EvaAttention(D, H).init)(jax.random.PRNGKey(3), x)
    p_blk = jax.jit(EvaAttention(D, H, use_pallas_block=True).init)(
        jax.random.PRNGKey(3), x)
    flat_ref = jax.tree_util.tree_flatten_with_path(p_ref)[0]
    flat_blk = jax.tree_util.tree_flatten_with_path(p_blk)[0]
    assert [jax.tree_util.keystr(k) for k, _ in flat_ref] == \
        [jax.tree_util.keystr(k) for k, _ in flat_blk]
    for (_, a), (_, b) in zip(flat_ref, flat_blk):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
