"""Data pipeline, tokenizer, and text-anchor tests (SURVEY.md §4 layer 3:
golden-file tests vs the shipped precomputed banks)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import anchors
from uni_adapter_tpu.config import ASSETS_DIR, Config, DataConfig, load_labels, load_templates
from uni_adapter_tpu.data import datasets as ds
from uni_adapter_tpu.utils.tokenizer import SimpleTokenizer, tokenize


# ---------------- datasets ----------------

def _write_corruption(root, corruption, severity, T=8, N=32, K=40, seed=0):
    rng = np.random.default_rng(seed)
    np.save(os.path.join(root, f"data_{corruption}_{severity}.npy"),
            rng.standard_normal((T, N, 3)).astype(np.float32))
    np.save(os.path.join(root, "label.npy"),
            rng.integers(0, K, (T,)).astype(np.int64))


def test_modelnet40c_loading(tmp_path):
    _write_corruption(tmp_path, "uniform", 5)
    d = ds.modelnet40_c(str(tmp_path), "uniform", 5)
    assert len(d) == 8
    pc, label, name, rgb = d[0]
    assert pc.shape == (32, 3) and rgb.shape == (32, 3)
    assert np.all(rgb == 1.0)
    assert name == ds.MODELNET40_CLASSES[label]


def test_debug_slice(tmp_path):
    _write_corruption(tmp_path, "gaussian", 5)
    d = ds.modelnet40_c(str(tmp_path), "gaussian", 5, debug=True)
    assert len(d) == 5


def test_scanobjectnn_label_quirk(tmp_path):
    rng = np.random.default_rng(0)
    np.save(os.path.join(tmp_path, "data_shear_5.npy"),
            rng.standard_normal((6, 16, 3)).astype(np.float32))
    # labels stored [1, T] — the reference's workaround case
    np.save(os.path.join(tmp_path, "label.npy"),
            rng.integers(0, 15, (1, 6)).astype(np.int64))
    d = ds.scanobjectnn_c(str(tmp_path), "shear", 5)
    _, label, name, _ = d[3]
    assert 0 <= label < 15 and name == ds.SCANOBJECTNN_CLASSES[label]


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ds.load_data(str(tmp_path), "uniform", 5)


def test_iter_batches_order(tmp_path):
    _write_corruption(tmp_path, "lidar", 5, T=5)
    d = ds.modelnet40_c(str(tmp_path), "lidar", 5)
    batches = list(d.iter_batches(batch_size=1))
    assert len(batches) == 5
    for i, (pc, rgb, lab) in enumerate(batches):
        np.testing.assert_array_equal(pc[0], np.asarray(d.data[i]))


def test_iter_batches_ragged_resampling():
    """Ragged object-array data stacks into batch_size>1 batches once
    npoints is given (same resample-with-replacement convention as
    as_arrays); without npoints ragged batching cannot stack."""
    rng = np.random.default_rng(0)
    ragged = np.empty(4, object)
    for i, n in enumerate((40, 50, 32, 50)):
        ragged[i] = rng.standard_normal((n, 3)).astype(np.float32)
    d = ds.TTADataset(ragged, np.zeros(4, np.int64), ["thing"])
    batches = list(d.iter_batches(batch_size=2, npoints=32))
    assert len(batches) == 2
    for pc, rgb, lab in batches:
        assert pc.shape == (2, 32, 3) and rgb.shape == (2, 32, 3)
    # the 32-point cloud passes through unresampled, in dataset order
    np.testing.assert_array_equal(batches[1][0][0], np.asarray(ragged[2]))
    with pytest.raises(ValueError):
        list(d.iter_batches(batch_size=2))


def test_as_arrays_resampling():
    d = ds.make_synthetic("modelnet", n_samples=6, npoints=50)
    pcs, rgbs, labs = d.as_arrays(batch_size=1, npoints=32)
    assert pcs.shape == (6, 1, 32, 3)
    assert np.all(rgbs == 1.0)
    assert labs.shape == (6, 1)


def test_load_tta_dataset_dispatch(tmp_path):
    _write_corruption(tmp_path, "uniform", 5, K=55)
    cfg = Config(data=DataConfig(root=str(tmp_path), corruption="uniform",
                                 dataset_name="shapenetcore"))
    d = ds.load_tta_dataset(cfg)
    assert d.class_names == ds.SHAPENETCORE_CLASSES


def test_class_tables_sizes():
    assert len(ds.MODELNET40_CLASSES) == 40
    assert len(ds.SCANOBJECTNN_CLASSES) == 15
    assert len(ds.SHAPENETCORE_CLASSES) == 55


def test_labels_match_assets():
    # labels.json uses spaces where the dataset tables use underscores; the
    # prompt pipeline normalises '_' → ' ' (Uni_Adapter.py:36), so compare
    # post-normalisation.
    cfg = Config()
    got = [n.replace("_", " ") for n in load_labels(cfg)]
    want = [n.replace("_", " ") for n in ds.MODELNET40_CLASSES]
    assert got == want
    assert len(load_templates(cfg)) == 64


# ---------------- tokenizer ----------------

def test_tokenizer_golden_clip_ids():
    """Known CLIP tokenizations (golden values from the public CLIP vocab)."""
    tok = SimpleTokenizer()
    out = tok("a photo of a cat")
    assert out.shape == (1, 77)
    assert out[0, 0] == 49406 and out[0, 6] == 49407      # SOT/EOT
    np.testing.assert_array_equal(out[0, 1:6], [320, 1125, 539, 320, 2368])
    assert np.all(out[0, 7:] == 0)                        # zero padding


def test_tokenizer_roundtrip():
    tok = SimpleTokenizer()
    text = "a point cloud depth map of a night_stand."
    ids = tok.encode(text.replace("_", " "))
    assert tok.decode(ids).strip() == "a point cloud depth map of a night stand ."


def test_tokenizer_truncation():
    """Plain truncation to 77 tokens, EOT dropped off the end — the
    reference's exact behaviour (tokenizer.py:146-147), NOT the open_clip
    variant that force-appends EOT (which would move the encoder's
    EOT-argmax pooling position for long prompts)."""
    tok = SimpleTokenizer()
    text = " ".join(["chair"] * 200)
    out = tok(text)
    assert out.shape == (1, 77)
    full = [49406] + tok.encode(text) + [49407]
    np.testing.assert_array_equal(out[0], np.asarray(full[:77], np.int32))
    assert out[0, -1] != 49407                            # EOT fell off


def test_tokenize_module_fn():
    a = tokenize(["a chair", "a lamp"])
    assert a.shape == (2, 77) and a.dtype == np.int32


# ---------------- anchors ----------------

def test_precomputed_banks_load():
    for key, want_k in [("large", 40), ("giant", 40)]:
        w = anchors.load_precomputed(key, "modelnet")
        assert w.shape == (want_k, 1024)
    assert anchors.load_precomputed("large", "scanobjectnn").shape == (15, 1024)
    assert anchors.load_precomputed("large", "shapenetcore").shape == (55, 1024)


def test_clip_classifier_pipeline():
    """Anchor construction with a deterministic fake text encoder."""
    D = 8

    def fake_encode(tokens):
        # deterministic function of the token ids
        t = np.asarray(tokens, np.float32)
        out = np.stack([t.sum(1), t.max(1), t.min(1), (t > 0).sum(1),
                        t[:, 1], t[:, 2], t[:, 3], t.mean(1)], axis=1)
        return jnp.asarray(out)

    names = ["chair", "night_stand", "lamp"]
    templates = ["a photo of a {}.", "a 3d model of a {}."]
    w = anchors.clip_classifier(names, templates, fake_encode)
    assert w.shape == (3, D)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=1), 1.0,
                               atol=1e-5)
    # underscore replacement reaches the prompts: same as explicit space
    w2 = anchors.clip_classifier(["night stand"], templates, fake_encode)
    np.testing.assert_allclose(np.asarray(w[1]), np.asarray(w2[0]), atol=1e-6)


def test_get_text_anchors_precedence(tmp_path):
    path = os.path.join(tmp_path, "bank.npy")
    np.save(path, np.eye(4, 8, dtype=np.float32))
    cfg = Config(data=DataConfig(precomputed_text_features=path))
    w = anchors.get_text_anchors(cfg)
    assert w.shape == (4, 8)
    cfg2 = Config(data=DataConfig(precomputed_text_features=None))
    with pytest.raises(ValueError):
        anchors.get_text_anchors(cfg2)


def test_get_text_anchors_missing_bank_falls_back(tmp_path):
    """Configured-but-MISSING bank: fall back to the encoder when one is
    available (the documented configured-AND-present precedence), raise
    when none is."""
    missing = os.path.join(tmp_path, "nope.npy")
    cfg = Config(data=DataConfig(precomputed_text_features=missing))
    with pytest.raises(FileNotFoundError):
        anchors.get_text_anchors(cfg)

    def fake_encode(tokens):
        t = np.asarray(tokens, np.float32)
        return jnp.asarray(np.stack([t.sum(1), t.max(1)], axis=1))

    w = anchors.get_text_anchors(cfg, encode_text_fn=fake_encode)
    assert w.shape[1] == 2   # came from the encoder, not the missing file


def test_load_precomputed_npz(tmp_path):
    path = os.path.join(tmp_path, "bank.npz")
    arr = np.eye(5, 7, dtype=np.float32)
    np.savez(path, features=arr)
    w = anchors.load_precomputed(path)
    np.testing.assert_allclose(np.asarray(w), arr)


def test_load_precomputed_unknown_family_raises():
    with pytest.raises(KeyError):
        anchors.load_precomputed("large", "omniobject3d")
    # None still defaults to the modelnet family (bench/demo convention)
    assert anchors.load_precomputed("large").shape == (40, 1024)


def test_anchors_through_real_text_tower():
    """Full on-the-fly anchor path: BPE tokenizer → CLIP text tower →
    template ensemble (tiny tower dims)."""
    import jax
    import jax.numpy as jnp2

    from uni_adapter_tpu.models.clip_text import TextEncoder

    tower = TextEncoder(width=32, layers=1, heads=4, embed_dim=16,
                        dtype=jnp2.float32)
    params = tower.init(jax.random.PRNGKey(0),
                        jnp2.zeros((1, 77), jnp2.int32))
    encode = jax.jit(lambda t: tower.apply(params, t))
    w = anchors.clip_classifier(
        ["chair", "night_stand"], ["a photo of a {}.", "a sketch of a {}."],
        encode)
    assert w.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=1), 1.0,
                               atol=1e-5)
    # different classes → different anchors
    assert not np.allclose(np.asarray(w[0]), np.asarray(w[1]))
