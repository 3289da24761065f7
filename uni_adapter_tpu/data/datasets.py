"""Corrupted point-cloud test sets (ModelNet40-C, ScanObjectNN-C, ShapeNetCore-C).

Rebuild of the reference's data layer (data/tta_datasets.py:11-274 +
data/data_utils.py:5-26), numpy-native (no torch Dataset), preserving the
reference's quirks exactly:

  * file naming `data_{corruption}_{severity}.npy` + `label.npy`, with
    'clean' → data_original.npy and the mixed-corruptions special case
    (tta_datasets.py:11-36);
  * ScanObjectNN labels stored as [1, N] → `label[0][item]` fallback
    (tta_datasets.py:154-158);
  * `rgb = ones_like(pointcloud)` convention (every __getitem__);
  * `debug` slicing to 5 samples — the reference's de-facto smoke-test mode
    (tta_datasets.py:106-108).

Streaming interfaces:
  * iter_batches — host iterator of (pc, rgb, label) numpy batches, native
    (possibly ragged) point counts, for engine.run_stream;
  * as_arrays — fixed-shape (T, B, npoints, 3) stacks, resampled the way the
    reference's ShapeNetC loader resamples (np.random.choice with
    replacement, tta_datasets.py:228-230), for the on-device scan path.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

MODELNET40_CLASSES = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
    "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
    "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
    "mantel", "monitor", "night_stand", "person", "piano", "plant", "radio",
    "range_hood", "sink", "sofa", "stairs", "stool", "table", "tent",
    "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]

SCANOBJECTNN_CLASSES = [
    "bag", "bin", "box", "cabinet", "chair", "desk", "display", "door",
    "shelf", "table", "bed", "pillow", "sink", "sofa", "toilet",
]

SHAPENETCORE_CLASSES = [
    "airplane", "bag", "basket", "bathtub", "bed", "bench", "bottle", "bowl",
    "bus", "cabinet", "can", "camera", "cap", "car", "chair", "clock",
    "dishwasher", "monitor", "table", "telephone", "tin_can", "tower",
    "train", "keyboard", "earphone", "faucet", "file", "guitar", "helmet",
    "jar", "knife", "lamp", "laptop", "speaker", "mailbox", "microphone",
    "microwave", "motorcycle", "mug", "piano", "pillow", "pistol", "pot",
    "printer", "remote_control", "rifle", "rocket", "skateboard", "sofa",
    "stove", "vessel", "washer", "cellphone", "birdhouse", "bookshelf",
]


def _npy_pair_paths(data_path: str, corruption: str, severity: int):
    """Filename resolution shared by load_data and open_native
    (tta_datasets.py:11-36, incl. the mixed-corruptions special case)."""
    if corruption == "clean":
        data_file = os.path.join(data_path, "data_original.npy")
    else:
        data_file = os.path.join(data_path, f"data_{corruption}_{severity}.npy")
    label_file = os.path.join(data_path, "label.npy")
    if "mixed_corruptions" in corruption:
        data_file = os.path.join(data_path, f"{corruption}.npy")
        label_file = os.path.join(data_path, "mixed_corruptions_labels.npy")
    return data_file, label_file


def load_data(data_path: str, corruption: str, severity: int):
    """Load the npy pair for one corruption (tta_datasets.py:11-36)."""
    data_file, label_file = _npy_pair_paths(data_path, corruption, severity)
    if not os.path.exists(data_file):
        raise FileNotFoundError(f"Data file not found: {data_file}")
    if not os.path.exists(label_file):
        raise FileNotFoundError(f"Label file not found: {label_file}")
    return (np.load(data_file, allow_pickle=True),
            np.load(label_file, allow_pickle=True))


def open_native(data_path: str, corruption: str, severity: int,
                prefetch: int = 8):
    """Native-loader variant of load_data: mmap'd archives with a C++
    background prefetch ring (uni_adapter_tpu/native/) — the in-process
    equivalent of the reference's DataLoader worker processes
    (main_test-time.py:78-85).  Returns (NativeNpy data, NativeNpy labels);
    falls back to numpy memmap transparently inside NativeNpy."""
    from uni_adapter_tpu.native.loader import NativeNpy

    data_file, label_file = _npy_pair_paths(data_path, corruption, severity)
    return (NativeNpy(data_file, prefetch=prefetch), NativeNpy(label_file))


def load_h5(h5_name: str):
    """Clean ModelNet40 h5 (tta_datasets.py:38-44)."""
    import h5py
    with h5py.File(h5_name, "r") as f:
        return f["data"][:].astype("float32"), f["label"][:].astype("int64")


@dataclass
class TTADataset:
    """One corruption stream: (pc, label, class_name, rgb) per item."""
    data: np.ndarray           # (T, N, 3) or object array of ragged clouds
    labels: np.ndarray         # (T,) int
    class_names: list[str]

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, i: int):
        pc = np.asarray(self.data[i], dtype=np.float32)
        label = int(self.labels[i])
        rgb = np.ones_like(pc, dtype=np.float32)
        return pc, label, self.class_names[label], rgb

    def iter_batches(self, batch_size: int = 1,
                     npoints: Optional[int] = None,
                     seed: int = 42) -> Iterator[tuple]:
        """Yield (pc (B,N,3), rgb (B,N,3), label (B,)) numpy batches in
        dataset order (shuffle=False — online TTA is order-dependent,
        main_test-time.py:81).

        With `npoints` set, clouds whose point count differs are resampled
        with replacement (same convention as as_arrays / the reference,
        tta_datasets.py:228-230).  Pass it for ragged object-array data:
        without it, batch_size>1 cannot stack ragged clouds, and even at
        batch_size=1 every distinct point count costs a jit recompile."""
        rng = np.random.default_rng(seed)
        for s in range(0, len(self), batch_size):
            items = [self[i] for i in range(s, min(s + batch_size, len(self)))]
            pcs = [it[0] for it in items]
            if npoints is not None:
                pcs = [pc if pc.shape[0] == npoints else
                       pc[rng.choice(pc.shape[0], npoints, replace=True)]
                       for pc in pcs]
            yield (np.stack(pcs),
                   np.stack([np.ones_like(pc) for pc in pcs]),
                   np.array([it[1] for it in items], np.int32))

    def as_arrays(self, batch_size: int = 1,
                  npoints: Optional[int] = None, seed: int = 42):
        """Fixed-shape stacks for the scan path: (T', B, N, 3) pc and rgb
        plus (T', B) labels.  Clouds whose point count differs from
        `npoints` are resampled with replacement (the reference's own
        resampling convention, tta_datasets.py:228-230).  Trailing samples
        that do not fill a batch are dropped (the scan needs rectangular
        input; batch_size 1 — the reference protocol — never drops)."""
        rng = np.random.default_rng(seed)
        n = npoints or max(np.asarray(self.data[i]).shape[0]
                           for i in range(len(self)))
        pcs, labels = [], []
        for i in range(len(self)):
            pc, label, _, _ = self[i]
            if pc.shape[0] != n:
                choice = rng.choice(pc.shape[0], n, replace=True)
                pc = pc[choice]
            pcs.append(pc)
            labels.append(label)
        T = (len(pcs) // batch_size) * batch_size
        pc_arr = np.stack(pcs[:T]).reshape(T // batch_size, batch_size, n, 3)
        lab = np.array(labels[:T], np.int32).reshape(T // batch_size,
                                                     batch_size)
        return pc_arr, np.ones_like(pc_arr), lab


def _normalize_labels(labels: np.ndarray) -> np.ndarray:
    """ScanObjectNN [1, T] / [T, 1] label-shape workaround
    (tta_datasets.py:154-158)."""
    labels = np.asarray(labels)
    if labels.ndim > 1:
        labels = labels[0] if labels.shape[0] == 1 else labels.reshape(-1)
    return labels.astype(np.int64)


def modelnet40_c(root: str, corruption: str, severity: int = 5,
                 debug: bool = False) -> TTADataset:
    data, labels = load_data(root, corruption, severity)
    if debug:
        data, labels = data[:5], labels[:5]
    return TTADataset(data, _normalize_labels(labels), MODELNET40_CLASSES)


def scanobjectnn_c(root: str, corruption: str, severity: int = 5,
                   debug: bool = False) -> TTADataset:
    data, labels = load_data(root, corruption, severity)
    labels = _normalize_labels(labels)
    if debug:
        data, labels = data[:5], labels[:5]
    return TTADataset(data, labels, SCANOBJECTNN_CLASSES)


def shapenetcore_c(root: str, corruption: str, severity: int = 5,
                   debug: bool = False) -> TTADataset:
    data, labels = load_data(root, corruption, severity)
    if debug:
        data, labels = data[:5], labels[:5]
    return TTADataset(data, _normalize_labels(labels), SHAPENETCORE_CLASSES)


def modelnet_h5(root: str, corruption: str = "clean") -> TTADataset:
    """Clean ModelNet40 from h5 (tta_datasets.py:49-98)."""
    for name in ["modelnet40_test.h5", "clean.h5", f"{corruption}.h5"]:
        path = os.path.join(root, name)
        if os.path.exists(path):
            data, labels = load_h5(path)
            labels = _normalize_labels(labels)
            if labels.min() == 1:
                labels = labels - 1
            return TTADataset(data, labels, MODELNET40_CLASSES)
    raise FileNotFoundError(f"No ModelNet40 h5 found under {root}")


SHAPENET_PART_CAT2ID = {
    "airplane": 0, "bag": 1, "cap": 2, "car": 3, "chair": 4, "earphone": 5,
    "guitar": 6, "knife": 7, "lamp": 8, "laptop": 9, "motor": 10, "mug": 11,
    "pistol": 12, "rocket": 13, "skateboard": 14, "table": 15,
}
SHAPENET_PART_SEG_NUM = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
SHAPENET_PART_INDEX_START = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38,
                             41, 44, 47]


def load_data_partseg(root: str, corruption: str):
    """Part-segmentation h5 archives `{corruption}_4.h5` with data/label/pid
    (reference tta_datasets.py:169-194)."""
    import glob

    import h5py

    data, label, seg = [], [], []
    for h5_name in glob.glob(os.path.join(root, corruption + "_4.h5")):
        with h5py.File(h5_name, "r") as f:
            data.append(f["data"][:].astype("float32"))
            label.append(f["label"][:].astype("int64"))
            seg.append(f["pid"][:].astype("int64"))
    if not data:
        raise FileNotFoundError(
            f"No part-seg h5 matching {corruption}_4.h5 under {root}")
    return (np.concatenate(data), np.concatenate(label), np.concatenate(seg))


class ShapeNetPartSeg:
    """ShapeNet-C part-segmentation set (reference ShapeNetC,
    tta_datasets.py:196-238): per-item random resample to npoints with the
    part labels resampled identically."""

    def __init__(self, root: str, corruption: str, npoints: int = 2048,
                 class_choice: Optional[str] = None, seed: int = 0):
        self.data, self.label, self.seg = load_data_partseg(root, corruption)
        self.npoints = npoints
        self.rng = np.random.default_rng(seed)
        if class_choice is not None:
            cid = SHAPENET_PART_CAT2ID[class_choice]
            idx = (self.label == cid).squeeze()
            self.data, self.label, self.seg = (self.data[idx],
                                               self.label[idx], self.seg[idx])
            self.seg_num_all = SHAPENET_PART_SEG_NUM[cid]
            self.seg_start_index = SHAPENET_PART_INDEX_START[cid]
        else:
            self.seg_num_all = 50
            self.seg_start_index = 0

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item):
        pc = self.data[item]
        seg = self.seg[item]
        choice = self.rng.choice(len(seg), self.npoints, replace=True)
        return pc[choice], int(np.asarray(self.label[item]).item()), seg[choice]


def generic_c(root: str, corruption: str, class_names: list[str],
              severity: int = 5, debug: bool = False) -> TTADataset:
    """Generic corrupted-set loader for datasets that follow the
    data_{corruption}_{severity}.npy + label.npy convention but have no
    dedicated class in the reference (Objaverse-LVIS and OmniObject3D are
    named in the paper's benchmark table yet have no wired loader —
    SURVEY.md §2.3 notes labels.json carries objaverse_lvis with no loader).
    """
    data, labels = load_data(root, corruption, severity)
    if debug:
        data, labels = data[:5], labels[:5]
    return TTADataset(data, _normalize_labels(labels), class_names)


def load_tta_dataset(cfg) -> TTADataset:
    """Name-substring dispatch (reference data/data_utils.py:5-26), extended
    with the LVIS/OmniObject families the reference names but never wires."""
    d = cfg.data
    name = d.dataset_name.lower()
    if "modelnet" in name:
        return modelnet40_c(d.root, d.corruption, d.severity, d.debug)
    if "scanobject" in name:
        return scanobjectnn_c(d.root, d.corruption, d.severity, d.debug)
    if "shapenet" in name:
        return shapenetcore_c(d.root, d.corruption, d.severity, d.debug)
    if "lvis" in name or "objaverse" in name or "omniobject" in name:
        from uni_adapter_tpu.config import load_labels

        return generic_c(d.root, d.corruption, load_labels(cfg), d.severity,
                         d.debug)
    raise NotImplementedError(f"Dataset {d.dataset_name} is not implemented")


def make_synthetic(dataset_name: str, n_samples: int = 16,
                   npoints: int = 1024, seed: int = 0) -> TTADataset:
    """Synthetic stand-in stream (unit-sphere clusters per class) for tests
    and benchmarks when the corrupted npy assets are absent — the analogue
    of the reference's synthetic-sphere fallback
    (example_attention_extraction.py:425-449)."""
    classes = {"modelnet": MODELNET40_CLASSES,
               "scanobject": SCANOBJECTNN_CLASSES,
               "shapenet": SHAPENETCORE_CLASSES}
    names = next(v for k, v in classes.items() if k in dataset_name.lower())
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, len(names), n_samples)
    data = np.empty((n_samples, npoints, 3), np.float32)
    for i, lab in enumerate(labels):
        center = rng.standard_normal(3) * 0.1
        pts = rng.standard_normal((npoints, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        data[i] = pts * (0.5 + 0.5 * (lab % 5) / 5.0) + center
    return TTADataset(data, labels.astype(np.int64), list(names))
