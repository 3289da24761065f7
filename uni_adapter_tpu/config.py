"""Configuration system for the Uni-Adapter TPU framework.

Dataclass-based rebuild of the reference's three-tier config:
  * CLI/experiment flags   (reference: utils/params.py:4-118)
  * per-dataset TTA hyperparameters (reference: utils/hyperparams.py:1-33)
  * JSON assets for class labels / prompt templates (reference: data/labels.json,
    data/templates.json, selected by --validate_dataset_name / --template_key)

Design deviations from the reference, each deliberate and documented:
  * `use_new_approximation` is a real bool here.  The reference declares it with
    `type=bool`, so any CLI string parses truthy (utils/params.py:26), and then
    reads `args.use_new_approximation` instead of the per-dataset
    `hp['use_new_approximation']` (Uni_Adapter.py:559).  We honour the
    per-dataset table by default and let the CLI override explicitly.
  * `use_gmm_dota` exists (default False).  The reference's cache-path guard
    reads an undefined `args.use_gmm_dota` (Uni_Adapter.py:541) and raises
    AttributeError when both dota flags are off.
  * Personal hard-coded default paths are replaced by required/None fields.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "assets")

#: The 15 corruption types of the -C benchmarks (reference: main_test-time.py:55-59).
CORRUPTIONS = (
    "uniform", "gaussian", "background", "impulse", "upsampling",
    "distortion_rbf", "distortion_rbf_inv", "density", "density_inc",
    "shear", "rotation", "cutout", "distortion", "occlusion", "lidar",
)


@dataclass
class ModelConfig:
    """Backbone selection and dimensions.

    Defaults mirror the reference's per-model argparse blocks
    (utils/params.py:30-69) and the canonical Point-BERT yaml
    (models/ulip/pointbert/PointTransformer_8192point.yaml).
    """
    vlm3d: str = "uni3d"                 # uni3d | ulip | openshape
    # Uni3D (reference: utils/params.py:36-44; models/point_encoder.py:161-189)
    pc_feat_dim: int = 1024              # transformer width (EVA02-L)
    embed_dim: int = 1024                # CLIP embedding dim
    num_group: int = 512
    group_size: int = 64
    pc_encoder_dim: int = 512            # mini-PointNet output channels
    eva_depth: int = 24                  # EVA02-Large depth
    eva_heads: int = 16
    # patch_dropout / drop_path_rate are deliberately NOT fields: both are
    # training-time regularisers that are inactive in the reference's eval
    # loop (PatchDropout returns identity under model.eval()), so carrying
    # them would advertise a capability the eval framework doesn't use.
    # ULIP / Point-BERT (reference: models/ulip/pointbert/point_encoder.py:120-141)
    ulip_trans_dim: int = 384
    ulip_depth: int = 12
    ulip_heads: int = 6
    ulip_group_size: int = 32
    ulip_encoder_dim: int = 256
    ulip_embed_dim: int = 512
    # OpenShape PPTA (reference: models/openshape/ppta.py:159-199, config.yaml:11)
    oshape_version: str = "vitg14"       # vitg14 (scaling 4) | vitl14 (scaling 3)
    oshape_clip_dim: int = 1280          # bigG text dim (config.yaml:3)
    # Use the Pallas FPS kernel instead of the XLA fori_loop twin
    # (ops/fps_pallas.py; identical indices, tested against the oracle)
    use_pallas_fps: bool = False
    # Fused Pallas attention (ops/attention_pallas.attention_pallas_heads):
    # QK^T → fp32 softmax → PV in one VMEM-resident kernel per batch
    # element (strictly MORE precise than the XLA bf16-storage path —
    # scores never round to bf16).  Measured v5e sweeps: ULIP 372.8→466.9,
    # OpenShape 513→615.7 pc/s; Uni3D's matmul-bound EVA trunk is ~6%
    # FASTER with plain XLA attention — enable for the small trunks only.
    # Off by default: TPU-only (no CPU lowering).
    use_pallas_attention: bool = False
    # Whole-span EVA attention kernel (ops/attention_pallas.
    # eva_attn_block_fused): q/k/v/out projections + per-head LN +
    # attention in ONE pallas call, projection weights VMEM-resident —
    # collapses the kernel boundary that made the span-only kernel lose
    # end-to-end on Uni3D (BASELINE.md round 5).  Uni3D trunk only;
    # TPU-only (no CPU lowering).  Off by default until the on-device A/B
    # decides.
    use_pallas_attn_block: bool = False
    # approx_max_k kNN (TPU partial reduce, recall_target 0.99 — measured
    # recall 1.0 on benchmark point distributions); default exact top_k
    approx_knn: bool = False
    # Fused Pallas kNN (ops/knn_pallas.knn_pallas): distance matrix computed
    # on the MXU inside the kernel (never hits HBM) + iterative min
    # extraction.  Same neighbour sets as the XLA twin (sub-ulp tie order
    # may differ; downstream max-pools are order-invariant).  Measured v5e:
    # 3.6× XLA sqdist+top_k at the encoder's (60,512,1024) k=32, 9.3× at
    # N=8192.  Off by default: TPU-only (no CPU lowering).
    use_pallas_knn: bool = False
    # selection + exact neighbour-feature gather fused in one kernel
    # (ops/knn_pallas.knn_gather_pallas); opt-in pending the on-device
    # benchmark decision
    use_pallas_knn_gather: bool = False
    # Fused Pallas ball query (ops/ballquery_pallas.query_ball_pallas) for
    # the PointNet++/OpenShape set-abstraction path: bitwise-exact vs the
    # sqdist+sort twin, 2.2× at PPTA shapes on v5e.  Off by default:
    # TPU-only (no CPU lowering).
    use_pallas_ballq: bool = False
    # int8 dynamic quantisation of the transformer trunk's dense layers
    # (QuantDense): int8 MXU ≈ 2× bf16 throughput; opt-in — introduces
    # quantisation noise (see tests/test_quant.py for the numerics bound)
    quantize_int8: bool = False
    # CLIP logit scale: 100·f@W in the current reference
    # (Uni_Adapter.py:57); the older loop used 40 (Uni_Adapter copy.py:57).
    logit_scale: float = 100.0
    # Numerics: encoder compute dtype.  Reference mixes fp16/fp32
    # (dota.py:31,69,76; load_models.py:85,101); on TPU we standardise on
    # bf16 compute with fp32 adaptation state (SURVEY.md §7 hard part 5).
    compute_dtype: str = "bfloat16"
    # Checkpoints (converted from torch; optional — random init otherwise)
    checkpoint_path: Optional[str] = None
    clip_checkpoint_path: Optional[str] = None


@dataclass
class DotaConfig:
    """DOTA / MODE-DOTA hyperparameters (reference: utils/params.py:100-114)."""
    use_dota: bool = False
    use_mode_dota: bool = True
    use_gmm_dota: bool = False
    use_adaptive_dota: bool = False
    epsilon: float = 1e-4
    sigma: float = 1e-4
    eta: float = 0.1
    rho: float = 0.02
    mode_M: int = 4
    res_learning: bool = True
    prior_pre_steps: Optional[int] = None
    alpha_max: float = 0.5               # DOTA_mix prior blend (dota_mixture.py:57)
    # MODE-DOTA noise-augmented double fit (Uni_Adapter.py:419-430)
    noise_std: float = 0.05
    # Residual learning (Uni_Adapter.py:341-354,444-448)
    residual_lr: float = 1e-3
    residual_steps: int = 10
    # The reference rounds the predict input through fp16 —
    # `predict(pc_features.mean(0).unsqueeze(0).half())` at
    # Uni_Adapter.py:410,416; DOTA_mix.predict immediately `.float()`s it
    # back (dota_mixture.py:250), so for MODE-DOTA this flag reproduces the
    # reference numerics EXACTLY.  Off by default: the round-trip is a
    # GPU-era artifact and fp32 is strictly more precise on TPU.
    fp16_predict_input: bool = False
    # The reference's inverse-entropy fusion weights do not sum to 1:
    # w_dota divides by the already-normalised w_clip (Uni_Adapter.py:512-513).
    # Off (reference parity) by default; True uses the corrected convex
    # combination (adapt/fusion.py).
    fix_fusion_normalization: bool = False
    # Matmul precision of the alignment-loss (K,KM) log-likelihoods:
    # "highest" = fp32-exact 6-pass (reference numerics, the default);
    # "high" = 3-pass bf16 splits, ~2x faster — worthwhile at large label
    # spaces (K=1156: the 10-step loop's matmuls dominate the step) where
    # the ~1e-6-relative likelihood error is far below the EM noise floor
    residual_precision: str = "highest"
    # Unroll the 10-step Adam loop into a flat program — same math
    # (ulp-level fusion-order differences only); lets XLA overlap one step's elementwise tail with the next
    # step's likelihood matmul at the cost of ~10x the loop-body compile
    # time.  Opt-in pending the on-device measurement.
    residual_unroll: bool = False


@dataclass
class CacheConfig:
    """Uni-Adapter cache hyperparameters.

    Per-dataset table mirrors the reference exactly
    (utils/hyperparams.py:1-33).
    """
    shot_capacity: int = 30
    beta: float = 150.0
    threshold: float = 0.5
    lambda_reg: float = 0.11
    use_new_approximation: bool = True
    cg_max_iter: int = 100               # utils/math_utils.py:21 max_iter
    cg_tol: float = 1e-5
    # "dense" = exact reference node graph over K·shot_capacity entries;
    # "prototype" = scalable class-prototype graph (K nodes) for large label
    # spaces (Objaverse-LVIS K=1156) where the dense graph's per-step N²·D
    # adjacency build is physically impossible (adapt/cache.py docstring);
    # "auto" = dense while K·shot_capacity ≤ 4096 (bitwise reference
    # semantics at every benchmark label space), prototype above — without
    # this the default OOMs at LVIS scale (a 34680² fp32 adjacency per
    # stream)
    graph_mode: str = "auto"


@dataclass
class DataConfig:
    root: str = ""
    dataset_name: str = "modelnet"       # modelnet | scanobject | shapenetcore
    # labels.json key; None = inferred from dataset_name (resolve()) — the
    # reference makes the user keep the two flags in sync by hand
    # (utils/params.py:80-83); a mismatch scores against the wrong label set
    validate_dataset_name: Optional[str] = None
    template_key: str = "modelnet40_64"
    corruption: str = "all"
    severity: int = 5
    batch_size: int = 1
    npoints: int = 1024
    debug: bool = False                  # 5-sample slice (tta_datasets.py:106-108)
    precomputed_text_features: Optional[str] = None
    labels_path: str = os.path.join(ASSETS_DIR, "labels.json")
    templates_path: str = os.path.join(ASSETS_DIR, "templates.json")


@dataclass
class RunConfig:
    name: Optional[str] = None
    output_dir: str = "./outputs"
    seed: int = 42
    print_freq: int = 100
    # True: whole stream as one on-device lax.scan (fixed shapes);
    # False: host iterator with one jitted step per batch (native point
    # counts preserved, reference DataLoader-style).
    use_scan: bool = True
    # jax platform override (reference --device flag, utils/params.py:98).
    # 'default' keeps whatever backend the runtime registered; 'cpu'/'tpu'
    # force one (set BEFORE first backend use).
    device: str = "default"
    # Evaluate all corruption streams simultaneously as one vmapped scan
    # (engine.run_streams_vmapped): per-stream numerics identical to the
    # sequential loop, encoder batched C-wide.  Requires equal stream
    # lengths (true for the -C benchmarks).
    vmap_corruptions: bool = False
    # Continual TTA: carry the adaptation state across the corruption
    # sequence instead of re-initialising per corruption (the standard
    # continual test-time-adaptation protocol, e.g. CoTTA).  The reference
    # always resets per corruption (state init inside test_zeroshot_3d_core,
    # Uni_Adapter.py:323-361) — off by default for parity.  Per-corruption
    # accuracies are still reported individually.
    continual: bool = False
    # Distributed-eval mode over a jax Mesh (SURVEY.md §5.8):
    #   'replicated' — single stream, exact reference trajectory
    #   'sharded'    — shard the stream; per-shard independent adaptation state
    #   'psum'       — shard the stream; psum-merged sufficient statistics
    #   'ep'         — shard the MODE-DOTA CLASS state (expert parallelism,
    #                  parallel/ep.py): replicated batch, same adaptation
    #                  order as the single-device run, K-proportional work
    #                  divided over devices — the Objaverse-LVIS (K=1156)
    #                  scaling lever
    dist_mode: str = "replicated"
    # EP only: also split the fused 2B encoder batch over the class axis
    # (features all_gather back) so the trunk forward scales with the mesh
    # too; requires 2·batch_size to divide the device count
    ep_shard_encoder: bool = False
    data_axis: str = "data"
    # Trunk (model) parallelism for the encoder forward, independent of
    # dist_mode's stream sharding (requires dist_mode='replicated' and
    # no --vmap-corruptions):
    #   'none' — plain replicated forward
    #   'tp'   — Megatron tensor parallelism over all devices
    #            (parallel/tp.py; any backbone)
    #   'pp'   — GPipe pipeline stages over `trunk_stages` devices
    #            (parallel/pp.py; any backbone; a capacity feature for
    #            trunks larger than one chip's HBM — TTA steps are batch-1,
    #            so there is no microbatching to overlap)
    #   'sp'   — sequence parallelism with exact ring attention
    #            (parallel/sp.py; uni3d|ulip — the large-N lever)
    trunk_parallel: str = "none"
    # PP: number of pipeline stages (default: all visible devices); the
    # trunk depth must divide by trunk_stages × pp_interleave.
    trunk_stages: Optional[int] = None
    # PP: virtual chunks per stage (interleaved 1F1B-style schedule,
    # parallel/pp_interleave.py).
    pp_interleave: int = 1
    # XLA profiler capture around the evaluation loop (utils/profiling.trace;
    # view with tensorboard/xprof).  The reference's only tracing is paired
    # CUDA events (Uni_Adapter.py:365-366,577-579); this is the real-trace
    # upgrade.  None disables.
    profile_dir: Optional[str] = None


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    dota: DotaConfig = field(default_factory=DotaConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    data: DataConfig = field(default_factory=DataConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def resolve(self) -> "Config":
        """Apply the per-dataset hyperparameter table (hyperparams.py:9-33)
        and infer the labels.json key when not explicitly set."""
        name = self.data.dataset_name.lower()
        c = dataclasses.replace(self.cache)
        if "modelnet" in name:
            c.lambda_reg, c.threshold = 0.11, 0.5
        elif "scanobject" in name:
            c.lambda_reg, c.threshold = 0.20, 0.5
        elif "shapenet" in name:
            c.lambda_reg, c.threshold = 0.07, 0.45
            c.use_new_approximation = False
        d = self.data
        if d.validate_dataset_name is None:
            try:
                d = dataclasses.replace(
                    d, validate_dataset_name=labels_key_for(d.dataset_name))
            except ValueError:
                # un-inferable family (e.g. omniobject): leave None —
                # load_labels raises a targeted error only if labels are
                # actually needed (hyperparam resolution must not die here)
                pass
        return dataclasses.replace(self, cache=c, data=d)


def get_hyperparams(dataset_name: str) -> dict:
    """Dict-style accessor matching the reference API (hyperparams.py:1-33)."""
    cfg = Config(data=DataConfig(dataset_name=dataset_name)).resolve()
    return {
        "shot_capacity": cfg.cache.shot_capacity,
        "beta": cfg.cache.beta,
        "threshold": cfg.cache.threshold,
        "lambda_reg": cfg.cache.lambda_reg,
        "use_new_approximation": cfg.cache.use_new_approximation,
    }


def labels_key_for(dataset_name: str) -> str:
    """labels.json key for a dataset family (the reference's per-dataset
    defaults, utils/params.py:81-83)."""
    name = dataset_name.lower()
    if "modelnet" in name:
        return "modelnet40_openshape"
    if "scanobject" in name:
        return "scanobjnn_openshape"
    if "shapenet" in name:
        return "shapenet_openshape"
    if "lvis" in name or "objaverse" in name:
        return "objaverse_lvis_openshape"
    raise ValueError(f"cannot infer a labels.json key for dataset "
                     f"{dataset_name!r}; set the key explicitly "
                     f"(--validate-dataset-name on the evaluation CLI, "
                     f"--labels-key on uni-adapter-build-anchors)")


def load_labels(cfg: Config) -> list[str]:
    key = cfg.data.validate_dataset_name
    if key is None:   # hand-built / unresolved Config, or un-inferable family
        key = labels_key_for(cfg.data.dataset_name)
    with open(cfg.data.labels_path) as f:
        return json.load(f)[key]


def load_templates(cfg: Config) -> list[str]:
    with open(cfg.data.templates_path) as f:
        return json.load(f)[cfg.data.template_key]


def _field_arg_type(f, default):
    """CLI parser for a dataclass field; None-default fields parse by their
    ANNOTATION (Optional[int] must yield an int — a str would crash the
    first arithmetic use, e.g. prior_pre_steps / k in adapt/dota.py)."""
    if f.type in ("bool", bool) or isinstance(default, bool):
        return lambda s: s.lower() in ("1", "true", "yes")
    if default is not None:
        return type(default)
    ann = str(f.type)
    if "int" in ann:
        return int
    if "float" in ann:
        return float
    return str


def _add_fields(parser: argparse.ArgumentParser, prefix: str, dc) -> None:
    # default=SUPPRESS: only flags the user actually typed appear in the
    # namespace, so explicit CLI values can be told apart from defaults —
    # resolve()'s per-dataset table must never clobber an explicit flag
    for f in dataclasses.fields(dc):
        arg = f"--{prefix}{f.name.replace('_', '-')}"
        default = getattr(dc, f.name)
        if isinstance(default, (bool, int, float, str)) or default is None:
            parser.add_argument(arg, type=_field_arg_type(f, default),
                                default=argparse.SUPPRESS)


def parse_args(argv=None) -> Config:
    """CLI covering the reference's ~60 flags (utils/params.py:4-118).

    Precedence (lowest → highest): dataclass defaults → the per-dataset
    hyperparameter table (resolve()) → explicitly passed CLI flags.  The
    reference reads args.* over hp[...] inconsistently (SURVEY.md §5.6);
    here an explicit flag always wins, including over the table."""
    cfg = Config()
    parser = argparse.ArgumentParser(
        description="Uni-Adapter TPU: training-free online TTA for 3D VLMs")
    _add_fields(parser, "", cfg.run)
    _add_fields(parser, "", cfg.data)
    _add_fields(parser, "", cfg.model)
    _add_fields(parser, "dota-", cfg.dota)
    _add_fields(parser, "cache-", cfg.cache)
    ns = parser.parse_args(argv)

    def explicit(dc, prefix=""):
        kw = {}
        for f in dataclasses.fields(dc):
            key = (prefix + f.name) if prefix else f.name
            if hasattr(ns, key):
                kw[f.name] = getattr(ns, key)
        return kw

    cache_explicit = explicit(cfg.cache, "cache_")
    cfg = Config(
        model=dataclasses.replace(cfg.model, **explicit(cfg.model)),
        data=dataclasses.replace(cfg.data, **explicit(cfg.data)),
        run=dataclasses.replace(cfg.run, **explicit(cfg.run)),
        dota=dataclasses.replace(cfg.dota, **explicit(cfg.dota, "dota_")),
        cache=dataclasses.replace(cfg.cache, **cache_explicit),
    )
    if cfg.run.dist_mode not in ("replicated", "sharded", "psum", "ep"):
        # main.py string-compares the mode; without this check a typo would
        # silently fall through to the replicated path
        raise ValueError(f"--dist-mode {cfg.run.dist_mode!r}: expected "
                         "replicated, sharded, psum, or ep")
    if cfg.run.dist_mode == "ep":
        # every adaptation method class-shards (parallel/ep.py: MODE-DOTA,
        # plain DOTA, GMM-DOTA, adaptive-modes, and the prototype cache) —
        # only the encoder-sharding lever is MODE-DOTA-specific
        if cfg.run.ep_shard_encoder and not cfg.dota.use_mode_dota:
            raise ValueError(
                "--ep-shard-encoder splits MODE-DOTA's fused 2-forward "
                "batch; the cache, plain-DOTA, GMM-DOTA, and adaptive "
                "paths run one forward per step — nothing to split")
        # --vmap-corruptions composes since round 4: the CLI routes it to
        # run_streams_ep's shard_map(vmap(scan)) on a (1, n_devices)
        # (data, classes) mesh — vmap INSIDE the shard_map, never over it
    elif cfg.run.ep_shard_encoder:
        # inert-flag-combination pattern: reject rather than silently ignore
        # (matches trunk_parallel / vmap_corruptions / continual handling)
        raise ValueError(
            "--ep-shard-encoder splits the fused encoder batch over the EP "
            "class axis; it has no effect unless --dist-mode ep")
    if cfg.run.trunk_parallel not in ("none", "tp", "pp", "sp"):
        raise ValueError(f"--trunk-parallel {cfg.run.trunk_parallel!r}: "
                         "expected none, tp, pp, or sp")
    if cfg.run.trunk_parallel != "none":
        if cfg.run.dist_mode != "replicated":
            raise ValueError(
                "--trunk-parallel shards the trunk over ALL devices; it "
                "cannot compose with --dist-mode stream sharding from the "
                "CLI (use the library API for 2-D meshes)")
        if cfg.run.vmap_corruptions:
            raise ValueError("--trunk-parallel does not compose with "
                             "--vmap-corruptions (vmap over the trunk's "
                             "shard_map); run corruptions sequentially")
    if cfg.run.continual:
        if cfg.run.vmap_corruptions:
            raise ValueError(
                "--continual carries one adaptation trajectory through the "
                "corruption SEQUENCE; --vmap-corruptions runs the streams "
                "in parallel — the two are mutually exclusive")
        if cfg.run.dist_mode not in ("replicated", "ep"):
            raise ValueError(
                "--continual requires --dist-mode replicated or ep from "
                "the CLI (sharded/psum modes change the adaptation order "
                "and re-build their mesh state per stream; chain them via "
                "the library API if needed)")
    cfg = cfg.resolve()
    # explicit cache flags beat the table
    return dataclasses.replace(
        cfg, cache=dataclasses.replace(cfg.cache, **cache_explicit))
