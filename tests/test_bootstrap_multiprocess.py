"""Two-process jax.distributed smoke test (VERDICT r1 weak #7).

Spawns two REAL Python processes on CPU, each calling
`parallel.bootstrap.init_distributed_device` with the reference's
RANK/WORLD_SIZE/MASTER_ADDR env convention (utils/distributed.py:65-107),
then psums a per-process counter across the 2-process global mesh — the
minimal proof that the bootstrap wiring produces a working collective.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
# CPU platform must be forced in-process (axon sitecustomize overrides env)
import jax
jax.config.update("jax_platforms", "cpu")

from uni_adapter_tpu.parallel.bootstrap import init_distributed_device

info = init_distributed_device()
assert info["world_size"] == 2, info
assert info["distributed"], info

import jax.numpy as jnp
from jax.experimental import multihost_utils

# each process contributes rank+1; global psum must see 1+2=3 on both
total = multihost_utils.process_allgather(
    jnp.asarray([info["rank"] + 1], jnp.int32)).sum()
assert int(total) == 3, total
print(f"OK rank={info['rank']} total={int(total)}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_pair(worker: str, xla_flags: str = "", timeout=150,
                extra_env=None):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   RANK=str(rank), LOCAL_RANK=str(rank), WORLD_SIZE="2",
                   MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
                   JAX_PLATFORMS="cpu", **(extra_env or {}))
        if xla_flags:
            # append: clobbering would drop site-level flags the rest of
            # the suite runs with
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + " " + xla_flags).strip()
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + env.get("PYTHONPATH", "").split(os.pathsep))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    try:
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
    finally:
        # a deadlocked pair (the failure mode these smokes exist to catch)
        # must not orphan CPU-spinning workers holding the coordinator port
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return procs, outs


@pytest.mark.timeout(180)
def test_two_process_bootstrap_psum(tmp_path):
    procs, outs = _spawn_pair(_WORKER)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank} total=3" in out, out


_PP_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from uni_adapter_tpu.parallel.bootstrap import init_distributed_device

info = init_distributed_device()
assert info["world_size"] == 2, info

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import pp

assert jax.device_count() == 4, jax.devices()   # 2 local x 2 processes
mesh = Mesh(np.asarray(jax.devices()), ("stage",))

model = Uni3D(trans_dim=48, embed_dim=32, num_group=8, group_size=8,
              encoder_dim=16, depth=4, num_heads=4, dtype=jnp.float32)
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
# deterministic init => identical params on both processes; the plain
# forward computed locally is the oracle
params = model.init(jax.random.PRNGKey(0), pc)
want = np.asarray(jax.jit(model.apply)(params, pc))

prepare, fwd = pp.make_pp_forward_uni3d(model, mesh, n_micro=2)
got = np.asarray(fwd(prepare(params), pc))
np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
print(f"OK rank={info['rank']} pp-multiprocess", flush=True)
"""


_TP_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from uni_adapter_tpu.parallel.bootstrap import init_distributed_device

info = init_distributed_device()

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import tp

assert jax.device_count() == 4, jax.devices()
mesh = Mesh(np.asarray(jax.devices()), ("model",))

model = Uni3D(trans_dim=48, embed_dim=32, num_group=8, group_size=8,
              encoder_dim=16, depth=2, num_heads=4, dtype=jnp.float32)
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((2, 64, 6)), jnp.float32)
params = model.init(jax.random.PRNGKey(0), pc)
want = np.asarray(jax.jit(model.apply)(params, pc))

sharded = tp.shard_params_tp(params, mesh)
got = np.asarray(tp.make_tp_forward(model, mesh)(sharded, pc))
np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
print(f"OK rank={info['rank']} tp-multiprocess", flush=True)
"""


_SP_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from uni_adapter_tpu.parallel.bootstrap import init_distributed_device

info = init_distributed_device()

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import sp

assert jax.device_count() == 4, jax.devices()   # 2 local x 2 processes
mesh = Mesh(np.asarray(jax.devices()), ("seq",))

# 8 groups + CLS = 9 tokens over 4 devices: the padded/masked ring path
model = Uni3D(trans_dim=48, embed_dim=32, num_group=8, group_size=8,
              encoder_dim=16, depth=4, num_heads=4, dtype=jnp.float32)
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
params = model.init(jax.random.PRNGKey(0), pc)
want = np.asarray(jax.jit(model.apply)(params, pc))

prepare, fwd = sp.make_sp_forward_uni3d(model, mesh)
got = np.asarray(fwd(prepare(params), pc))
np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
print(f"OK rank={info['rank']} sp-multiprocess", flush=True)
"""


_PSUM_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from uni_adapter_tpu.parallel.bootstrap import init_distributed_device

info = init_distributed_device()

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import mesh as pmesh

assert jax.device_count() == 4, jax.devices()
mesh = Mesh(np.asarray(jax.devices()), ("data",))

K, N, T = 5, 64, 8
model = Uni3D(trans_dim=48, embed_dim=32, num_group=8, group_size=8,
              encoder_dim=16, depth=2, num_heads=4, dtype=jnp.float32)
rng = np.random.default_rng(0)
pc0 = jnp.zeros((1, N, 6), jnp.float32)
params = model.init(jax.random.PRNGKey(0), pc0)
text = rng.standard_normal((K, 32)).astype(np.float32)
text /= np.linalg.norm(text, axis=1, keepdims=True)
cfg = Config(model=ModelConfig(compute_dtype="float32"),
             dota=DotaConfig(use_mode_dota=True, mode_M=2,
                             res_learning=True, residual_steps=2),
             cache=CacheConfig(cg_max_iter=5))
pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
rgbs = np.ones_like(pcs)
tgts = rng.integers(0, K, (T, 1)).astype(np.int32)

_, summary = pmesh.run_stream_psum(
    cfg, model, params, jnp.asarray(text), pcs, rgbs, tgts, mesh=mesh)
assert np.isfinite(summary["acc1"]), summary
print(f"OK rank={info['rank']} psum acc1={summary['acc1']:.6f}", flush=True)
"""


_EP_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from uni_adapter_tpu.parallel.bootstrap import init_distributed_device

info = init_distributed_device()

import jax.numpy as jnp
import numpy as np

from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu import engine
from uni_adapter_tpu.parallel import ep

assert jax.device_count() == 4, jax.devices()   # 2 local x 2 processes
K, N, T = 10, 64, 6   # K=10 pads to 12 over the 4-way class mesh
model = Uni3D(trans_dim=48, embed_dim=32, num_group=8, group_size=8,
              encoder_dim=16, depth=2, num_heads=4, dtype=jnp.float32)
rng = np.random.default_rng(0)
pc0 = jnp.zeros((1, N, 6), jnp.float32)
params = model.init(jax.random.PRNGKey(0), pc0)
text = rng.standard_normal((K, 32)).astype(np.float32)
text /= np.linalg.norm(text, axis=1, keepdims=True)
pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
rgbs = np.ones_like(pcs)
tgts = rng.integers(0, K, (T, 1)).astype(np.int32)
mesh = ep.make_classes_mesh()   # all 4 global devices

def make_cfg(mode, res=False):
    if mode == "mode":
        dc = DotaConfig(use_mode_dota=True, mode_M=2, res_learning=res,
                        residual_steps=2)
    else:
        dc = DotaConfig(use_dota=False, use_mode_dota=False)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig(shot_capacity=3, threshold=0.3,
                                    cg_max_iter=10))

accs = {}
for name, c in [("mode", make_cfg("mode")), ("cache", make_cfg("cache")),
                ("res", make_cfg("mode", res=True))]:
    _, summary = ep.run_stream_ep(c, model, params, jnp.asarray(text),
                                  pcs, rgbs, tgts, mesh=mesh)
    accs[name] = summary["acc1"]
    assert np.isfinite(accs[name]), (name, summary)
    if name != "res":
        # single-device replicated oracle, computed locally on each rank
        # (no collectives; identical on both by deterministic init)
        _, outs = engine.run_stream_scan(
            c, model, params, jnp.asarray(text), jnp.asarray(pcs),
            jnp.asarray(rgbs), jnp.asarray(tgts))
        want = 100.0 * float(jnp.sum(outs.correct, axis=0)[0]) / T
        assert abs(accs[name] - want) < 1e-6, (name, accs[name], want)
print(f"OK rank={info['rank']} ep mode={accs['mode']:.6f} "
      f"cache={accs['cache']:.6f} res={accs['res']:.6f}", flush=True)
"""


_PRETRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

import pretrain

st = pretrain.main([
    "--device", "cpu", "--steps", "4", "--batch-size", "8", "--depth", "1",
    "--trans-dim", "16", "--embed-dim", "16", "--num-group", "4",
    "--group-size", "4", "--encoder-dim", "8", "--heads", "2",
    "--warmup-steps", "1", "--log-every", "2", "--prefetch", "0",
    "--ckpt-every", "100",
    "--pc-shards", os.environ["CORPUS"] + "/pc_*.npy",
    "--text-shards", os.environ["CORPUS"] + "/text_*.npy",
    "--image-shards", os.environ["CORPUS"] + "/image_*.npy",
    "--out", os.environ["PRETRAIN_OUT"]])
checksum = sum(float(np.asarray(l).sum())
               for l in jax.tree_util.tree_leaves(st.params))
print(f"OK rank={jax.process_index()} scale={float(st.logit_scale):.8f} "
      f"checksum={checksum:.6f}", flush=True)
"""


@pytest.mark.timeout(600)
def test_two_process_pretrain_dp(tmp_path):
    """The full pretraining CLI across two real processes: each rank
    streams only its rows, negatives all_gather across the boundary, and
    the final state equals the single-process run on the same corpus
    (the multi-host form of test_streaming's DP-equality proof).  Also
    covers the rank-0-only checkpoint write."""
    import pretrain

    corpus = str(tmp_path / "corpus")
    pretrain._synthetic_corpus(corpus, dim=16)

    single_out = str(tmp_path / "single")
    st = pretrain.main([
        "--device", "cpu", "--steps", "4", "--batch-size", "8",
        "--depth", "1", "--trans-dim", "16", "--embed-dim", "16",
        "--num-group", "4", "--group-size", "4", "--encoder-dim", "8",
        "--heads", "2", "--warmup-steps", "1", "--log-every", "2",
        "--prefetch", "0", "--ckpt-every", "100",
        "--pc-shards", corpus + "/pc_*.npy",
        "--text-shards", corpus + "/text_*.npy",
        "--image-shards", corpus + "/image_*.npy",
        "--out", single_out])
    import numpy as np

    want_scale = float(st.logit_scale)
    want_sum = sum(float(np.asarray(l).sum())
                   for l in __import__("jax").tree_util
                   .tree_leaves(st.params))

    out_dir = str(tmp_path / "mp")
    procs, outs = _spawn_pair(
        _PRETRAIN_WORKER, timeout=550,
        xla_flags="--xla_force_host_platform_device_count=1",
        extra_env={"CORPUS": corpus, "PRETRAIN_OUT": out_dir})
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"OK rank={rank} ")]
        assert line, out
        scale = float(line[0].split("scale=")[1].split()[0])
        checksum = float(line[0].split("checksum=")[1])
        assert abs(scale - want_scale) < 1e-6, (scale, want_scale)
        assert abs(checksum - want_sum) < 1e-3, (checksum, want_sum)
    # rank 0 wrote the checkpoint; rank 1 did not race it
    assert os.path.exists(os.path.join(out_dir, "ckpt.npz"))


_MAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

import main as main_mod

results = main_mod.main([
    "--device", "cpu", "--root", os.environ["CORR_DATA"],
    "--corruption", "uniform", "--npoints", "128", "--eva-depth", "2",
    "--pc-feat-dim", "64", "--num-group", "16", "--group-size", "8",
    "--pc-encoder-dim", "32", "--eva-heads", "4",
    "--compute-dtype", "float32", "--precomputed-text-features", "large",
    "--dist-mode", "psum", "--name", "mp",
    "--output-dir", os.environ["EVAL_OUT"]])
print(f"OK rank={jax.process_index()} acc1={results['uniform']:.6f}",
      flush=True)
"""


@pytest.mark.timeout(600)
def test_two_process_main_eval_psum(tmp_path):
    """The evaluation CLI across two real processes (--dist-mode psum, one
    device each): the streaming-EM sufficient statistics psum across the
    process boundary, both ranks report the acc1 a single-process 2-device
    psum run produces, and only rank 0 writes results.json."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    from uni_adapter_tpu.config import parse_args
    from uni_adapter_tpu.data.datasets import load_tta_dataset
    from uni_adapter_tpu.parallel import mesh as pmesh
    import main as main_mod

    data = tmp_path / "corr"
    data.mkdir()
    rng = np.random.default_rng(0)
    np.save(data / "data_uniform_5.npy",
            rng.standard_normal((8, 128, 3)).astype(np.float32))
    np.save(data / "label.npy", rng.integers(0, 40, (8,)).astype(np.int64))

    flags = ["--device", "cpu", "--root", str(data),
             "--corruption", "uniform", "--npoints", "128",
             "--eva-depth", "2", "--pc-feat-dim", "64", "--num-group", "16",
             "--group-size", "8", "--pc-encoder-dim", "32",
             "--eva-heads", "4", "--compute-dtype", "float32",
             "--precomputed-text-features", "large"]
    # single-process oracle on a 2-device mesh (same geometry as 2x1 procs)
    cfg = parse_args(flags)
    model, params = main_mod.build_model(cfg)
    text = main_mod.get_text_anchors_with_fallback(cfg)
    ds = load_tta_dataset(cfg)
    pcs, rgbs, tgts = ds.as_arrays(1, npoints=128, seed=cfg.run.seed)
    mesh2 = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    _, summary = pmesh.run_stream_psum(cfg, model, params, text, pcs, rgbs,
                                       tgts, mesh=mesh2, seed=cfg.run.seed)
    want = float(summary["acc1"])

    out_dir = str(tmp_path / "eval_out")
    procs, outs = _spawn_pair(
        _MAIN_WORKER, timeout=550,
        xla_flags="--xla_force_host_platform_device_count=1",
        extra_env={"CORR_DATA": str(data), "EVAL_OUT": out_dir})
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"OK rank={rank} ")]
        assert line, out
        acc1 = float(line[0].split("acc1=")[1])
        assert abs(acc1 - want) < 1e-6, (acc1, want)
    assert os.path.exists(os.path.join(out_dir, "mp", "results.json"))


@pytest.mark.timeout(600)
def test_two_process_tp_forward():
    """Megatron TP across a process boundary: the GSPMD per-block
    all-reduces ride the inter-process transport on a 4-way model mesh;
    output equals the plain forward on both ranks."""
    procs, outs = _spawn_pair(
        _TP_WORKER,
        xla_flags="--xla_force_host_platform_device_count=2",
        timeout=550)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank} tp-multiprocess" in out, out


@pytest.mark.timeout(600)
def test_two_process_psum_tta_stream():
    """The full MODE-DOTA psum TTA mode on a 4-device mesh spanning two
    processes: the fit sufficient statistics psum across ranks, both ranks
    converge to the identical summary (the multi-host form of
    tests/test_parallel.py's single-process exactness proof)."""
    procs, outs = _spawn_pair(
        _PSUM_WORKER,
        xla_flags="--xla_force_host_platform_device_count=2",
        timeout=550)
    accs = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"OK rank={rank} psum")]
        assert line, out
        accs.append(line[0].rsplit("=", 1)[1])
    assert accs[0] == accs[1], accs   # identical global summary on both ranks


@pytest.mark.timeout(600)
def test_two_process_ep_stream():
    """EP's collectives cross a PROCESS boundary (VERDICT r3 item 7): a
    4-way `classes` mesh spans 2 processes x 2 local devices; the
    class-block all_gathers (clip logits, residual likelihood columns),
    the residual gradient's reduce_scatter, and the cache path's
    owner-masked psums + gathered CG matvec all ride the inter-process
    transport.  MODE-DOTA and cache accuracies must equal the local
    replicated oracle exactly; both ranks must agree on all three runs."""
    procs, outs = _spawn_pair(
        _EP_WORKER,
        xla_flags="--xla_force_host_platform_device_count=2",
        timeout=550)
    lines = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"OK rank={rank} ep ")]
        assert line, out
        lines.append(line[0].split(" ep ", 1)[1])
    assert lines[0] == lines[1], lines


@pytest.mark.timeout(600)
def test_two_process_sp_forward():
    """The ring attention crosses a PROCESS boundary: 2 processes x 2 local
    CPU devices form a 4-way seq mesh; the K/V ppermute ring (validity mask
    included — 9 tokens pad to 12) rides the inter-process transport and
    the SP forward still equals the plain forward.  The multi-host story
    for parallel/sp.py (single-host SP is covered by tests/test_sp.py)."""
    procs, outs = _spawn_pair(
        _SP_WORKER,
        xla_flags="--xla_force_host_platform_device_count=2",
        timeout=550)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank} sp-multiprocess" in out, out


@pytest.mark.timeout(600)
def test_two_process_pipeline_forward():
    """The GPipe pipeline crosses a PROCESS boundary: 2 processes x 2 local
    CPU devices form a 4-stage global mesh; the ppermute ring rides the
    inter-process transport and the PP forward still equals the plain
    forward.  The multi-host story for parallel/pp.py (single-host PP is
    covered by tests/test_pp.py)."""
    procs, outs = _spawn_pair(
        _PP_WORKER,
        xla_flags="--xla_force_host_platform_device_count=2",
        timeout=550)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank} pp-multiprocess" in out, out
