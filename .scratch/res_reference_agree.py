"""Does the reference's OWN loop agree that res-learning hurts at
realistic dims (K=40, D=512) on the sphere-drift stream?"""
import importlib
import sys
import time
import types
from types import SimpleNamespace

import numpy as np
import torch

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/.scratch")

from res_realistic_sweep import (make_problem_scaled, zero_shot_acc,
                                 mode_config, run)

tq = types.ModuleType("tqdm")
tq.tqdm = lambda it, *a, **k: it
sys.modules.setdefault("tqdm", tq)
sys.modules.setdefault("clip", types.ModuleType("clip"))
oc = types.ModuleType("open_clip")
oc.tokenizer = SimpleNamespace(tokenize=None)
sys.modules.setdefault("open_clip", oc)
pl = types.ModuleType("plotly")
go = types.ModuleType("plotly.graph_objects")
pl.graph_objects = go
sys.modules.setdefault("plotly", pl)
sys.modules.setdefault("plotly.graph_objects", go)
sys.path.insert(0, "/root/reference")
ref = importlib.import_module("Uni_Adapter")


class _E:
    def __init__(self, enable_timing=False):
        pass

    def record(self):
        pass

    def elapsed_time(self, o):
        return 0.0


torch.cuda.Event = _E
torch.cuda.synchronize = lambda *a, **k: None


class _TorchToyEncoder(torch.nn.Module):
    def __init__(self, W):
        super().__init__()
        self.W = torch.tensor(W)

    def encode_pc(self, feature):
        return torch.sin(feature[:, :, :3]).mean(1) @ self.W


def run_reference(tmp, res_learning, text, pcs, targets, W):
    import pathlib
    feat_path = str(pathlib.Path(tmp) / "text.pt")
    torch.save(torch.tensor(text), feat_path)
    args = SimpleNamespace(
        vlm3d="uni3d", device="cpu", use_gmm_dota=False, use_dota=False,
        use_mode_dota=True, res_learning=res_learning, mode_M=4,
        dota_epsilon=1e-4, dota_sigma=1e-4, dota_eta=0.1, dota_rho=0.02,
        precomputed_text_features=feat_path, templates_path="",
        labels_path="", template_key="", output_dir=None, print_freq=100000,
        use_new_approximation=True,
    )
    hp = {"shot_capacity": 30, "beta": 150, "threshold": 0.5,
          "lambda_reg": 0.11}
    loader = [
        (torch.tensor(pcs[i]), torch.tensor(targets[i]),
         [f"c_{int(targets[i, 0])}"],
         torch.ones_like(torch.tensor(pcs[i])))
        for i in range(pcs.shape[0])
    ]
    model = _TorchToyEncoder(W)
    orig = torch.randn_like
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    try:
        result = ref.test_zeroshot_3d_core(loader, "toy", model, None, None,
                                           args, hp)
    finally:
        torch.randn_like = orig
    return result


def main():
    import tempfile
    tmp = tempfile.mkdtemp()
    seed = 17
    pcs, targets, text, W = make_problem_scaled(
        seed, K=40, D=512, THETA_FRAC=0.55, JITTER=0.12)
    zs = zero_shot_acc(pcs, targets, text, W)
    print(f"zs={zs:.1f}", flush=True)
    t0 = time.time()
    off_ref = run_reference(tmp, False, text, pcs, targets, W)
    print(f"ref off: {off_ref['acc1']:.1f}  ({time.time()-t0:.0f}s)",
          flush=True)
    t0 = time.time()
    on_ref = run_reference(tmp, True, text, pcs, targets, W)
    print(f"ref on@1e-3: {on_ref['acc1']:.1f}  ({time.time()-t0:.0f}s)",
          flush=True)
    ours_on = run(mode_config(True, 1e-3), text, pcs, targets, W)
    ours_off = run(mode_config(False), text, pcs, targets, W)
    print(f"ours off={ours_off:.1f} on={ours_on:.1f}", flush=True)


if __name__ == "__main__":
    main()


def probe_T(T):
    import tempfile
    tmp = tempfile.mkdtemp()
    pcs, targets, text, W = make_problem_scaled(
        17, K=40, D=512, T=T, THETA_FRAC=0.55, JITTER=0.12)
    zs = zero_shot_acc(pcs, targets, text, W)
    import time as _t
    t0 = _t.time()
    off_ref = run_reference(tmp, False, text, pcs, targets, W)
    on_ref = run_reference(tmp, True, text, pcs, targets, W)
    t_ref = _t.time() - t0
    ours_off = run(mode_config(False), text, pcs, targets, W)
    ours_on = run(mode_config(True, 1e-3), text, pcs, targets, W)
    print(f"T={T}: zs={zs:.1f} ref_off={off_ref['acc1']:.1f} "
          f"ref_on={on_ref['acc1']:.1f} ours_off={ours_off:.1f} "
          f"ours_on={ours_on:.1f}  (ref wall {t_ref:.0f}s)", flush=True)
