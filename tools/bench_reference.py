"""Measure the torch reference's throughput on this host (CPU) and store it
in BASELINE_MEASURED.json for bench.py's vs_baseline ratio.

The reference publishes no numbers (BASELINE.md), and this image has no CUDA,
so the comparable baseline is the reference code on the host CPU — recorded
with its hardware label so the ratio is interpretable.

Runs the reference code read-only from /root/reference with torchvision
stubbed (not installed; unused by the measured paths).
"""

import json
import os
import sys
import time

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tools.make_goldens import stub_torchvision  # noqa: E402


def bench_reference_ddpm(batch=8, nsteps=100):
    """Reference DDIM.sample (ddpm) with the flagship CIFAR10 ResNet config,
    scaled down in steps/batch and extrapolated linearly (CPU is slow)."""
    sys.path.insert(0, "/root/reference")
    from src.models import DDIM, MinimalResNet

    torch.manual_seed(0)
    net = MinimalResNet(
        channels=3, emb_dim=256, num_layers=8, mode="zeros", conditional=True,
        num_classes=10, kernel_size=3, lastksize=3,
    ).eval()
    model = DDIM(pretrained_backbone=net, in_channels=3, default_imsize=32)
    x0 = torch.randn(batch, 3, 32, 32)
    label = torch.zeros(batch, dtype=torch.long)
    with torch.no_grad():
        model.sample(batch_size=batch, x=x0.clone(), nsteps=2, label=label,
                     ddpm=True, device=torch.device("cpu"))  # warm
        t0 = time.perf_counter()
        model.sample(batch_size=batch, x=x0.clone(), nsteps=nsteps, label=label,
                     ddpm=True, device=torch.device("cpu"))
        dt = time.perf_counter() - t0
    # linear in nsteps: extrapolate to 1000 steps
    per_1000 = dt * (1000.0 / nsteps)
    return batch / per_1000


def bench_reference_els(batch=1, n_train=512, nscales=5):
    """Reference bbELS ScheduledScoreMachine over a synthetic bank,
    extrapolated to the 20-step/2048-bank config bench.py measures."""
    sys.path.insert(0, "/root/reference")
    from torch.utils.data import TensorDataset

    from src.utils import idealscore

    rs = np.random.RandomState(0)
    imgs = torch.tensor(rs.uniform(-1, 1, size=(n_train, 3, 32, 32)).astype(np.float32))
    labs = torch.zeros(n_train, dtype=torch.long)
    ds = TensorDataset(imgs, labs)
    scales = [3, 3, 5, 7, 9][:nscales]
    mod = idealscore.LocalEquivBordersScoreModule(
        ds, kernel_size=3, batch_size=256, image_size=32,
        schedule=idealscore.cosine_noise_schedule,
    )
    machine = idealscore.ScheduledScoreMachine(
        mod, in_channels=3, imsize=32, scales=scales, score_backbone=True
    )
    x = torch.randn(batch, 3, 32, 32)
    with torch.no_grad():
        t0 = time.perf_counter()
        machine(x.clone(), device=torch.device("cpu"))
        dt = time.perf_counter() - t0
    # scale: bench.py runs 19 updates over a 2048-image bank
    scale = (19.0 / (nscales - 1)) * (2048.0 / n_train)
    return batch / (dt * scale)


def main():
    stub_torchvision()
    out = {"source": "torch reference on host CPU (no CUDA available)",
           "torch_version": torch.__version__}
    print("measuring reference DDPM sampling (CPU)...")
    out["ddpm_1000step_images_per_sec"] = round(bench_reference_ddpm(), 4)
    print("  ->", out["ddpm_1000step_images_per_sec"], "img/s")
    print("measuring reference bbELS machine (CPU)...")
    try:
        out["els_20step_2048bank_images_per_sec"] = round(bench_reference_els(), 5)
        print("  ->", out["els_20step_2048bank_images_per_sec"], "img/s")
    except Exception as e:
        out["els_error"] = repr(e)
        print("  ELS failed:", e)
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
