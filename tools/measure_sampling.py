#!/usr/bin/env python
"""DDPM sampling capacity sweep on the real TPU.

bench.py reports the flagship 1000-step DDPM throughput at the
reference-like batch 64 (17.5 img/s, 86% MFU round 3). This sweeps the
seed batch to find the per-chip capacity point, mirroring the ELS capacity
sweep (PERFORMANCE.md round-3 section).

Results append to tools/measure_train_out.json (same file as the train
sweep — one round-3 "capacity" artifact).

Usage: python tools/measure_sampling.py [batch ...]   (default: 64 128 256)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

OUT_PATH = os.path.join(REPO, "tools", "measure_train_out.json")
OUT = {}
if os.path.exists(OUT_PATH):
    with open(OUT_PATH) as f:
        OUT = json.load(f)

V5E_PEAK_TFLOPS = 197.0
FWD_FLOPS_PER_IMG = (
    8 * 2 * 256 * 256 * 9 * 32 * 32
    + 2 * 3 * 256 * 9 * 32 * 32
    + 2 * 256 * 3 * 9 * 32 * 32
    + 9 * 2 * 256 * 256
)


def flush():
    with open(OUT_PATH, "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps(OUT), flush=True)


def bench_sampling_batch(batch, nsteps=1000, iters=3):
    import numpy as np

    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
    from convolutional_diffusion_tpu.sampling import make_sampler

    net = MinimalResNet(
        channels=3, emb_dim=256, num_layers=8, mode="zeros", conditional=True,
        num_classes=10, kernel_size=3, lastksize=3, precision=None,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=32)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)
    sampler = make_sampler(model, nsteps=nsteps, ddpm=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3))
    labels = jnp.zeros((batch,), jnp.int32)

    def run():
        return sampler(params, x0, labels, key=jax.random.PRNGKey(2)).sum()

    np.asarray(jax.device_get(run()))  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.device_get(run()))
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    tflops = FWD_FLOPS_PER_IMG * ips * nsteps / 1e12
    return {
        "images_per_sec": round(ips, 3),
        "tflops": round(tflops, 1),
        "mfu_vs_197": round(tflops / V5E_PEAK_TFLOPS, 3),
    }


def main():
    batches = [int(b) for b in sys.argv[1:]] or [64, 128, 256]
    sweep = OUT.setdefault("sampling_batch_sweep", {})
    for b in batches:
        try:
            sweep[str(b)] = bench_sampling_batch(b)
        except Exception as e:
            sweep[str(b)] = {"error": repr(e)[:300]}
        flush()


if __name__ == "__main__":
    main()
