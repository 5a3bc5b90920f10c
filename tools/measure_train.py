#!/usr/bin/env python
"""Training-step capacity sweep on the real TPU.

The round-2/3 benches report the README-recipe training throughput at its
prescribed batch 128 (reference scripts/training_script.py:69). That is a
*recipe latency* figure; per-chip training CAPACITY is the throughput at
the batch that saturates the chip. This sweeps the flagship train step
(fwd+bwd+AdamW, bf16 MXU) over batch sizes and reports img/s plus the
implied MFU under the standard fwd+bwd = 3x fwd FLOP convention.

Results append to tools/measure_train_out.json.

Usage: python tools/measure_train.py [batch ...]   (default: 128 256 512 1024)
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
# one flagship forward, per image per step (bench.py FLAGSHIP_FLOPS_PER_IMG_STEP)
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


def bench_train_batch(batch, iters=20):
    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
    from convolutional_diffusion_tpu.training import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )
    from convolutional_diffusion_tpu.data import synthetic_dataset

    net = MinimalResNet(
        channels=3, emb_dim=256, num_layers=8, mode="zeros", conditional=True,
        num_classes=10, kernel_size=3, lastksize=3, precision=None,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=32)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)
    config = TrainConfig(batch_size=batch)
    optimizer = make_optimizer(config)
    step = make_train_step(model, optimizer, conditional=True)
    ds = synthetic_dataset(num_samples=batch, image_size=32, num_channels=3)
    imgs, labs = jnp.asarray(ds.images), jnp.asarray(ds.labels)

    def run(params, opt_state):
        key = jax.random.PRNGKey(7)
        for _ in range(iters):  # chained: each step consumes the previous
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, imgs, labs, sub)
        return loss

    import numpy as np

    p1 = jax.tree_util.tree_map(jnp.array, params)
    o1 = optimizer.init(p1)
    np.asarray(jax.device_get(run(p1, o1)))  # warmup / compile
    p2 = jax.tree_util.tree_map(jnp.array, params)
    o2 = optimizer.init(p2)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(run(p2, o2)))
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    tflops = 3 * FWD_FLOPS_PER_IMG * ips / 1e12
    return {
        "images_per_sec": round(ips, 1),
        "ms_per_step": round(dt * 1e3, 2),
        "tflops_3x_fwd": round(tflops, 1),
        "mfu_vs_197": round(tflops / V5E_PEAK_TFLOPS, 3),
    }


def main():
    batches = [int(b) for b in sys.argv[1:]] or [128, 256, 512, 1024]
    sweep = OUT.setdefault("train_batch_sweep", {})
    for b in batches:
        try:
            sweep[str(b)] = bench_train_batch(b)
        except Exception as e:  # RESOURCE_EXHAUSTED at large batch, etc.
            sweep[str(b)] = {"error": repr(e)[:300]}
        flush()


if __name__ == "__main__":
    main()
